"""Training: one fully-jitted step (augment -> extract -> fit -> warp -> loss
-> grad -> update) and the epoch loop.

The reference's per-step host work (train.py:16-220 — TorchIO loading aside)
all happens on-device here: augmentation matrices, flow fields, warping, and
the closed-form solve are part of one XLA program, so a step is a single
device dispatch. Parity anchors: scripts/train.py (loss selection, affine
ramp, TPS subsampling, aug-matrix composition into the moving affine).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from keymorph_tpu import augment
from keymorph_tpu.losses import mse_loss, soft_dice_loss
from keymorph_tpu.models.keymorph import (
    train_extract_net,
    KeyMorphNet,
    align_pair,
    parse_transform_type,
    sample_tps_lmbda,
    subsample_keypoints,
)
from keymorph_tpu.ops.resample import align_img, align_planes
from keymorph_tpu.training.config import Config


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_optimizer(config: Config):
    """Adam(lr=3e-6) (reference run.py:439)."""
    return optax.adam(config.lr)


def make_train_step(net: KeyMorphNet, config: Config, tx=None):
    """Build the jitted training step for `config.transform_type`.

    Returned signature:
        step(state, key, img_f, img_m, seg_f, seg_m, aug_scale,
             aff_f=None, aff_m=None) -> (state, metrics_dict)
    seg_f/seg_m may be None (MSE mode) — bind with functools.partial or pass
    explicitly; aug_scale implements the affine_slope ramp
    (reference train.py:80-98).

    When ``config.align_keypoints_in_real_world_coords`` is set, the step
    REQUIRES the (B, dim+1, dim+1) NIfTI affines ``aff_f``/``aff_m``; the
    augmentation matrix is composed into the moving affine (reference
    train.py:99-100 ``aff_m = aff_m @ aug_affine``) and the solver fits in
    scanner space (train.py:129-137 passing aff_f/aff_m into the model).
    """
    net = train_extract_net(net)  # fused-kernel extraction unless KM_TRAIN_FAST_EXTRACT=0
    tx = tx or make_optimizer(config)
    align_type, lmbda_spec = parse_transform_type(config.transform_type)
    use_dice = config.loss_fn == "dice"
    max_params = tuple(config.max_random_affine_augment_params)
    rw = bool(getattr(config, "align_keypoints_in_real_world_coords", False))

    def loss_fn(params, key, img_f, img_m, seg_f, seg_m, aug_scale, aff_f, aff_m):
        k_aug, k_lmbda, k_sub = jax.random.split(key, 3)
        if rw:
            assert aff_f is not None and aff_m is not None, (
                "real-world-coords training requires aff_f/aff_m (the NIfTI "
                "voxel->world affines) in the step call"
            )

        # on-device affine augmentation of the moving image (+seg); in rw
        # mode the aug matrix composes into the moving affine
        if any(p > 0 for p in max_params):
            if use_dice:
                img_m, seg_m, aug_M = augment.random_affine_augment(
                    k_aug, img_m, seg=seg_m,
                    max_random_params=max_params, scale_params=aug_scale,
                    return_affine_matrix=True,
                )
            else:
                img_m, aug_M = augment.random_affine_augment(
                    k_aug, img_m,
                    max_random_params=max_params, scale_params=aug_scale,
                    return_affine_matrix=True,
                )
            if rw:
                aff_m = jnp.einsum(
                    "bij,bjk->bik", aff_m, aug_M,
                    precision=jax.lax.Precision.HIGHEST,
                )

        points_f, points_m, weights = net.apply(params, img_f, img_m)

        lmbda = None
        if align_type == "tps":
            lmbda = sample_tps_lmbda(
                k_lmbda, img_f.shape[0], lmbda_spec, config.max_train_tps_lmbda
            )
            if (
                config.max_train_keypoints
                and config.num_keypoints > config.max_train_keypoints
            ):
                points_f, points_m, weights = subsample_keypoints(
                    k_sub, points_f, points_m, weights, config.max_train_keypoints
                )

        # TPS (non-rw) trains on the PLANES-NATIVE path: the fused flow
        # kernel now has a Pallas backward (tpsflow._tps_planes_bwd_pallas)
        # that recomputes the RBF block in VMEM — the XLA VJP re-materializes
        # the (T, N) matrix, a 4.3 GB round-trip at 256^3/T=64, which is what
        # blocked 256^3 training (VERDICT r4 #3). The warp's planes gradient
        # already rides the gather-free Pallas grad kernel. Ineligible
        # shapes / non-TPU backends degrade inside both ops to XLA, same
        # math either way.
        use_planes = align_type == "tps" and not rw
        aligned = align_pair(
            points_f,
            points_m,
            align_type,
            img_f.shape[2:],
            lmbda=lmbda,
            weights=weights,
            num_chunks=1,  # no subgrid chunking during training (model.py:265-268)
            compute_grid="planes" if use_planes else True,
            aff_f=aff_f if rw else None,
            aff_m=aff_m if rw else None,
            moving_shape=img_m.shape[2:],
        )
        if use_planes:
            flow_out = aligned["planes"]
            warp = align_planes
        else:
            flow_out = aligned["grid"]
            warp = align_img

        if use_dice:
            seg_a = warp(flow_out, seg_m)
            loss = soft_dice_loss(seg_a, seg_f)
            metrics = {"softdiceloss": loss, "softdice": 1.0 - loss}
        else:
            img_a = warp(flow_out, img_m)
            loss = mse_loss(img_f, img_a)
            metrics = {"mse": loss}
        metrics["loss"] = loss
        return loss, metrics

    @jax.jit
    def step(state: TrainState, key, img_f, img_m, seg_f, seg_m, aug_scale,
             aff_f=None, aff_m=None):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, key, img_f, img_m, seg_f, seg_m, aug_scale, aff_f, aff_m
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def make_kpconsistency_step(net: KeyMorphNet, config: Config, tx=None):
    """Keypoint-consistency step: two modalities of the SAME subject get the
    SAME random affine; their keypoints should coincide.

    The reference stubs this out (train.py:179-198 commented; flag
    kpconsistency_coeff at run.py:96-101); here it's a working jitted step:
        loss = coeff * MSE(points(sub1_aug), points(sub2_aug)).
    """
    net = train_extract_net(net)  # fused-kernel extraction unless KM_TRAIN_FAST_EXTRACT=0
    tx = tx or make_optimizer(config)
    coeff = config.kpconsistency_coeff

    def loss_fn(params, key, sub1, sub2, aug_scale):
        m1, m2 = augment.random_affine_augment_pair(
            key, sub1, sub2, scale_params=aug_scale
        )
        p1 = net.apply(params, m1, method=KeyMorphNet.get_keypoints)
        p2 = net.apply(params, m2, method=KeyMorphNet.get_keypoints)
        loss = coeff * mse_loss(p1, p2)
        return loss, {"kploss": loss}

    @jax.jit
    def step(state: TrainState, key, sub1, sub2, aug_scale):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, key, sub1, sub2, aug_scale
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def make_train_step_sameres(net: KeyMorphNet, config: Config, tx=None):
    """Same-resolution training variant (reference run_train_sameres,
    train.py:316-614): both images are resized to ``config.img_size`` for
    keypoint extraction, but the flow grid is evaluated at — and the loss
    computed at — the ORIGINAL fixed resolution.

    The step signature matches make_train_step; img/seg arrive at their
    original (static per-dataset) resolution.
    """
    net = train_extract_net(net)  # fused-kernel extraction unless KM_TRAIN_FAST_EXTRACT=0
    tx = tx or make_optimizer(config)
    align_type, lmbda_spec = parse_transform_type(config.transform_type)
    use_dice = config.loss_fn == "dice"
    max_params = tuple(config.max_random_affine_augment_params)
    model_size = tuple(config.img_size)
    rw = bool(getattr(config, "align_keypoints_in_real_world_coords", False))

    def _resize(img, size):
        B, C = img.shape[:2]
        return jax.image.resize(img, (B, C, *size), method="trilinear")

    def loss_fn(params, key, img_f, img_m, seg_f, seg_m, aug_scale, aff_f, aff_m):
        k_aug, k_lmbda, k_sub = jax.random.split(key, 3)
        orig_shape = img_f.shape[2:]

        if any(p > 0 for p in max_params):
            if use_dice:
                img_m, seg_m, aug_M = augment.random_affine_augment(
                    k_aug, img_m, seg=seg_m,
                    max_random_params=max_params, scale_params=aug_scale,
                    return_affine_matrix=True,
                )
            else:
                img_m, aug_M = augment.random_affine_augment(
                    k_aug, img_m, max_random_params=max_params,
                    scale_params=aug_scale, return_affine_matrix=True,
                )
            if rw:
                # reference train.py:415: aff_m = aff_m @ aug_affine
                aff_m = jnp.einsum(
                    "bij,bjk->bik", aff_m, aug_M,
                    precision=jax.lax.Precision.HIGHEST,
                )

        # keypoints from the common model resolution (CoM is resolution-
        # agnostic, so points live in the same [-1,1] frame either way)
        small_f = _resize(img_f, model_size)
        small_m = _resize(img_m, model_size)
        points_f, points_m, weights = net.apply(params, small_f, small_m)

        lmbda = None
        if align_type == "tps":
            lmbda = sample_tps_lmbda(
                k_lmbda, img_f.shape[0], lmbda_spec, config.max_train_tps_lmbda
            )
            if (
                config.max_train_keypoints
                and config.num_keypoints > config.max_train_keypoints
            ):
                points_f, points_m, weights = subsample_keypoints(
                    k_sub, points_f, points_m, weights, config.max_train_keypoints
                )

        grid = align_pair(
            points_f, points_m, align_type, orig_shape,
            lmbda=lmbda, weights=weights, compute_grid=True,
            aff_f=aff_f if rw else None,
            aff_m=aff_m if rw else None,
            moving_shape=img_m.shape[2:],
        )["grid"]

        if use_dice:
            seg_a = align_img(grid, seg_m)
            loss = soft_dice_loss(seg_a, seg_f)
            metrics = {"softdiceloss": loss, "softdice": 1.0 - loss}
        else:
            img_a = align_img(grid, img_m)
            loss = mse_loss(img_f, img_a)
            metrics = {"mse": loss}
        metrics["loss"] = loss
        return loss, metrics

    @jax.jit
    def step(state: TrainState, key, img_f, img_m, seg_f, seg_m, aug_scale,
             aff_f=None, aff_m=None):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, key, img_f, img_m, seg_f, seg_m, aug_scale, aff_f, aff_m
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


# canonical helper lives in keymorph_tpu.utils (shared with the CLI layer)
from keymorph_tpu.utils import aggregate_dicts  # noqa: E402


def run_train(loader, state, step_fn, config: Config, epoch: int, rng_key,
              kp_step_fn=None, modality_datasets=None):
    """One training epoch (reference train.py:16-220 / run.py:615-631).

    Walks `steps_per_epoch` batches from the (re-cycling) loader; applies the
    affine-slope ramp; returns (state, epoch_stats). When `kp_step_fn` and
    `modality_datasets` (dict modality -> indexable dataset of same-ordered
    subjects) are given and kpconsistency_coeff > 0, each step also runs a
    keypoint-consistency update on a random same-subject cross-modality pair
    (the reference's stubbed train.py:179-198 path, made real).
    """
    if config.affine_slope >= 1:
        aug_scale = min(epoch / config.affine_slope, 1.0)
    else:
        aug_scale = 1.0

    metrics_list = []
    steps = config.steps_per_epoch if not config.debug_mode else 3
    it = iter(loader)
    start = time.time()

    # device-level tracing (the reference's torch.profiler flag,
    # train.py:104-127): one epoch of jax.profiler trace on epoch 1
    profiler_ctx = None
    if config.use_profiler and epoch == 1:
        import os as _os

        trace_dir = _os.path.join(config.model_dir, "profile")
        _os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        profiler_ctx = trace_dir

    for _ in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        b_f, b_m = batch
        # large-volume skip guard (reference train.py:46-51) — only relevant
        # for variable-resolution (sameres) data; fixed-size pipelines never
        # trip it
        if (
            np.prod(b_f["img"].shape) >= 77_594_624
            or np.prod(b_m["img"].shape) >= 77_594_624
        ):
            print("Skipping large image")
            continue
        img_f = jnp.asarray(b_f["img"], jnp.float32)
        img_m = jnp.asarray(b_m["img"], jnp.float32)
        if getattr(config, "align_keypoints_in_real_world_coords", False):
            # (B, d+1, d+1) voxel->world affines from the NIfTI headers
            # (reference train.py:45,74); synthetic sources without headers
            # fall back to identity (== voxel space)
            d1 = img_f.ndim - 1  # dim + 1
            eye = np.eye(d1, dtype=np.float32)[None].repeat(img_f.shape[0], 0)

            def _aff(b):
                a = b.get("affine")
                if a is None:
                    return jnp.asarray(eye)
                a = np.asarray(a, np.float32)
                if a.ndim == 2:
                    a = a[None].repeat(img_f.shape[0], 0)
                return jnp.asarray(a)

            aff_f, aff_m = _aff(b_f), _aff(b_m)
        else:
            aff_f = aff_m = None
        if config.loss_fn == "dice":
            from keymorph_tpu.utils import one_hot_subsampled_pair, one_hot

            if config.max_train_seg_channels:
                seg_f, seg_m = one_hot_subsampled_pair(
                    b_f["seg"], b_m["seg"], config.max_train_seg_channels
                )
            else:
                # pin the one-hot channel count for the whole run: a per-batch
                # max would change the jitted step's signature every time a
                # new label ceiling appears (full XLA recompile per count)
                batch_max = int(max(b_f["seg"].max(), b_m["seg"].max())) + 1
                # the pin lives on the step fn itself (not a module-global
                # keyed by id(): id-reuse after GC could inherit a stale count)
                n_cls = getattr(step_fn, "_n_cls_pin", None)
                if n_cls is None:
                    n_cls = batch_max
                    step_fn._n_cls_pin = n_cls
                if batch_max > n_cls:
                    print(
                        f"WARNING: labels >= {n_cls} clipped (set "
                        "max_train_seg_channels for datasets with ragged label "
                        "sets)"
                    )
                seg_f = one_hot(
                    jnp.clip(jnp.asarray(b_f["seg"], jnp.int32), 0, n_cls - 1), n_cls
                )
                seg_m = one_hot(
                    jnp.clip(jnp.asarray(b_m["seg"], jnp.int32), 0, n_cls - 1), n_cls
                )
        else:
            # placeholder tensors keep the jitted signature stable
            seg_f = seg_m = jnp.zeros((1,), jnp.float32)

        rng_key, sub = jax.random.split(rng_key)
        if aff_f is not None:
            state, metrics = step_fn(
                state, sub, img_f, img_m, seg_f, seg_m, jnp.float32(aug_scale),
                aff_f, aff_m,
            )
        else:
            state, metrics = step_fn(
                state, sub, img_f, img_m, seg_f, seg_m, jnp.float32(aug_scale)
            )

        if (
            kp_step_fn is not None
            and modality_datasets
            and len(modality_datasets) >= 2
            and config.kpconsistency_coeff > 0
        ):
            mods = list(modality_datasets.keys())
            rng_key, k1, k2 = jax.random.split(rng_key, 3)
            # pair/subject selection from the threaded key: reproducible from
            # rng_key alone (global numpy state would break resume replay)
            sel = jax.random.permutation(k1, len(mods))
            m1, m2 = int(sel[0]), int(sel[1])
            ds1, ds2 = modality_datasets[mods[m1]], modality_datasets[mods[m2]]
            idx = int(
                jax.random.randint(
                    jax.random.fold_in(k1, 1), (), 0, min(len(ds1), len(ds2))
                )
            )
            sub1 = jnp.asarray(ds1[idx]["img"], jnp.float32)[None]
            sub2 = jnp.asarray(ds2[idx]["img"], jnp.float32)[None]
            state, kp_metrics = kp_step_fn(state, k2, sub1, sub2, jnp.float32(aug_scale))
            metrics = {**metrics, **kp_metrics}
        metrics_list.append(metrics)
    jax.block_until_ready(state.params)
    if profiler_ctx is not None:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {profiler_ctx}")
    stats = aggregate_dicts(metrics_list)
    stats["epoch_time"] = time.time() - start
    stats["steps_per_sec"] = steps / stats["epoch_time"]
    return state, stats, rng_key
