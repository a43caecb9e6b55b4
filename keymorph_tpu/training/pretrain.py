"""Self-supervised pretraining: regress predicted keypoints to affinely
augmented reference keypoints (reference scripts/pretrain.py:18-97,
run.py:510-602 — with the broken brainmorph import fixed, SURVEY defects).

Real-world-coords mode (``config.align_keypoints_in_real_world_coords``):
reference keypoints are sampled in VOXEL space and converted to scanner
coordinates through the subject's NIfTI affine (reference run.py:527-540);
each step augments the image and the real-coordinate points with the same
matrix and converts the model's normalized predictions to real coordinates
through the ORIGINAL affine before the MSE (reference pretrain.py:54-72).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from keymorph_tpu import augment
from keymorph_tpu.losses import mse_loss
from keymorph_tpu.models.keymorph import KeyMorphNet, train_extract_net
from keymorph_tpu.ops import coords as Coords
from keymorph_tpu.training.config import Config
from keymorph_tpu.training.train import TrainState, aggregate_dicts, make_optimizer


def make_pretrain_step(net: KeyMorphNet, config: Config, tx=None):
    """Jitted pretrain step.

    Augments the reference image AND its reference keypoints with the same
    random affine, then MSE(predicted keypoints of augmented image,
    augmented keypoints) — pretrain.py:47-86. Trains backbone+CoM only.

    Signature: ``step(state, key, img, ref_points, aug_scale, aff=None)``.
    In rw mode ``ref_points`` are real-world coordinates and ``aff`` is the
    subject's (d+1, d+1) voxel->world affine (batched (B, d+1, d+1)).
    """
    net = train_extract_net(net)  # fused-kernel extraction unless KM_TRAIN_FAST_EXTRACT=0
    tx = tx or make_optimizer(config)
    max_params = (0.2, 0.2, 3.1416, 0.1)  # pretrain.py:52 defaults
    rw = bool(getattr(config, "align_keypoints_in_real_world_coords", False))

    def loss_fn(params, key, img, ref_points, aug_scale, aff):
        img_a, tgt_points = augment.random_affine_augment(
            key, img, points=ref_points,
            max_random_params=max_params, scale_params=aug_scale,
        )
        pred_points = net.apply(params, img_a, method=KeyMorphNet.get_keypoints)
        if rw:
            assert aff is not None, "rw pretraining requires the subject affine"
            # reference pretrain.py:70-71: predictions convert through the
            # ORIGINAL affine (not the augmented tgt_affine)
            pred_points = Coords.convert_points_norm2real(
                pred_points, aff, img.shape[2:]
            )
        loss = mse_loss(tgt_points, pred_points)
        return loss, {"mse": loss, "loss": loss}

    @jax.jit
    def step(state: TrainState, key, img, ref_points, aug_scale, aff=None):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, key, img, ref_points, aug_scale, aff
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


def pick_reference_subject(loader, config: Config, seed: int = 0):
    """Choose the pretraining reference subject + sample its keypoints once
    (reference run.py:522-550). Returns (img (1,1,*S), points (1,K,dim),
    affine (1,d+1,d+1) or None).

    Normalized mode: points are sampled in [0,1] and mapped to [-1,1]
    (run.py:541-550). Real-world mode: points are sampled as voxel indices
    and converted through the subject's NIfTI affine (run.py:527-540).
    """
    from keymorph_tpu.utils import sample_valid_coordinates

    batch = next(iter(loader))
    img = np.asarray(batch["img"], np.float32)[:1]
    rw = bool(getattr(config, "align_keypoints_in_real_world_coords", False))
    if rw:
        aff = batch.get("affine")
        if aff is None:
            aff = np.eye(config.dim + 1, dtype=np.float32)
        aff = np.asarray(aff, np.float32)
        if aff.ndim == 2:
            aff = aff[None]
        aff = jnp.asarray(aff[:1])
        pts = sample_valid_coordinates(
            img, config.num_keypoints, config.dim,
            point_space="voxel", indexing="ij", seed=seed,
        )
        pts = Coords.convert_points_voxel2real(pts, aff)
        return jnp.asarray(img), pts, aff
    pts = sample_valid_coordinates(
        img, config.num_keypoints, config.dim, seed=seed
    )  # in [0, 1], xy order
    pts = pts * 2.0 - 1.0  # match CoM's normalized range
    pts = jnp.flip(pts, axis=-1)  # xy -> ij, the pipeline convention
    return jnp.asarray(img), pts, None


def run_pretrain(img, ref_points, state, step_fn, config: Config, epoch: int,
                 rng_key, aff=None):
    """One pretraining epoch (reference pretrain.py:18-97)."""
    if config.affine_slope >= 1:
        aug_scale = min(epoch / config.affine_slope, 1.0)
    else:
        aug_scale = 1.0
    steps = config.steps_per_epoch if not config.debug_mode else 3
    metrics_list = []
    start = time.time()
    for _ in range(steps):
        rng_key, sub = jax.random.split(rng_key)
        state, metrics = step_fn(
            state, sub, img, ref_points, jnp.float32(aug_scale), aff
        )
        metrics_list.append(metrics)
    jax.block_until_ready(state.params)
    stats = aggregate_dicts(metrics_list)
    stats["epoch_time"] = time.time() - start
    return state, stats, rng_key
