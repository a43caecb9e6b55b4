"""Pairwise registration evaluation harness.

Sweeps subjects x augmentations x transform types, one keypoint extraction
per pair (all aligns share it), computes the metric suite, and saves JSON
metrics + .npy artifacts with the reference's exact layout and key scheme
``metric:mod1:mod2:aug:align`` (reference scripts/pairwise_register_eval.py).

The reference's jdlessthan0 copy-paste bug (it computed jdstd;
pairwise_register_eval.py:345) is fixed here.

Multi-chip fan-out (SURVEY §2.5 "the highest-value DP axis"): pass ``mesh``
(and optionally ``batch_pairs``) to batch pairs along the leading axis and
shard them over the mesh's 'data' axis — one keypoint-extraction dispatch
and one warp dispatch per ``batch_pairs`` pairs instead of per pair. With
``batch_pairs=1`` (the default, no mesh) behavior and artifacts are
identical to the sequential harness.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from keymorph_tpu import metrics as M
from keymorph_tpu import utils as U
from keymorph_tpu.augment import affine_augment
from keymorph_tpu.cli.script_utils import (
    load_dict_from_json,
    parse_test_aug,
    save_dict_as_json,
)
from keymorph_tpu.ops.resample import align_img


def _build_metric_dict(list_of_eval_metrics, list_of_eval_augs, list_of_eval_aligns, names):
    keys = [
        f"{m}:{n1}:{n2}:{a}:{k}"
        for m in list_of_eval_metrics
        for a in list_of_eval_augs
        for k in list_of_eval_aligns
        for (n1, n2) in names
    ]
    return {k: [] for k in keys}


def _metrics_for_pair(
    list_of_eval_metrics, args, seg_available, img_f, img_a, seg_f, seg_a, grid
):
    """Metric suite for ONE pair (all arrays batch-1 slices).

    Parity: reference pairwise_register_eval.py:302-347.
    """
    if seg_available:
        dice_total = 1.0 - float(M.DiceLoss(hard=True)(seg_a, seg_f, ign_first_ch=True))
        dice_roi = (
            1.0
            - np.asarray(
                M.DiceLoss(hard=True, return_regions=True)(
                    seg_a, seg_f, ign_first_ch=True
                )
            )
        ).tolist()

    metrics = {}
    for m in list_of_eval_metrics:
        if m == "mse":
            metrics["mse"] = float(M.MSELoss()(img_f, img_a))
        elif m == "softdice":
            assert seg_available
            metrics["softdiceloss"] = float(M.DiceLoss()(seg_a, seg_f))
            metrics["softdice"] = 1 - metrics["softdiceloss"]
        elif m == "harddice":
            assert seg_available
            metrics["harddice"] = dice_total
        elif m == "harddiceroi":
            assert seg_available
            metrics["harddiceroi"] = dice_roi
        elif m == "hausd":
            assert seg_available and args.dim == 3
            metrics["hausd"] = float(M.hausdorff_distance(seg_a, seg_f))
        elif m == "jdstd":
            assert args.dim == 3
            grid_permute = jnp.moveaxis(grid, -1, 1)
            metrics["jdstd"] = M.jdstd(grid_permute)
        elif m == "jdlessthan0":
            assert args.dim == 3
            grid_permute = jnp.moveaxis(grid, -1, 1)
            metrics["jdlessthan0"] = M.jdlessthan0(grid_permute, as_percentage=True)
        else:
            raise ValueError(f'Invalid metric "{m}"')
    return metrics


def _per_pair_dice(pred, target, hard, ch_mask, ign_first_ch):
    """Per-pair (masked) Dice-loss reductions of losses._dice.

    ``ch_mask`` (B, C) is 1 where channel c < the pair's own class count:
    pairs in a batch may carry different label sets one-hotted to a common
    ceiling, and the padded channels must not enter the per-channel mean
    (they would each contribute a perfect eps/eps Dice). For channels under
    the mask this reproduces losses._dice (eps=1) exactly.

    Returns (per-pair mean (B,), per-pair-per-region (B, C'||C'-1)).
    """
    B, C = pred.shape[:2]
    p = pred.reshape(B, C, -1).astype(jnp.float32)
    t = target.reshape(B, C, -1).astype(jnp.float32)
    if hard:
        am = jnp.argmax(p, axis=1)
        p = jnp.moveaxis(jax.nn.one_hot(am, C, dtype=jnp.float32), -1, 1)
    num = 2.0 * jnp.sum(p * t, axis=2) + 1.0
    den = jnp.sum(p * p, axis=2) + jnp.sum(t * t, axis=2) + 1.0
    dl = 1.0 - num / den  # (B, C)
    m = ch_mask.astype(jnp.float32)
    if ign_first_ch:
        dl, m = dl[:, 1:], m[:, 1:]
    mean = jnp.sum(dl * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return mean, dl


def make_batch_score_fn(
    list_of_eval_aligns,
    list_of_eval_metrics,
    seg_available,
    dim,
    warp,
    return_volumes,
):
    """ONE jitted program warping + scoring a registered batch for EVERY align.

    The sequential loop (warp, then :func:`_metrics_for_pair` per align) is
    correct but dispatches each op eagerly; over a remote-device link each
    eager dispatch costs seconds, and a 7-align pair took >2 min of pure
    dispatch latency (measured: a single eager ``align_img`` at 128^3 was
    30-90 s on the axon tunnel while the same warp inside jit is ~2 ms).
    This builder fuses all warps and every on-device metric into one XLA
    program; only per-pair scalars (+ the uint8 channel-0 masks Hausdorff
    needs, + optionally the warped volumes for artifact saving) leave the
    device. Metric values are bitwise the suite _metrics_for_pair computes.

    ``warp`` is align_img, or its shard_map'd form on the mesh path (the
    composite jit then GSPMD-partitions the metric math over 'data' while
    the Pallas warp kernel stays per-device under shard_map).

    Returns fn(grids, img_f, img_m, seg_f, seg_m, ch_mask) ->
    (metrics_tree, ch0_f, volumes_tree) with per-pair leading axes; pass
    seg_f=seg_m=ch_mask=None when seg_available is False.
    """
    need = frozenset(list_of_eval_metrics)
    aligns = tuple(list_of_eval_aligns)

    def score(grids, img_f, img_m, seg_f, seg_m, ch_mask):
        out = {}
        vols = {}
        spatial_axes = tuple(range(1, dim + 1))
        ch0_f = (
            (seg_f[:, 0] > 0.5).astype(jnp.uint8)
            if seg_available and "hausd" in need
            else None
        )
        for align, g in zip(aligns, grids):
            img_a = warp(g, img_m)
            seg_a = warp(g, seg_m) if seg_available else None
            e = {}
            if "mse" in need:
                e["mse"] = jnp.mean(
                    (img_f.astype(jnp.float32) - img_a.astype(jnp.float32)) ** 2,
                    axis=tuple(range(1, img_f.ndim)),
                )
            if "softdice" in need:
                e["softdiceloss"], _ = _per_pair_dice(
                    seg_a, seg_f, False, ch_mask, ign_first_ch=False
                )
            if "harddice" in need or "harddiceroi" in need:
                hd_mean, hd_regions = _per_pair_dice(
                    seg_a, seg_f, True, ch_mask, ign_first_ch=True
                )
                if "harddice" in need:
                    e["harddice"] = 1.0 - hd_mean
                if "harddiceroi" in need:
                    e["harddiceroi"] = 1.0 - hd_regions
            if "hausd" in need:
                e["ch0_a"] = (seg_a[:, 0] > 0.5).astype(jnp.uint8)
            if "jdstd" in need or "jdlessthan0" in need:
                det = M.jacobian_determinant(jnp.moveaxis(g, -1, 1))
                if "jdstd" in need:
                    e["jdstd"] = jnp.std(det, axis=spatial_axes)
                if "jdlessthan0" in need:
                    e["jdlessthan0"] = jnp.mean(
                        (det <= 0).astype(jnp.float32), axis=spatial_axes
                    )
            out[align] = e
            if return_volumes:
                vols[align] = (img_a, seg_a)
        return out, ch0_f, vols

    return jax.jit(score)


def run_eval(
    loader,
    registration_model,
    list_of_eval_metrics,
    list_of_eval_names,
    list_of_eval_augs,
    list_of_eval_aligns,
    args,
    save_dir_prefix="eval",
    mesh=None,
    batch_pairs=None,
):
    """Returns the test_metrics dict keyed ``metric:mod1:mod2:aug:align``."""
    test_metrics = _build_metric_dict(
        list_of_eval_metrics, list_of_eval_augs, list_of_eval_aligns, list_of_eval_names
    )
    seg_available = getattr(args, "seg_available", False)

    if batch_pairs is None:
        batch_pairs = int(mesh.shape["data"]) if mesh is not None else 1
    if mesh is not None:
        assert batch_pairs % int(mesh.shape["data"]) == 0, (
            f"batch_pairs={batch_pairs} must be a multiple of the mesh 'data' "
            f"axis ({mesh.shape['data']})"
        )
    batch_sh = None
    warp = align_img
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        # model.forward runs GSPMD-partitioned over the 'data'-sharded
        # batch: its jitted programs (fused conv extraction, fused TPS
        # flow) must not contain Pallas custom calls — no partitioning
        # rule exists for tpu_custom_call. The warp below instead keeps
        # its kernel by running under shard_map.
        if hasattr(registration_model, "set_allow_pallas"):
            registration_model.set_allow_pallas(False)
        # per-device warp: each chip runs the (Pallas) resampler on its own
        # pair shard — GSPMD cannot partition the tpu_custom_call itself,
        # but under shard_map every device traces a local batch-slice call
        warp = shard_map(
            align_img,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,  # pallas_call emits un-annotated out avals
        )

    # cached jitted programs (one compile per aug / per shape signature):
    # everything between the host->device put and the metric scalars runs in
    # three dispatches — prep (one-hot + augment), forward, score — because
    # eager per-op dispatch costs seconds on a remote-device (axon) link
    _prep_cache = {}
    _score_cache = {}
    need_vols = getattr(args, "save_eval_artifacts", True) or getattr(
        args, "visualize", False
    )

    def _flush(pending):
        """Register + score a buffer of pending pairs for every aug."""
        for aug in list_of_eval_augs:
            param = parse_test_aug(aug)
            # split buffer into already-completed (load) vs to-compute
            work = []
            for entry in pending:
                if args.skip_if_completed and all(
                    p.exists() for p in entry["metrics_paths"][aug].values()
                ):
                    print("Found metrics for all alignments, skipping registration...")
                    all_metrics = {
                        k: load_dict_from_json(v)
                        for k, v in entry["metrics_paths"][aug].items()
                    }
                    _record(entry, aug, all_metrics)
                else:
                    work.append(entry)
            if not work:
                continue

            n_work = len(work)
            pad = [work[-1]] * (batch_pairs - n_work)
            batch = work + pad

            # entries stay host numpy until here so the sharded put goes
            # host -> each chip directly — staging on device 0 first would
            # double-transfer and spike its HBM (mirrors keymorph.py's
            # groupwise _flush)
            img_f = np.concatenate([e["img_f"] for e in batch], axis=0)
            img_m = np.concatenate([e["img_m"] for e in batch], axis=0)
            aff_f = jnp.asarray(
                np.concatenate([e["aff_f"] for e in batch], axis=0)
            )
            aff_m = jnp.asarray(
                np.concatenate([e["aff_m"] for e in batch], axis=0)
            )
            if batch_sh is not None:
                img_f = jax.device_put(img_f, batch_sh)
                img_m = jax.device_put(img_m, batch_sh)
            else:
                img_f = jnp.asarray(img_f)
                img_m = jnp.asarray(img_m)
            n_max = 0
            seg_f_i = seg_m_i = None
            if seg_available:
                # one-hot to the batch-wide ceiling; per-pair channel masks
                # in the scorer recover exactly the pair's own label set
                # (the extra channels are identically zero through the
                # linear warp). int labels ship to the chips first; the
                # one-hot expansion happens on-device, already sharded.
                n_cls_list = [e["n_cls"] for e in batch]
                n_max = max(n_cls_list)
                seg_f_i = np.concatenate(
                    [np.asarray(e["seg_f"], np.int32) for e in batch], axis=0
                )
                seg_m_i = np.concatenate(
                    [np.asarray(e["seg_m"], np.int32) for e in batch], axis=0
                )
                if batch_sh is not None:
                    seg_f_i = jax.device_put(seg_f_i, batch_sh)
                    seg_m_i = jax.device_put(seg_m_i, batch_sh)

            # prep program: on-device one-hot of both segs + eval-time
            # affine augmentation of the moving image (+seg). One jitted
            # dispatch; on the mesh path it runs under shard_map so each
            # chip augments its own pair shard (and the Pallas warp inside
            # stays eligible).
            pk = (aug, img_m.shape, n_max)
            if pk not in _prep_cache:
                if seg_available:

                    def _prep(im, sgf_i, sgm_i, _param=param, _n=n_max):
                        sgf = U.one_hot(jnp.asarray(sgf_i), _n)
                        sgm = U.one_hot(jnp.asarray(sgm_i), _n)
                        im2, sgm2 = affine_augment(im, _param, seg=sgm)
                        return im2, sgf, sgm2

                else:

                    def _prep(im, _param=param):
                        return affine_augment(im, _param)

                fn = _prep
                if mesh is not None:
                    from jax.sharding import PartitionSpec as P
                    from jax import shard_map as _shard_map

                    n_io = 3 if seg_available else 1
                    fn = _shard_map(
                        fn,
                        mesh=mesh,
                        in_specs=(P("data"),) * n_io,
                        out_specs=(P("data"),) * n_io if seg_available else P("data"),
                    )
                _prep_cache[pk] = jax.jit(fn)
            if seg_available:
                img_m, seg_f, seg_m = _prep_cache[pk](img_m, seg_f_i, seg_m_i)
            else:
                img_m = _prep_cache[pk](img_m)
                seg_f = seg_m = None

            t0 = time.time()
            results = registration_model(
                img_f,
                img_m,
                transform_type=list(list_of_eval_aligns),
                return_aligned_points=True,
                aff_f=aff_f,
                aff_m=aff_m,
            )

            # score program: ONE jitted dispatch warps every align and
            # computes the whole on-device metric suite per pair; only
            # per-pair scalars + the uint8 ch0 masks (for host Hausdorff)
            # + (if saving artifacts) the warped volumes leave the device
            sk = (img_f.shape, img_m.shape, n_max)
            if sk not in _score_cache:
                _score_cache[sk] = make_batch_score_fn(
                    list_of_eval_aligns,
                    list_of_eval_metrics,
                    seg_available,
                    args.dim,
                    warp,
                    need_vols,
                )
            grids = tuple(results[a]["grid"] for a in list_of_eval_aligns)
            ch_mask = None
            if seg_available:
                cm = np.zeros((len(batch), n_max), np.float32)
                for b, nc in enumerate(n_cls_list):
                    cm[b, :nc] = 1.0
                ch_mask = jnp.asarray(cm)
            scored, ch0_f, vols = _score_cache[sk](
                grids, img_f, img_m, seg_f, seg_m, ch_mask
            )
            scored = jax.device_get(scored)  # one transfer for the batch
            ch0_f = np.asarray(ch0_f) if ch0_f is not None else None
            batch_time = time.time() - t0

            for j, entry in enumerate(work):
                sl = slice(j, j + 1)
                n_cls_j = entry["n_cls"] if seg_available else 0
                if need_vols:
                    img_f_j, img_m_j = img_f[sl], img_m[sl]
                    seg_f_j = seg_f[sl, :n_cls_j] if seg_available else None
                    seg_m_j = seg_m[sl, :n_cls_j] if seg_available else None
                    _save_pair_common(
                        entry, aug, img_f_j, img_m_j, seg_f_j, seg_m_j
                    )

                all_metrics = {}
                for align, res in results.items():
                    e = scored[align]
                    metrics = {}
                    for m in list_of_eval_metrics:
                        if m == "mse":
                            metrics["mse"] = float(e["mse"][j])
                        elif m == "softdice":
                            sdl = float(e["softdiceloss"][j])
                            metrics["softdiceloss"] = sdl
                            metrics["softdice"] = 1 - sdl
                        elif m == "harddice":
                            metrics["harddice"] = float(e["harddice"][j])
                        elif m == "harddiceroi":
                            metrics["harddiceroi"] = np.asarray(
                                e["harddiceroi"][j][: n_cls_j - 1]
                            ).tolist()
                        elif m == "hausd":
                            metrics["hausd"] = float(
                                M.hausdorff_from_ch0_masks(
                                    e["ch0_a"][j : j + 1], ch0_f[j : j + 1]
                                )
                            )
                        elif m == "jdstd":
                            metrics["jdstd"] = float(e["jdstd"][j])
                        elif m == "jdlessthan0":
                            metrics["jdlessthan0"] = float(e["jdlessthan0"][j])
                        else:
                            raise ValueError(f'Invalid metric "{m}"')
                    all_metrics[align] = metrics
                    print(
                        f"-> {align}: align_time={res.get('time', float('nan')):.3f}s "
                        f"batch_time={batch_time:.3f}s/{n_work}pairs",
                        metrics,
                    )
                    save_dict_as_json(metrics, entry["metrics_paths"][aug][align])
                    if need_vols:
                        img_a_full, seg_a_full = vols[align]
                        grid_j = res["grid"][sl]
                        img_a_j = img_a_full[sl]
                        seg_a_j = (
                            seg_a_full[sl, :n_cls_j] if seg_available else None
                        )
                        _save_pair_align(
                            entry, aug, align, res, sl, grid_j, img_a_j, seg_a_j
                        )
                    if getattr(args, "visualize", False):
                        # moving/fixed/aligned panel per pair x aug x align
                        # (reference pairwise_register_eval.py --visualize)
                        from keymorph_tpu import viz

                        show = (
                            viz.imshow_registration_2d
                            if args.dim == 2
                            else viz.imshow_registration_3d
                        )
                        p_a = res.get("points_a")
                        show(
                            np.asarray(img_m[sl])[0, 0],
                            np.asarray(img_f[sl])[0, 0],
                            np.asarray(img_a_j)[0, 0],
                            np.asarray(res["points_m"][sl])[0],
                            np.asarray(res["points_f"][sl])[0],
                            np.asarray(p_a[sl])[0] if p_a is not None else None,
                            save_path=str(
                                entry["save_dir"] / f"panel-{aug}-{align}.png"
                            ),
                        )
                _record(entry, aug, all_metrics)

    def _record(entry, aug, all_metrics):
        mod1, mod2 = entry["mod1"], entry["mod2"]
        for m in list_of_eval_metrics:
            for align in list_of_eval_aligns:
                test_metrics[f"{m}:{mod1}:{mod2}:{aug}:{align}"].append(
                    all_metrics[align][m]
                )

    def _save_pair_common(entry, aug, img_f, img_m, seg_f, seg_m):
        if not getattr(args, "save_eval_artifacts", True):
            return  # metrics JSONs only (full-protocol sweeps: ~25 GB of npys)
        i, mod1_str, mod2_str = entry["i"], entry["mod1_str"], entry["mod2_str"]
        save_dir = entry["save_dir"]
        np.save(save_dir / f"img_f_{i}-{mod1_str}.npy", np.asarray(img_f[0]))
        np.save(save_dir / f"img_m_{i}-{mod2_str}-{aug}.npy", np.asarray(img_m[0]))
        if seg_f is not None:
            np.save(
                save_dir / f"seg_f_{i}-{mod1_str}.npy",
                np.argmax(np.asarray(seg_f), axis=1),
            )
            np.save(
                save_dir / f"seg_m_{i}-{mod2_str}-{aug}.npy",
                np.argmax(np.asarray(seg_m), axis=1),
            )

    def _save_pair_align(entry, aug, align, res, sl, grid_j, img_a_j, seg_a_j):
        if not getattr(args, "save_eval_artifacts", True):
            return
        i, mod1_str, mod2_str = entry["i"], entry["mod1_str"], entry["mod2_str"]
        save_dir = entry["save_dir"]
        np.save(
            save_dir / f"img_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
            np.asarray(img_a_j[0]),
        )
        np.save(
            save_dir / f"grid_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
            np.asarray(grid_j[0]),
        )
        if seg_a_j is not None:
            np.save(
                save_dir / f"seg_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                np.argmax(np.asarray(seg_a_j), axis=1),
            )
        if res.get("points_f") is not None:
            np.save(
                save_dir / f"points_f_{i}-{mod1_str}.npy",
                np.asarray(res["points_f"][sl][0]),
            )
            np.save(
                save_dir / f"points_m_{i}-{mod2_str}-{aug}.npy",
                np.asarray(res["points_m"][sl][0]),
            )
            np.save(
                save_dir / f"points_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                np.asarray(res["points_a"][sl][0]),
            )
            if res.get("points_weights") is not None:
                np.save(
                    save_dir
                    / f"points_weights_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                    np.asarray(res["points_weights"][sl][0]),
                )

    wanted_pairs = {(str(n1), str(n2)) for n1, n2 in list_of_eval_names}
    pending = []
    for i, (fixed, moving) in enumerate(loader):
        if args.early_stop_eval_subjects and i == args.early_stop_eval_subjects:
            break
        mod1 = fixed["modality"][0]
        mod2 = moving["modality"][0]
        if (str(mod1), str(mod2)) not in wanted_pairs:
            # loader may carry pairs for other suites (uni vs multimodal);
            # only score the ones this suite's metric dict was built for
            continue
        mod1_str = "-".join(str(mod1).split("/")[-2:])
        mod2_str = "-".join(str(mod2).split("/")[-2:])
        save_dir = (
            Path(args.model_eval_dir) / save_dir_prefix / f"{i}_{mod1_str}_{mod2_str}"
        )
        os.makedirs(save_dir, exist_ok=True)
        entry = {
            "i": i,
            "mod1": mod1,
            "mod2": mod2,
            "mod1_str": mod1_str,
            "mod2_str": mod2_str,
            "save_dir": save_dir,
            "img_f": np.asarray(fixed["img"], np.float32),
            "img_m": np.asarray(moving["img"], np.float32),
            "aff_f": np.asarray(fixed["affine"], np.float32),
            "aff_m": np.asarray(moving["affine"], np.float32),
            "metrics_paths": {
                aug: {
                    align: save_dir / f"metrics-{aug}-{align}.json"
                    for align in list_of_eval_aligns
                }
                for aug in list_of_eval_augs
            },
        }
        if seg_available:
            entry["seg_f"] = np.asarray(fixed["seg"])
            entry["seg_m"] = np.asarray(moving["seg"])
            entry["n_cls"] = (
                int(max(entry["seg_f"].max(), entry["seg_m"].max())) + 1
            )
        pending.append(entry)
        if len(pending) == batch_pairs:
            _flush(pending)
            pending = []
    if pending:
        _flush(pending)

    return test_metrics
