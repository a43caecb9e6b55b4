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
            if seg_available:
                # one-hot to the batch-wide ceiling; per-pair channel slices
                # below recover exactly the pair's own label set (the extra
                # channels are identically zero through the linear warp).
                # int labels ship to the chips first; the one-hot expansion
                # happens on-device, already sharded.
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
                seg_f = U.one_hot(jnp.asarray(seg_f_i), n_max)
                seg_m = U.one_hot(jnp.asarray(seg_m_i), n_max)

            # explicit eval-time augmentation of the moving image; on the
            # mesh path it runs under shard_map so each chip augments its
            # own pair shard (and the Pallas warp inside stays eligible)
            if mesh is not None:
                from jax.sharding import PartitionSpec as P
                from jax import shard_map as _shard_map

                n_out = 2 if seg_available else 1
                aug_fn = _shard_map(
                    (lambda im, sg: affine_augment(im, param, seg=sg))
                    if seg_available
                    else (lambda im: affine_augment(im, param)),
                    mesh=mesh,
                    in_specs=(P("data"),) * (2 if seg_available else 1),
                    out_specs=(P("data"),) * n_out if seg_available else P("data"),
                )
                if seg_available:
                    img_m, seg_m = aug_fn(img_m, seg_m)
                else:
                    img_m = aug_fn(img_m)
            elif seg_available:
                img_m, seg_m = affine_augment(img_m, param, seg=seg_m)
            else:
                img_m = affine_augment(img_m, param)

            t0 = time.time()
            results = registration_model(
                img_f,
                img_m,
                transform_type=list(list_of_eval_aligns),
                return_aligned_points=True,
                aff_f=aff_f,
                aff_m=aff_m,
            )

            # warp once per align over the whole batch, then score per pair
            warped = {}
            for align, res in results.items():
                grid = res["grid"]
                img_a = warp(grid, img_m)
                seg_a = warp(grid, seg_m) if seg_available else None
                warped[align] = (grid, img_a, seg_a)
            jax.block_until_ready([w[1] for w in warped.values()])
            batch_time = time.time() - t0

            for j, entry in enumerate(work):
                sl = slice(j, j + 1)
                img_f_j, img_m_j = img_f[sl], img_m[sl]
                if seg_available:
                    n_cls_j = entry["n_cls"]
                    seg_f_j = seg_f[sl, :n_cls_j]
                    seg_m_j = seg_m[sl, :n_cls_j]
                _save_pair_common(
                    entry, aug, img_f_j, img_m_j,
                    seg_f_j if seg_available else None,
                    seg_m_j if seg_available else None,
                )

                all_metrics = {}
                for align, res in results.items():
                    grid, img_a, seg_a = warped[align]
                    grid_j, img_a_j = grid[sl], img_a[sl]
                    seg_a_j = seg_a[sl, :n_cls_j] if seg_available else None
                    metrics = _metrics_for_pair(
                        list_of_eval_metrics, args, seg_available,
                        img_f_j, img_a_j,
                        seg_f_j if seg_available else None, seg_a_j, grid_j,
                    )
                    all_metrics[align] = metrics
                    print(
                        f"-> {align}: align_time={res.get('time', float('nan')):.3f}s "
                        f"batch_time={batch_time:.3f}s/{n_work}pairs",
                        metrics,
                    )
                    save_dict_as_json(metrics, entry["metrics_paths"][aug][align])
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
                            np.asarray(img_f_j)[0, 0],
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
