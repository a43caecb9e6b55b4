"""Pairwise registration evaluation harness.

Sweeps subjects x augmentations x transform types, one keypoint extraction
per pair (all aligns share it), computes the metric suite, and saves JSON
metrics + .npy artifacts with the reference's exact layout and key scheme
``metric:mod1:mod2:aug:align`` (reference scripts/pairwise_register_eval.py).

The reference's jdlessthan0 copy-paste bug (it computed jdstd;
pairwise_register_eval.py:345) is fixed here.
"""

from __future__ import annotations

import os
from pathlib import Path

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


def run_eval(
    loader,
    registration_model,
    list_of_eval_metrics,
    list_of_eval_names,
    list_of_eval_augs,
    list_of_eval_aligns,
    args,
    save_dir_prefix="eval",
):
    """Returns the test_metrics dict keyed ``metric:mod1:mod2:aug:align``."""
    test_metrics = _build_metric_dict(
        list_of_eval_metrics, list_of_eval_augs, list_of_eval_aligns, list_of_eval_names
    )
    seg_available = getattr(args, "seg_available", False)

    wanted_pairs = {(str(n1), str(n2)) for n1, n2 in list_of_eval_names}
    for i, (fixed, moving) in enumerate(loader):
        if args.early_stop_eval_subjects and i == args.early_stop_eval_subjects:
            break
        mod1 = fixed["modality"][0]
        mod2 = moving["modality"][0]
        if (str(mod1), str(mod2)) not in wanted_pairs:
            # loader may carry pairs for other suites (uni vs multimodal);
            # only score the ones this suite's metric dict was built for
            continue
        for aug in list_of_eval_augs:
            param = parse_test_aug(aug)
            mod1_str = "-".join(str(mod1).split("/")[-2:])
            mod2_str = "-".join(str(mod2).split("/")[-2:])
            save_dir = (
                Path(args.model_eval_dir) / save_dir_prefix / f"{i}_{mod1_str}_{mod2_str}"
            )
            os.makedirs(save_dir, exist_ok=True)

            metrics_paths = {
                align: save_dir / f"metrics-{aug}-{align}.json"
                for align in list_of_eval_aligns
            }
            if args.skip_if_completed and all(p.exists() for p in metrics_paths.values()):
                print("Found metrics for all alignments, skipping registration...")
                all_metrics = {
                    k: load_dict_from_json(v) for k, v in metrics_paths.items()
                }
            else:
                img_f = jnp.asarray(fixed["img"], jnp.float32)
                img_m = jnp.asarray(moving["img"], jnp.float32)
                aff_f = jnp.asarray(fixed["affine"], jnp.float32)
                aff_m = jnp.asarray(moving["affine"], jnp.float32)
                if seg_available:
                    n_cls = int(max(fixed["seg"].max(), moving["seg"].max())) + 1
                    seg_f = U.one_hot(jnp.asarray(fixed["seg"], jnp.int32), n_cls)
                    seg_m = U.one_hot(jnp.asarray(moving["seg"], jnp.int32), n_cls)

                # explicit eval-time augmentation of the moving image
                if seg_available:
                    img_m, seg_m = affine_augment(img_m, param, seg=seg_m)
                else:
                    img_m = affine_augment(img_m, param)

                results = registration_model(
                    img_f,
                    img_m,
                    transform_type=list(list_of_eval_aligns),
                    return_aligned_points=True,
                    aff_f=aff_f,
                    aff_m=aff_m,
                )

                # align-independent artifacts: save once per (pair, aug)
                np.save(save_dir / f"img_f_{i}-{mod1_str}.npy", np.asarray(img_f[0]))
                np.save(
                    save_dir / f"img_m_{i}-{mod2_str}-{aug}.npy", np.asarray(img_m[0])
                )
                if seg_available:
                    np.save(
                        save_dir / f"seg_f_{i}-{mod1_str}.npy",
                        np.argmax(np.asarray(seg_f), axis=1),
                    )
                    np.save(
                        save_dir / f"seg_m_{i}-{mod2_str}-{aug}.npy",
                        np.argmax(np.asarray(seg_m), axis=1),
                    )

                all_metrics = {}
                for align, res in results.items():
                    grid = res["grid"]
                    img_a = align_img(grid, img_m)
                    if seg_available:
                        seg_a = align_img(grid, seg_m)
                        dice_total = 1.0 - float(
                            M.DiceLoss(hard=True)(seg_a, seg_f, ign_first_ch=True)
                        )
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
                            metrics["jdlessthan0"] = M.jdlessthan0(
                                grid_permute, as_percentage=True
                            )
                        else:
                            raise ValueError(f'Invalid metric "{m}"')
                    all_metrics[align] = metrics

                    print(f"-> {align}: time={res['time']:.3f}s", metrics)

                    # per-align artifacts (same filenames as the reference);
                    # align-independent files were saved above, once
                    save_dict_as_json(metrics, metrics_paths[align])
                    np.save(
                        save_dir / f"img_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                        np.asarray(img_a[0]),
                    )
                    np.save(
                        save_dir / f"grid_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                        np.asarray(grid[0]),
                    )
                    if seg_available:
                        np.save(
                            save_dir
                            / f"seg_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                            np.argmax(np.asarray(seg_a), axis=1),
                        )
                    if res.get("points_f") is not None:
                        np.save(
                            save_dir / f"points_f_{i}-{mod1_str}.npy",
                            np.asarray(res["points_f"][0]),
                        )
                        np.save(
                            save_dir / f"points_m_{i}-{mod2_str}-{aug}.npy",
                            np.asarray(res["points_m"][0]),
                        )
                        np.save(
                            save_dir
                            / f"points_a_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                            np.asarray(res["points_a"][0]),
                        )
                        if res.get("points_weights") is not None:
                            np.save(
                                save_dir
                                / f"points_weights_{i}-{mod1_str}-{mod2_str}-{aug}-{align}.npy",
                                np.asarray(res["points_weights"][0]),
                            )

            for m in list_of_eval_metrics:
                for align in list_of_eval_aligns:
                    test_metrics[f"{m}:{mod1}:{mod2}:{aug}:{align}"].append(
                        all_metrics[align][m]
                    )

    return test_metrics
