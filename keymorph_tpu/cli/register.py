"""User-facing registration CLI (pairwise + groupwise inference).

Mirrors the reference's scripts/register.py: point it at fixed/moving files
or directories, pick transform types, get warped volumes + grids + metrics.

Usage:
    python -m keymorph_tpu.cli.register \
        --moving moving.nii.gz --fixed fixed.nii.gz \
        --moving_seg mseg.nii.gz --fixed_seg fseg.nii.gz \
        --list_of_aligns affine tps_1 --list_of_metrics mse harddice \
        --load_path /path/to/checkpoint --save_dir ./register_output
    python -m keymorph_tpu.cli.register --groupwise --moving dir_of_niftis/
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("keymorph_tpu.register")
    p.add_argument("--moving", type=str, required=True,
                   help="Moving image path (or directory for --groupwise)")
    p.add_argument("--fixed", type=str, default=None, help="Fixed image path")
    p.add_argument("--moving_seg", type=str, default=None)
    p.add_argument("--fixed_seg", type=str, default=None)
    p.add_argument("--groupwise", action="store_true")
    p.add_argument("--num_keypoints", type=int, default=128)
    p.add_argument("--backbone", type=str, default="conv")
    p.add_argument("--num_levels_for_unet", type=int, default=4)
    p.add_argument("--num_truncated_layers_for_truncatedunet", type=int, default=1)
    p.add_argument("--load_path", type=str, default=None, help="Checkpoint path")
    p.add_argument("--list_of_aligns", nargs="*", default=["affine"])
    p.add_argument("--list_of_metrics", nargs="*", default=["mse"])
    p.add_argument("--list_of_augs", nargs="*", default=["rot0"])
    p.add_argument("--save_dir", type=str, default="./register_output/")
    p.add_argument("--save_eval_to_disk", action="store_true")
    p.add_argument("--half_resolution", action="store_true")
    p.add_argument("--size", type=int, default=None,
                   help="Override the working resolution (default 256, or 128 "
                        "with --half_resolution)")
    p.add_argument("--align_keypoints_in_real_world_coords", action="store_true")
    p.add_argument("--weighted_kp_align", type=str, default=None)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--num_subgrids", type=int, default=4)
    p.add_argument("--num_tps_centers", type=int, default=None,
                   help="Approximate-TPS serving: use only the first S "
                        "keypoints as RBF centers (O(S)/voxel flow; for "
                        "num_keypoints >= 256)")
    p.add_argument("--group_size", type=int, default=8)
    p.add_argument("--early_stop_eval_subjects", type=int, default=None)
    p.add_argument("--use_amp", action="store_true")
    p.add_argument("--dim", type=int, default=3)
    p.add_argument("--skip_if_completed", action="store_true")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--debug_mode", action="store_true")
    return p.parse_args(argv)


def _gather_paths(path):
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".nii", ".nii.gz", ".npy"))
        )
    return [path]


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.cli.eval_groupwise import run_group_eval
    from keymorph_tpu.cli.eval_pairwise import run_eval
    from keymorph_tpu.data import Preprocessor
    from keymorph_tpu.data.datasets import DataLoader, PairedDataset, SingleDataset, Subject
    from keymorph_tpu.training import checkpoint as ckpt
    from keymorph_tpu.training.config import Config, build_model

    size = args.size or (128 if args.half_resolution else 256)
    transform = Preprocessor(size=(size,) * 3)

    config = Config(
        num_keypoints=args.num_keypoints,
        backbone=args.backbone,
        num_levels_for_unet=args.num_levels_for_unet,
        num_truncated_layers_for_truncatedunet=args.num_truncated_layers_for_truncatedunet,
        align_keypoints_in_real_world_coords=args.align_keypoints_in_real_world_coords,
        weighted_kp_align=args.weighted_kp_align,
        num_subgrids=args.num_subgrids,
        num_tps_centers=args.num_tps_centers,
        use_amp=args.use_amp,
        dim=args.dim,
        seed=args.seed,
        save_dir=args.save_dir,
    )
    model = build_model(config)
    model.seed_rng(args.seed)
    example = jnp.zeros((1, 1, size, size, size), jnp.float32)
    model.init_params(jax.random.PRNGKey(args.seed), example)
    if args.load_path:
        if args.load_path.endswith((".pt", ".pth", ".h5", ".pt.tar", ".tar")):
            # reference (torch) checkpoint: import the backbone weights
            from keymorph_tpu.tools.import_torch_weights import load_torch_backbone

            model.params = load_torch_backbone(args.load_path, model.params)
            print(f"Imported torch reference checkpoint {args.load_path}")
        else:
            payload = ckpt.load_checkpoint(args.load_path)
            model.params = jax.tree.map(jnp.asarray, payload["params"])
            print(f"Loaded checkpoint {args.load_path}")
    model.eval()

    save_dir = Path(args.save_dir)
    os.makedirs(save_dir, exist_ok=True)

    class EvalArgs:
        pass

    ea = EvalArgs()
    ea.model_eval_dir = save_dir
    ea.visualize = args.visualize
    ea.early_stop_eval_subjects = args.early_stop_eval_subjects
    ea.skip_if_completed = args.skip_if_completed
    ea.seg_available = args.moving_seg is not None or args.groupwise
    ea.dim = args.dim
    ea.save_eval_to_disk = True
    ea.batch_size = 1
    ea.debug_mode = args.debug_mode

    if args.groupwise:
        moving_paths = _gather_paths(args.moving)
        if args.moving_seg:
            seg_paths = _gather_paths(args.moving_seg)
            assert len(seg_paths) == len(moving_paths), (
                f"--moving_seg dir has {len(seg_paths)} files but --moving has "
                f"{len(moving_paths)}; they pair by sorted order"
            )
        else:
            seg_paths = [None] * len(moving_paths)
        subjects = [
            Subject(img_path=p, seg_path=s, modality="group")
            for p, s in zip(moving_paths, seg_paths)
        ]
        ea.seg_available = args.moving_seg is not None
        ea.mesh = None
        if jax.device_count() > 1:
            from keymorph_tpu.parallel.mesh import make_mesh

            ea.mesh = make_mesh(space=1)
        loader = {"group": SingleDataset(subjects, transform)}
        metrics = run_group_eval(
            loader, model, args.list_of_metrics, ["group"], args.list_of_augs,
            args.list_of_aligns, [min(args.group_size, len(subjects))], ea,
        )
    else:
        assert args.fixed is not None, "--fixed required for pairwise"
        fixed = [
            Subject(img_path=p, seg_path=args.fixed_seg, modality="fixed")
            for p in _gather_paths(args.fixed)
        ]
        moving = [
            Subject(img_path=p, seg_path=args.moving_seg, modality="moving")
            for p in _gather_paths(args.moving)
        ]
        loader = DataLoader(
            PairedDataset(list(zip(fixed, moving)), transform), batch_size=1
        )
        # pipeline NIfTI decode with device compute, and fan pairs out over
        # all chips (the reference's DataParallel axis, SURVEY §2.5)
        from keymorph_tpu.data import ThreadPrefetcher

        loader = ThreadPrefetcher(loader, depth=2)
        mesh = None
        if jax.device_count() > 1:
            from keymorph_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(space=1)
        metrics = run_eval(
            loader, model, args.list_of_metrics, [("fixed", "moving")],
            args.list_of_augs, args.list_of_aligns, ea, save_dir_prefix="register",
            mesh=mesh,
        )

    print("\nFinal metrics:")
    for k, v in metrics.items():
        if v:
            print(f"  {k}: {np.mean([np.mean(x) for x in v]):.5f}")
    return metrics


if __name__ == "__main__":
    main()
