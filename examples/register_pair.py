"""Example: pairwise registration of two volumes, end to end.

Loads two NIfTI volumes, registers moving -> fixed with rigid, affine, and
TPS in one forward pass, warps image + segmentation, reports metrics, and
renders the registration panel.

    python examples/register_pair.py \
        --fixed f.nii.gz --moving m.nii.gz [--fixed_seg fs --moving_seg ms] \
        [--size 128] [--checkpoint ckpt_dir] [--out out_dir]

Runs with a randomly initialized backbone if no checkpoint is given (useful
as a smoke test; keypoint CoM on intensity structure already gives coarse
alignment).
"""

import argparse
import os
import sys

import numpy as np

# allow running straight from a checkout (python examples/register_pair.py)
# without pip-installing the package
try:
    import keymorph_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fixed", required=True)
    p.add_argument("--moving", required=True)
    p.add_argument("--fixed_seg")
    p.add_argument("--moving_seg")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--num_keypoints", type=int, default=128)
    p.add_argument("--checkpoint")
    p.add_argument("--out", default="./register_pair_out")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.data import Preprocessor
    from keymorph_tpu.losses import DiceLoss, mse_loss
    from keymorph_tpu.models import KeyMorph, TruncatedUNet3D
    from keymorph_tpu.ops.resample import align_img
    from keymorph_tpu.utils import one_hot
    from keymorph_tpu import viz

    pre = Preprocessor(size=(args.size,) * 3)
    fixed = pre.load(args.fixed, seg_path=args.fixed_seg)
    moving = pre.load(args.moving, seg_path=args.moving_seg)
    img_f = jnp.asarray(fixed["img"][None])
    img_m = jnp.asarray(moving["img"][None])

    km = KeyMorph(
        backbone=TruncatedUNet3D(
            out_channels=args.num_keypoints, f_maps=32, num_levels=4,
            num_truncated_layers=1,
        ),
        num_keypoints=args.num_keypoints,
    )
    km.init_params(jax.random.PRNGKey(0), img_f)
    if args.checkpoint:
        from keymorph_tpu.training import checkpoint as ckpt

        km.params = ckpt.load_checkpoint(args.checkpoint)["params"]
        print(f"loaded checkpoint {args.checkpoint}")

    results = km(
        img_f, img_m,
        transform_type=["rigid", "affine", "tps_1"],
        return_aligned_points=True,
    )

    os.makedirs(args.out, exist_ok=True)
    for name, res in results.items():
        img_a = align_img(res["grid"], img_m)
        line = f"{name}: mse={float(mse_loss(img_f, img_a)):.5f}"
        if "seg" in fixed and "seg" in moving:
            n_cls = int(max(fixed["seg"].max(), moving["seg"].max())) + 1
            seg_f = one_hot(jnp.asarray(fixed["seg"][None], jnp.int32), n_cls)
            seg_m = one_hot(jnp.asarray(moving["seg"][None], jnp.int32), n_cls)
            seg_a = align_img(res["grid"], seg_m)
            dice = 1 - float(DiceLoss(hard=True)(seg_a, seg_f, ign_first_ch=True))
            line += f" harddice={dice:.4f}"
        print(line, f"({res['time']:.2f}s)")
        np.save(os.path.join(args.out, f"grid_{name}.npy"), np.asarray(res["grid"][0]))
        viz.imshow_registration_3d(
            np.asarray(img_m[0, 0]), np.asarray(img_f[0, 0]), np.asarray(img_a[0, 0]),
            np.asarray(res["points_m"][0]), np.asarray(res["points_f"][0]),
            np.asarray(res["points_a"][0]),
            save_path=os.path.join(args.out, f"panel_{name}.png"),
        )
    print(f"grids + panels saved to {args.out}")


if __name__ == "__main__":
    main()
