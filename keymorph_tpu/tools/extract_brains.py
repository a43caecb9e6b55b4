"""Brain extraction over a directory (the reference's notebook [B] as a
script): SimpleUnet mask prediction + connected-component cleanup.

Usage:
    python -m keymorph_tpu.tools.extract_brains \
        --img_dir ixi/T1 --out_dir ixi/T1_mask --checkpoint params.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="SimpleUnet params (orbax dir or .npz); random init "
                        "if omitted (for smoke testing only)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--clean_threshold", type=float, default=0.2)
    p.add_argument("--size", type=int, default=None,
                   help="Optional working resolution")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from keymorph_tpu.brain_extract import extract_brain
    from keymorph_tpu.data.nifti import load_nifti, save_nifti, to_canonical
    from keymorph_tpu.data.preprocess import resize_volume
    from keymorph_tpu.models import SimpleUnet

    model = SimpleUnet(out_channels=1)
    if args.checkpoint:
        if args.checkpoint.endswith(".npz"):
            flat = dict(np.load(args.checkpoint))
            import flax

            params = flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in flat.items()}
            )
            params = {"params": params} if "params" not in params else params
        else:
            import orbax.checkpoint as ocp

            params = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
    else:
        print("WARNING: no checkpoint given; using random init")
        size = args.size or 16
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, size, 1)))

    apply_fn = jax.jit(model.apply)
    os.makedirs(args.out_dir, exist_ok=True)
    for name in sorted(os.listdir(args.img_dir)):
        if not name.endswith((".nii", ".nii.gz")):
            continue
        img = to_canonical(load_nifti(os.path.join(args.img_dir, name)))
        data = img.data.astype(np.float32)
        orig_shape = data.shape
        if args.size:
            data = resize_volume(data, (args.size,) * 3)
        data = (data - data.min()) / max(data.max() - data.min(), 1e-6)
        mask = extract_brain(
            params, data[None, None], apply_fn=apply_fn,
            threshold=args.threshold, clean_threshold=args.clean_threshold,
        )[0, 0]
        if args.size:
            mask = (resize_volume(mask.astype(np.float32), orig_shape) > 0.5).astype(
                np.uint8
            )
        base = name.split(".")[0]
        out_path = os.path.join(args.out_dir, f"{base}_mask.nii.gz")
        save_nifti(out_path, mask, img.affine)
        print(f"{name}: mask voxels={int(mask.sum())} -> {out_path}")


if __name__ == "__main__":
    main()
