"""Registration-quality parity vs the torch reference with TRAINED weights.

BASELINE.json's parity metric is "Dice + keypoint-MSE parity vs torch".
Round 1 validated it with random-init golden tests only; this tool closes
the loop with real (trained) weights. The reference's released checkpoints
are not downloadable in this environment (zero egress) and its example
intensity volumes are stripped, so the harness:

  1. generates synthetic deformed-blob "brains" (images + 4-label segs),
  2. trains the torch reference KeyMorph end-to-end on them (unsupervised
     MSE through the closed-form affine solve — scripts/train.py:152-176
     semantics) on the host CPU,
  3. imports the trained backbone via tools/import_torch_weights,
  4. registers the same held-out pair in BOTH frameworks across the align
     sweep and writes PARITY_WEIGHTS.md with per-align Dice / keypoint
     deltas.

Run: python -m keymorph_tpu.tools.weight_parity --steps 200 --out /tmp/parity
"""

from __future__ import annotations

import argparse
import os
import sys
import types


# ---------------------------------------------------------------------------
# synthetic data (numpy only — shared by both frameworks)
# ---------------------------------------------------------------------------


def make_subjects(n_subjects=6, size=64, n_blobs=24, seed=0):
    """Blob-brain phantoms: a shared template of gaussian blobs, per-subject
    smooth spatial perturbation (small affine + per-blob jitter). Returns
    (imgs (N,1,S,S,S) float32, segs (N,1,S,S,S) int32 with 4 labels)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers0 = rng.uniform(0.25, 0.75, size=(n_blobs, 3)) * size
    sigmas = rng.uniform(0.04, 0.10, size=(n_blobs,)) * size
    amps = rng.uniform(0.5, 1.0, size=(n_blobs,))
    labels = rng.integers(1, 4, size=(n_blobs,))  # blob -> seg label 1..3

    ax = np.arange(size, dtype=np.float32)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")

    imgs, segs = [], []
    for s in range(n_subjects):
        # small random rotation+scale+shift of the template
        ang = rng.uniform(-0.2, 0.2, size=3)
        Rz = np.array(
            [[np.cos(ang[0]), -np.sin(ang[0]), 0],
             [np.sin(ang[0]), np.cos(ang[0]), 0],
             [0, 0, 1]]
        )
        Ry = np.array(
            [[np.cos(ang[1]), 0, np.sin(ang[1])],
             [0, 1, 0],
             [-np.sin(ang[1]), 0, np.cos(ang[1])]]
        )
        scale = np.diag(rng.uniform(0.9, 1.1, size=3))
        M = Rz @ Ry @ scale
        shift = rng.uniform(-0.04, 0.04, size=3) * size
        c = (centers0 - size / 2) @ M.T + size / 2 + shift
        c = c + rng.normal(0, 0.01 * size, size=c.shape)  # per-blob jitter

        img = np.zeros((size, size, size), np.float32)
        lab = np.zeros((4, size, size, size), np.float32)
        for b in range(n_blobs):
            d2 = (
                (zz - c[b, 0]) ** 2 + (yy - c[b, 1]) ** 2 + (xx - c[b, 2]) ** 2
            )
            g = amps[b] * np.exp(-d2 / (2 * sigmas[b] ** 2))
            img += g
            lab[labels[b]] = np.maximum(lab[labels[b]], g)
        img = (img / img.max()).astype(np.float32)
        seg = np.where(
            lab.max(axis=0) > 0.3, lab.argmax(axis=0), 0
        ).astype(np.int32)
        imgs.append(img[None])
        segs.append(seg[None])
    import numpy as np

    return np.stack(imgs), np.stack(segs)


# ---------------------------------------------------------------------------
# torch reference side
# ---------------------------------------------------------------------------


def _import_reference(ref_path="/root/reference"):
    """Import the torch reference with its optional heavy deps stubbed
    (nibabel/torchio/skimage are used only by paths this harness avoids)."""
    for name in ("nibabel", "torchio", "skimage", "skimage.morphology"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].morphology = sys.modules["skimage.morphology"]
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    import keymorph  # noqa: F401  (the reference package)

    from keymorph.model import KeyMorph as RefKeyMorph
    from keymorph.unet3d.model import TruncatedUNet3D as RefTruncatedUNet3D
    from keymorph.unet3d.model import UNet3D as RefUNet3D

    return RefKeyMorph, RefUNet3D, RefTruncatedUNet3D


def train_reference(imgs, steps, num_keypoints, f_maps, num_levels, lr, seed=0,
                    backbone="unet", num_truncated_layers=1):
    """Train the reference end-to-end (affine, unsupervised MSE) on CPU."""
    import numpy as np
    import torch

    RefKeyMorph, RefUNet3D, RefTruncatedUNet3D = _import_reference()
    from keymorph.augmentation import random_affine_augment
    from keymorph.utils import align_img

    torch.manual_seed(seed)
    if backbone == "truncatedunet":
        net_t = RefTruncatedUNet3D(
            1, num_keypoints, num_truncated_layers, final_sigmoid=False,
            f_maps=f_maps, layer_order="gcr", num_groups=min(8, f_maps),
            num_levels=num_levels, is_segmentation=False,
        )
    else:
        net_t = RefUNet3D(
            1, num_keypoints, final_sigmoid=False, f_maps=f_maps,
            layer_order="gcr", num_groups=min(8, f_maps), num_levels=num_levels,
            is_segmentation=False,
        )
    model = RefKeyMorph(net_t, num_keypoints, dim=3)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    data = torch.from_numpy(imgs)
    rng = np.random.default_rng(seed)

    losses = []
    for step in range(steps):
        i, j = rng.choice(len(imgs), size=2, replace=False)
        img_f = data[i : i + 1]
        img_m = data[j : j + 1]
        img_m = random_affine_augment(
            img_m, max_random_params=(0.1, 0.1, 1.57, 0.05), scale_params=1.0
        )
        out = model(
            img_f, img_m, transform_type="affine", return_aligned_points=False
        )["affine"]
        img_a = align_img(out["grid"], img_m)
        loss = torch.nn.functional.mse_loss(img_f, img_a)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        if step % 20 == 0 or step == steps - 1:
            print(f"[torch] step {step}: mse {float(loss):.5f}", flush=True)
    return model, losses


def reference_register(model, img_f, img_m, aligns, aff_f=None, aff_m=None):
    """Registration results from the trained torch reference."""
    import torch

    from keymorph.utils import align_img

    model.eval()
    kwargs = {}
    model.align_keypoints_in_real_world_coords = aff_f is not None
    if aff_f is not None:
        kwargs = dict(
            aff_f=torch.from_numpy(aff_f), aff_m=torch.from_numpy(aff_m)
        )
    with torch.no_grad():
        res = model(
            torch.from_numpy(img_f),
            torch.from_numpy(img_m),
            transform_type=list(aligns),
            return_aligned_points=False,
            **kwargs,
        )
    out = {}
    for k, r in res.items():
        out[k] = {
            "grid": r["grid"].numpy(),
            "points_f": r["points_f"].float().numpy(),
            "points_m": r["points_m"].float().numpy(),
        }

    def warp(grid, vol, mode="bilinear"):
        return align_img(
            torch.from_numpy(grid), torch.from_numpy(vol), mode=mode
        ).numpy()

    return out, warp


# ---------------------------------------------------------------------------
# keymorph_tpu side + comparison
# ---------------------------------------------------------------------------


def _our_register(ckpt_path, backbone_kind, args, img_f, img_m,
                  aff_f=None, aff_m=None):
    """Import the trained torch backbone and register with keymorph_tpu."""
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models import TruncatedUNet3D, UNet3D
    from keymorph_tpu.models.keymorph import KeyMorph
    from keymorph_tpu.tools.import_torch_weights import load_torch_backbone

    if backbone_kind == "truncatedunet":
        backbone = TruncatedUNet3D(
            out_channels=args.num_keypoints, f_maps=args.f_maps,
            num_levels=args.num_levels, num_truncated_layers=1,
        )
    else:
        backbone = UNet3D(
            out_channels=args.num_keypoints, f_maps=args.f_maps,
            num_levels=args.num_levels,
        )
    model = KeyMorph(
        backbone=backbone,
        num_keypoints=args.num_keypoints,
        align_keypoints_in_real_world_coords=aff_f is not None,
    )
    model.init_params(jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(img_f)))
    model.params = load_torch_backbone(ckpt_path, model.params)
    model.eval()
    kwargs = {}
    if aff_f is not None:
        kwargs = dict(aff_f=jnp.asarray(aff_f), aff_m=jnp.asarray(aff_m))
    return model(
        jnp.asarray(img_f), jnp.asarray(img_m),
        transform_type=list(args.aligns), **kwargs,
    )


def _compare(tag, ref_res, ref_warp, our_res, seg_f, seg_m, aligns):
    """Per-align Dice / keypoint / grid deltas. Returns report rows."""
    import jax.numpy as jnp
    import numpy as np

    from keymorph_tpu.metrics import DiceLoss
    from keymorph_tpu.ops.resample import align_img as our_align_img
    from keymorph_tpu.utils import one_hot

    n_cls = int(max(seg_f.max(), seg_m.max())) + 1
    seg_f_oh = one_hot(jnp.asarray(seg_f), n_cls)
    seg_m_oh = one_hot(jnp.asarray(seg_m), n_cls)
    dice = DiceLoss(hard=True)

    rows = []
    for k in aligns:
        r_t, r_j = ref_res[k], our_res[k]
        kp_mse = float(
            np.mean((r_t["points_f"] - np.asarray(r_j["points_f"])) ** 2)
            + np.mean((r_t["points_m"] - np.asarray(r_j["points_m"])) ** 2)
        )
        grid_delta = float(np.max(np.abs(r_t["grid"] - np.asarray(r_j["grid"]))))
        seg_a_t = ref_warp(r_t["grid"], np.asarray(seg_m_oh, np.float32))
        seg_a_j = our_align_img(r_j["grid"], seg_m_oh)
        dice_t = 1.0 - float(dice(jnp.asarray(seg_a_t), seg_f_oh, ign_first_ch=True))
        dice_j = 1.0 - float(dice(seg_a_j, seg_f_oh, ign_first_ch=True))
        rows.append((k, dice_t, dice_j, abs(dice_t - dice_j), kp_mse, grid_delta))
        print(
            f"[parity:{tag}] {k}: dice torch {dice_t:.5f} vs tpu {dice_j:.5f} "
            f"(delta {abs(dice_t - dice_j):.2e}), kp mse {kp_mse:.2e}, "
            f"grid max|d| {grid_delta:.2e}",
            flush=True,
        )
    return rows


def _rw_affines(seed=3):
    """A pair of plausible NIfTI affines (anisotropic voxels + offsets)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def one():
        a = np.eye(4, dtype=np.float32)
        a[:3, :3] = np.diag(rng.uniform(0.8, 1.5, size=3)).astype(np.float32)
        a[:3, 3] = rng.uniform(-40, 40, size=3)
        return a[None]

    return one(), one()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/weight_parity")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--eval_size", type=int, default=128,
                   help="resolution of the truncatedunet/rw eval pairs")
    p.add_argument("--num_keypoints", type=int, default=32)
    p.add_argument("--f_maps", type=int, default=8)
    p.add_argument("--num_levels", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument(
        "--aligns", nargs="+",
        default=["rigid", "affine", "tps_1", "tps_0.1", "tps_0"],
    )
    p.add_argument(
        "--configs", nargs="+",
        default=["unet64", "truncatedunet128", "truncatedunet128_rw"],
    )
    p.add_argument("--report", default="PARITY_WEIGHTS.md")
    args = p.parse_args(argv)

    import jax

    # parity is a numerical claim; pin both sides to the host CPU (fp32)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    os.makedirs(args.out, exist_ok=True)
    sections = []

    # ---- config family 1: UNet3D at the training resolution --------------
    if "unet64" in args.configs:
        imgs, segs = make_subjects(size=args.size)
        model_t, losses = train_reference(
            imgs[2:], args.steps, args.num_keypoints, args.f_maps,
            args.num_levels, args.lr,
        )
        ckpt_path = os.path.join(args.out, "reference_trained.pt")
        torch.save({"state_dict": model_t.backbone.state_dict()}, ckpt_path)
        img_f, img_m = imgs[0:1], imgs[1:2]
        ref_res, ref_warp = reference_register(model_t, img_f, img_m, args.aligns)
        our_res = _our_register(ckpt_path, "unet", args, img_f, img_m)
        rows = _compare("unet64", ref_res, ref_warp, our_res,
                        segs[0:1], segs[1:2], args.aligns)
        sections.append((
            f"UNet3D @ {args.size}^3 (trained {args.steps} steps, final MSE "
            f"{losses[-1]:.5f} from {losses[0]:.5f})", rows))

    # ---- config family 2: the flagship TruncatedUNet, eval at 128^3 ------
    if any(c.startswith("truncatedunet") for c in args.configs):
        imgs, segs = make_subjects(size=args.size, seed=1)
        model_t, losses = train_reference(
            imgs[2:], args.steps, args.num_keypoints, args.f_maps,
            args.num_levels, args.lr, backbone="truncatedunet",
        )
        ckpt_path = os.path.join(args.out, "reference_trained_truncated.pt")
        torch.save({"state_dict": model_t.backbone.state_dict()}, ckpt_path)
        # CPU-budget note: training runs at --size; the backbone is
        # resolution-agnostic, so the 128^3 claim is carried by EVALUATING
        # the trained weights on a held-out 128^3 pair.
        imgs_hi, segs_hi = make_subjects(
            n_subjects=2, size=args.eval_size, seed=7
        )
        img_f, img_m = imgs_hi[0:1], imgs_hi[1:2]
        seg_f, seg_m = segs_hi[0:1], segs_hi[1:2]

        if "truncatedunet128" in args.configs:
            ref_res, ref_warp = reference_register(
                model_t, img_f, img_m, args.aligns
            )
            our_res = _our_register(ckpt_path, "truncatedunet", args, img_f, img_m)
            rows = _compare("truncatedunet128", ref_res, ref_warp, our_res,
                            seg_f, seg_m, args.aligns)
            sections.append((
                f"TruncatedUNet3D @ {args.eval_size}^3 (weights trained "
                f"{args.steps} steps at {args.size}^3 — CPU budget; final MSE "
                f"{losses[-1]:.5f})", rows))

        if "truncatedunet128_rw" in args.configs:
            aff_f, aff_m = _rw_affines()
            ref_res, ref_warp = reference_register(
                model_t, img_f, img_m, args.aligns, aff_f=aff_f, aff_m=aff_m
            )
            our_res = _our_register(
                ckpt_path, "truncatedunet", args, img_f, img_m,
                aff_f=aff_f, aff_m=aff_m,
            )
            rows = _compare("truncatedunet128_rw", ref_res, ref_warp, our_res,
                            seg_f, seg_m, args.aligns)
            sections.append((
                f"TruncatedUNet3D @ {args.eval_size}^3, REAL-WORLD coords "
                "(same weights, anisotropic NIfTI affines)", rows))

    with open(args.report, "w") as fh:
        fh.write(
            "# Registration-quality parity with trained reference weights\n\n"
            "Torch reference trained on synthetic blob-brains (unsupervised "
            "MSE through the closed-form affine solve, scripts/train.py:152-"
            "176 semantics) on the host CPU; backbones imported via "
            "`tools/import_torch_weights`; both frameworks registered the "
            "same held-out pairs on CPU fp32.\n"
        )
        worst = 0.0
        for title, rows in sections:
            fh.write(
                f"\n## {title}\n\n"
                "| align | Dice (torch) | Dice (keymorph_tpu) | |ΔDice| | "
                "keypoint MSE | grid max|Δ| |\n"
                "|---|---|---|---|---|---|\n"
            )
            for k, dt, dj, dd, km, gd in rows:
                fh.write(
                    f"| {k} | {dt:.5f} | {dj:.5f} | {dd:.2e} | {km:.2e} "
                    f"| {gd:.2e} |\n"
                )
                worst = max(worst, dd)
        fh.write(
            "\nGenerated by `python -m keymorph_tpu.tools.weight_parity`.\n"
        )
    print(f"wrote {args.report}; worst |dDice| = {worst:.2e}")
    assert worst < 1e-3, f"Dice parity violated: max delta {worst}"
    return sections


if __name__ == "__main__":
    main()
