"""Grid resampling (the `F.grid_sample` equivalent) in pure XLA.

Semantics match ``torch.nn.functional.grid_sample(..., mode=...,
padding_mode="border", align_corners=False)`` exactly — the #1 parity risk
called out in SURVEY §7 (reference keymorph/utils.py:14-21):

  * unnormalize:  v = ((x + 1) * N - 1) / 2
  * border padding: clip v to [0, N-1] before interpolation
  * grids are `xy`-ordered in their last axis (grid[..., 0] indexes the
    LAST spatial axis), as produced by the reference's ``.flip(-1)``
    (transformations.py:77-79, keypoint_aligners.py:395-397).

The implementation gathers 2^d corners from a flattened volume; XLA fuses the
lerp chain. The hot 3D path routes to the gather-free Pallas kernel in
keymorph_tpu/ops/pallas/resample3d.py (TPU default; exactness-checked with
this gather path as fallback and VJP).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=False: [-1,1] -> voxel, then border clip to [0, N-1]."""
    v = ((coord + 1.0) * size - 1.0) / 2.0
    return jnp.clip(v, 0.0, size - 1.0)


def _gather_volume(img_flat, idx):
    """img_flat: (B, C, V); idx: (B, *S) int32 -> (B, C, *S)."""
    return jax.vmap(lambda im, ix: im[:, ix])(img_flat, idx)


def grid_sample(img, grid, mode="bilinear", allow_pallas=True):
    """Sample `img` at `xy`-ordered normalized grid locations.

    Args:
        img: (B, C, *spatial) — 2D (B, C, H, W) or 3D (B, C, D, H, W).
        grid: (B, *out_spatial, d) in [-1, 1], `xy` ordering
            (grid[..., 0] indexes the last axis of img).
        mode: "bilinear" (trilinear in 3D) or "nearest".

    Returns:
        (B, C, *out_spatial) resampled image.
    """
    d = grid.shape[-1]
    assert img.ndim == d + 2, f"img rank {img.ndim} vs grid dim {d}"
    spatial = img.shape[2:]
    out_spatial = grid.shape[1:-1]
    B, C = img.shape[:2]

    if allow_pallas and d == 3 and mode in ("bilinear", "nearest"):
        # the gather-free Pallas path (TPU default; ~8-12x the XLA gather
        # formulation, see ops/pallas/resample3d.py). warp_grid self-
        # dispatches: ineligible shapes, non-TPU backends, and wild flows
        # all fall back to this module's gather formulation. allow_pallas=
        # False forces the gather path — required inside GSPMD-partitioned
        # programs, where the tpu_custom_call has no partitioning rule
        # (parallel/sharded.py); shard_map'd callers keep the kernel.
        from keymorph_tpu.ops.pallas import resample3d

        return resample3d.warp_grid(img, grid, mode)

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    grid = grid.astype(compute_dtype)

    # xy -> ij: axis k of the volume is indexed by grid[..., d-1-k]
    coords = [
        _unnormalize(grid[..., d - 1 - k], spatial[k]) for k in range(d)
    ]  # each (B, *out_spatial)

    img_flat = img.reshape(B, C, -1).astype(compute_dtype)
    # strides for linear indexing of the flattened volume
    strides = []
    s = 1
    for k in reversed(range(d)):
        strides.insert(0, s)
        s *= spatial[k]

    if mode == "nearest":
        # round half to even, like std::nearbyint used by torch
        idx = jnp.zeros(coords[0].shape, dtype=jnp.int32)
        for k in range(d):
            ck = jnp.clip(jnp.round(coords[k]), 0, spatial[k] - 1).astype(jnp.int32)
            idx = idx + ck * strides[k]
        out = _gather_volume(img_flat, idx)
        return out.reshape(B, C, *out_spatial).astype(img.dtype)

    assert mode == "bilinear", f"unsupported mode {mode}"

    lo, frac = [], []
    for k in range(d):
        f = jnp.floor(coords[k])
        lo.append(f.astype(jnp.int32))
        frac.append(coords[k] - f)

    out = jnp.zeros((B, C, *out_spatial), dtype=compute_dtype)
    for corner in itertools.product((0, 1), repeat=d):
        idx = jnp.zeros(coords[0].shape, dtype=jnp.int32)
        w = jnp.ones(coords[0].shape, dtype=compute_dtype)
        for k in range(d):
            ck = jnp.clip(lo[k] + corner[k], 0, spatial[k] - 1)
            idx = idx + ck * strides[k]
            w = w * (frac[k] if corner[k] else (1.0 - frac[k]))
        out = out + _gather_volume(img_flat, idx) * w[:, None]
    return out.astype(img.dtype)


def align_img(grid, x, mode="bilinear", allow_pallas=True):
    """Warp image `x` with sampling grid `grid` (reference utils.py:14-21).

    Note the reference argument order (grid first) is preserved.
    """
    return grid_sample(x, grid, mode=mode, allow_pallas=allow_pallas)


def align_planes(planes, x, mode="bilinear", allow_pallas=True):
    """Warp image `x` from `ij`-ordered coordinate PLANES (B, 3, D, H, W).

    The planes-native serving companion of :func:`align_img`: identical
    values (`align_img(grid, x) == align_planes(flip(moveaxis(grid, -1, 1),
    1), x)`), but callers that already hold planes — `align_pair(...,
    compute_grid="planes")` — skip the grid's minor-dim-3 transpose
    entirely. Semantics anchor: reference utils.py:14-21.
    """
    if allow_pallas and planes.shape[1] == 3 and mode in ("bilinear", "nearest"):
        from keymorph_tpu.ops.pallas import resample3d

        return resample3d.warp_planes(x, planes, mode)
    from keymorph_tpu.ops.planes import grid_sample_planes

    return grid_sample_planes(x, planes, mode=mode)


def displacement2flow(displacement_field):
    """Voxel-unit displacement field -> [-1, 1] sampling flow.

    Args:
        displacement_field: (N, D, H, W, 3), displacement in voxel units with
            last axis in `xy` order.
    Parity: reference utils.py:24-53 (displacement2pytorchflow), including its
    (dim-1) normalization and identity-grid convention.
    """
    W, H, D = displacement_field.shape[1:-1]
    cz, cy, cx = jnp.meshgrid(
        jnp.linspace(-1, 1, W),
        jnp.linspace(-1, 1, H),
        jnp.linspace(-1, 1, D),
        indexing="ij",
    )
    coords = jnp.stack([cx, cy, cz], axis=-1)[None]
    sizes = jnp.asarray([W, H, D], dtype=displacement_field.dtype)
    disp_norm = 2.0 * displacement_field / (sizes - 1.0)
    return coords.astype(displacement_field.dtype) + disp_norm


# reference-API aliases (utils.py:24-75)
def displacement2pytorchflow(displacement_field):
    return displacement2flow(displacement_field)


def pytorchflow2displacement(flow):
    return flow2displacement(flow)


def flow2displacement(flow):
    """[-1, 1] sampling flow -> voxel-unit displacement field.

    Args:
        flow: (N, D, H, W, 3)
    Returns:
        (N, 3, D, H, W) displacement in voxel units.
    Parity: reference utils.py:56-75 (pytorchflow2displacement).
    """
    flow = jnp.moveaxis(flow, -1, 1)  # (N, 3, D, H, W)
    spatial = flow.shape[2:]
    sizes = jnp.asarray(spatial, dtype=flow.dtype).reshape(1, 3, 1, 1, 1)
    pix = (flow + 1.0) / 2.0 * (sizes - 1.0)
    grid = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=flow.dtype) for s in spatial], indexing="ij"),
        axis=0,
    )[None]
    return pix - grid
