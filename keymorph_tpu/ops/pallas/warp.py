"""Fused flow-field kernels (Pallas TPU) + plane-based resampling.

The hot inference loop of the framework is: evaluate the fitted transform at
every voxel of the output volume, then trilinearly sample the moving image
there (SURVEY §7 step 2's "north-star fusion"; reference subgrid loop at
keypoint_aligners.py:365-397). The XLA reference path materializes the
(N_grid x T) RBF matrix in HBM chunks; the Pallas kernel here computes grid
coordinates from the program id, builds per-tile distance/RBF blocks in
VMEM, and hits the MXU twice per tile:

    sq   = sum_a (P_a - C_a)^2              3 VPU FMA passes (exact fp32)
    out  = U(sq) @ w + [1|P] @ a            (TILE,T)@(T,3)   MXU

Flow is emitted as `ij`-ordered coordinate PLANES (3, D, H, W) — the layout
the resampler consumes directly — so neither the (N,3) xy-flipped grid nor
the RBF matrix ever exists in HBM.

Autodiff: these kernels are inference-path; training uses the XLA solver
path (differentiable end-to-end).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_DIST = 1e-6
_EPS_LOG = 1e-6


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tps_flow_kernel(ctrl_ref, theta_ref, pre_ref, out_ref, *, spatial, tile):
    """One tile of the flattened output grid.

    ctrl_ref:  (T_pad, 128)  control points, columns 0..2 live, rest zero
    theta_ref: (T_pad + 8, 128) spline params, columns 0..2 live
               rows [0, T) = RBF weights, rows [T, T+4) = affine part
    pre_ref:   (8, 128) optional pre-transform: rows 0..3, cols 0..3 hold a
               4x4 homogeneous matrix applied to grid points before spline
               evaluation (identity for plain mode; norm->real for
               real-world-coordinate alignment)
    out_ref:   (8, tile) `ij` planes for this tile (rows 0..2 live)
    """
    D, H, W = spatial
    t = pl.program_id(0)

    # grid coordinates of this tile from linear indices (linspace(-1,1,N))
    n = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    k = n % W
    j = (n // W) % H
    i = n // (W * H)
    sd = 2.0 / jnp.float32(max(D - 1, 1))
    sh = 2.0 / jnp.float32(max(H - 1, 1))
    sw = 2.0 / jnp.float32(max(W - 1, 1))
    pz = i.astype(jnp.float32) * sd - 1.0
    py = j.astype(jnp.float32) * sh - 1.0
    px = k.astype(jnp.float32) * sw - 1.0
    P = jnp.stack([pz, py, px], axis=-1)  # (tile, 3)

    # optional affine pre-transform of the query points
    M = pre_ref[:4, :4]  # (4, 4)
    Ph0 = jnp.concatenate([P, jnp.ones((P.shape[0], 1), jnp.float32)], axis=-1)
    P = jax.lax.dot_general(
        Ph0, M, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, :3]

    C = ctrl_ref[:, :3]  # (T_pad, 3); padded rows are zeros
    T_pad = C.shape[0]
    wgt = theta_ref[:T_pad, :3]  # padded rows zero -> contribute nothing
    aff = theta_ref[T_pad : T_pad + 4, :3]  # (4, 3)

    # pairwise squared distances in DIFFERENCE form: the |p|^2+|c|^2-2pc
    # MXU expansion cancels catastrophically for large (real-world)
    # coordinates; three VPU (tile, T_pad) FMA passes are cheap and exact
    sq = jnp.zeros((P.shape[0], T_pad), jnp.float32)
    for a in range(3):
        dd = P[:, a][:, None] - C[:, a][None, :]
        sq = sq + dd * dd
    r = jnp.sqrt(sq + _EPS_DIST)
    U = r * r * jnp.log(r + _EPS_LOG)

    # NOTE on padding: padded control rows are zeros, giving r = |p| and a
    # nonzero U — but their weights rows are zero, so they drop out of the
    # contraction below.
    b = jax.lax.dot_general(
        U, wgt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (tile, 3)
    Ph = jnp.concatenate([jnp.ones((P.shape[0], 1), jnp.float32), P], axis=-1)
    z = jax.lax.dot_general(
        Ph, aff, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = b + z  # (tile, 3) ij-ordered

    # pad 3 -> 8 rows with zeros (scatter is not lowerable on TPU Pallas;
    # pad+transpose is)
    padded = jnp.concatenate(
        [out, jnp.zeros((out.shape[0], 5), jnp.float32)], axis=-1
    )  # (tile, 8)
    out_ref[:, :] = padded.T


def tps_flow_planes(
    theta, ctrl, spatial: Sequence[int], tile: int = 2048, pre_matrix=None
):
    """Evaluate a fitted 3D TPS over the dense linspace grid.

    Args:
        theta: (T+4, 3) spline params (from solvers.fit_tps, batch squeezed).
        ctrl: (T, 3) control points the spline was fitted with.
        spatial: (D, H, W) output grid shape.
        tile: points per kernel invocation (multiple of 128; keep >= 2048 —
            smaller tiles at large N trip a Mosaic scoped-VMEM OOM from
            pipeline buffering).
        pre_matrix: optional (4, 4) homogeneous transform applied to grid
            points before spline evaluation (real-world mode's norm->real).
    Returns:
        (3, D, H, W) float32 `ij`-ordered coordinate planes.
    """
    D, H, W = (int(s) for s in spatial)
    N = D * H * W
    T = ctrl.shape[0]
    assert theta.shape[0] == T + 4, f"theta rows {theta.shape[0]} != T+4"
    N_pad = _round_up(N, tile)
    T_pad = _round_up(T, 8)

    # pack into lane-aligned buffers (last dim 128)
    ctrl_buf = jnp.zeros((T_pad, 128), jnp.float32).at[:T, :3].set(
        ctrl.astype(jnp.float32)
    )
    theta_buf = jnp.zeros((T_pad + 8, 128), jnp.float32)
    theta_buf = theta_buf.at[:T, :3].set(theta[:T].astype(jnp.float32))
    theta_buf = theta_buf.at[T_pad : T_pad + 4, :3].set(
        theta[T : T + 4].astype(jnp.float32)
    )
    if pre_matrix is None:
        pre_matrix = jnp.eye(4, dtype=jnp.float32)
    pre_buf = jnp.zeros((8, 128), jnp.float32).at[:4, :4].set(
        pre_matrix.astype(jnp.float32)
    )

    grid = (N_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_tps_flow_kernel, spatial=(D, H, W), tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_pad, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad + 8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, N_pad), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # CPU = tests only
    )(ctrl_buf, theta_buf, pre_buf)
    return out[:3, :N].reshape(3, D, H, W)


def affine_flow_planes(inverse_matrix, spatial: Sequence[int]):
    """`ij`-ordered coordinate planes for an affine registration.

    Pure XLA — the per-voxel math is three fused multiply-adds, which XLA
    already generates optimally; a Pallas kernel would add nothing.

    Args:
        inverse_matrix: (4, 4) fixed->moving matrix (batch squeezed).
    Returns:
        (3, D, H, W) float32 planes.
    """
    D, H, W = (int(s) for s in spatial)
    axes = [jnp.linspace(-1.0, 1.0, s, dtype=jnp.float32) for s in (D, H, W)]
    zz, yy, xx = jnp.meshgrid(*axes, indexing="ij")
    m = inverse_matrix.astype(jnp.float32)
    planes = [
        m[a, 0] * zz + m[a, 1] * yy + m[a, 2] * xx + m[a, 3] for a in range(3)
    ]
    return jnp.stack(planes, axis=0)


def grid_sample_planes(img, planes, mode: str = "bilinear"):
    """Trilinear/nearest sampling from `ij`-ordered coordinate planes.

    Same semantics as ops.resample.grid_sample (border padding,
    align_corners=False) but takes (B, 3, *spatial) planes directly —
    no xy flip, no (..., 3) re-gather of coordinates.

    Args:
        img: (B, C, D, H, W)
        planes: (B, 3, D', H', W') normalized coords, plane a indexes axis a.
    Returns:
        (B, C, D', H', W')
    """
    from keymorph_tpu.ops.resample import _unnormalize, _gather_volume
    import itertools

    B, C = img.shape[:2]
    spatial = img.shape[2:]
    d = len(spatial)
    out_spatial = planes.shape[2:]
    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)

    coords = [
        _unnormalize(planes[:, a].astype(compute_dtype), spatial[a]) for a in range(d)
    ]

    # NOTE: a 2x2x2 slice-gather variant (_trilinear_block_gather) was tried
    # and profiled 25x SLOWER on TPU: XLA lowers non-unit slice gathers to a
    # serial while-loop of dynamic-slices (333k iterations at 128^3), while
    # scalar gathers take the vectorized path. Eight scalar corner gathers
    # (~18 ms each at 128^3) remain the fastest XLA formulation.
    img_flat = img.reshape(B, C, -1).astype(compute_dtype)
    strides = []
    s = 1
    for k in reversed(range(d)):
        strides.insert(0, s)
        s *= spatial[k]

    if mode == "nearest":
        idx = jnp.zeros(coords[0].shape, jnp.int32)
        for a in range(d):
            idx = idx + jnp.clip(
                jnp.round(coords[a]), 0, spatial[a] - 1
            ).astype(jnp.int32) * strides[a]
        return _gather_volume(img_flat, idx).reshape(B, C, *out_spatial).astype(img.dtype)

    lo = [jnp.floor(c) for c in coords]
    frac = [c - l for c, l in zip(coords, lo)]
    lo = [l.astype(jnp.int32) for l in lo]
    out = jnp.zeros((B, C, *out_spatial), compute_dtype)
    for corner in itertools.product((0, 1), repeat=d):
        idx = jnp.zeros(coords[0].shape, jnp.int32)
        w = jnp.ones(coords[0].shape, compute_dtype)
        for a in range(d):
            ca = jnp.clip(lo[a] + corner[a], 0, spatial[a] - 1)
            idx = idx + ca * strides[a]
            w = w * (frac[a] if corner[a] else (1.0 - frac[a]))
        out = out + _gather_volume(img_flat, idx) * w[:, None]
    return out.astype(img.dtype)


def tps_register_warp(theta, ctrl, img_m, out_spatial=None, mode="bilinear",
                      tile: int = 2048):
    """Fused inference path: TPS flow (Pallas) -> plane resample.

    Args:
        theta: (B, T+4, 3); ctrl: (B, T, 3); img_m: (B, C, D, H, W).
    Returns:
        (warped (B, C, *out_spatial), planes (B, 3, *out_spatial)).
    """
    out_spatial = tuple(out_spatial or img_m.shape[2:])
    flow = jax.vmap(lambda th, c: tps_flow_planes(th, c, out_spatial, tile))(
        theta, ctrl
    )
    from keymorph_tpu.ops.pallas import resample3d

    if resample3d.fast_warp_enabled() and resample3d._shapes_eligible(
        img_m.shape, out_spatial
    ):
        return resample3d.warp_planes(img_m, flow, mode), flow
    return grid_sample_planes(img_m, flow, mode=mode), flow


def affine_register_warp(inverse_matrix, img_m, out_spatial=None, mode="bilinear"):
    """Fused inference path for affine/rigid: flow planes -> plane resample."""
    out_spatial = tuple(out_spatial or img_m.shape[2:])
    flow = jax.vmap(lambda m: affine_flow_planes(m, out_spatial))(inverse_matrix)
    from keymorph_tpu.ops.pallas import resample3d

    if resample3d.fast_warp_enabled() and resample3d._shapes_eligible(
        img_m.shape, out_spatial
    ):
        return resample3d.warp_planes(img_m, flow, mode), flow
    return grid_sample_planes(img_m, flow, mode=mode), flow


def planes_to_grid(planes):
    """(B, 3, *S) ij planes -> (B, *S, 3) xy grid (the reference contract)."""
    return jnp.flip(jnp.moveaxis(planes, 1, -1), axis=-1)
