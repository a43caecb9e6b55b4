"""Fused TPS dense-flow Pallas kernel.

Evaluating a fitted thin-plate spline on a dense grid is the third-largest
stage of a 256^3 registration (~34 ms device time). The XLA chunked path
(`solvers.tps_eval_chunked`) materializes the (T, chunk) RBF matrix to HBM
between the radial-basis fusion and the contraction dot — at 256^3 with
T=128 control points that is a 1.07 GB round-trip per flow field
(trace-verified: `multiply_reduce_fusion` writes f32[128, 2097152], the
following `fusion` reads it back), because XLA does not fuse producers into
dot operands on TPU.

This kernel keeps the RBF matrix in VMEM: per tile of NT grid points it

  * computes squared distances (Tp, NT) from a lane-resident points block
    (8, NT) and a sublane-resident control block (Tp, 128) — pure VPU
    broadcasts, no (T, N, 3) intermediate;
  * applies U(r) = r^2 log(r + eps) in-register (the reference RBF,
    keypoint_aligners.py:336-339, with the same eps order as
    `solvers.tps_pairwise_dist`/`tps_rbf`);
  * contracts with the spline weights on the MXU — bf16 hi/lo
    decompositions stacked on both output dims (the warp kernel's
    single-dispatch trick; Mosaic lowers a plain f32 matmul as one bf16
    pass, 0.12 relative error measured) — and adds the affine part as
    exact fp32 VPU broadcasts.

All padding rows/columns carry zero weights so they contribute exactly
nothing. fp32 throughout (geometry precision rule, solvers.py:21).

Eligibility: d == 3 and N divisible by the tile width (dense grids >= 64^3
always are); other shapes fall back to the XLA formulation. The custom VJP
also falls back to XLA (the kernel serves the inference flow; training
evaluates TPS unchunked through `tps_eval`). `KM_NO_FAST_TPS=1` disables
the kernel.

Parity: reference `TPS.transform_points`/`compute_on_subgrids`
(keypoint_aligners.py:365-433); tolerance-tested against the XLA path in
tests/test_tpsflow_kernel.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_DIST = 1e-6  # keep in sync with solvers._EPS_DIST
_EPS_LOG = 1e-6  # keep in sync with solvers._EPS_LOG

_NT = 2048  # grid points per tile (lane axis; multiple of 128)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _kernel(ctrl_ref, wgt_ref, aff_ref, *refs, Tp, NT, spatial=None):
    """One (b, tile) cell: moved[8, NT] from ctrl/wgt/affine + points tile.

    ctrl_ref: (1, Tp, 128) f32 — control points, dim k in lane-column k.
    wgt_ref:  (1, 8, Tp)  f32 — spline weights transposed, row k = out dim k.
    aff_ref:  (1, 8, 8)   f32 — affine transposed: column j in 0..2 scales
              point dim j, column 3 is the constant term.
    pts_ref (spatial=None only): (1, 8, NT) f32 — points tile transposed,
              row k = dim k, rows 3..7 sublane padding.
    out_ref:  (1, 8, NT)  f32 — rows 0..2 the moved coordinates.

    With ``spatial`` = (D, H, W), the query points are the IDENTITY grid
    (`coords.uniform_norm_grid`: inclusive-endpoint linspace per axis, `ij`
    order) generated IN-KERNEL from the flat tile index — the planes-native
    serving path (`tps_planes`) has no (N, 3) points input at all, and no
    minor-dim-3 transposes anywhere.
    """
    if spatial is None:
        pts_ref, out_ref = refs
        pts = pts_ref[0]  # (8, NT)
    else:
        (out_ref,) = refs
        D, H, W = spatial
        t = pl.program_id(1)
        n = t * NT + jax.lax.broadcasted_iota(jnp.int32, (1, NT), 1)
        rows = []
        for idx, S in (((n // (H * W)), D), ((n // W) % H, H), (n % W, W)):
            step = jnp.float32(2.0 / (S - 1)) if S > 1 else jnp.float32(0.0)
            rows.append(idx.astype(jnp.float32) * step - 1.0)
        pts = jnp.concatenate(rows + [jnp.zeros((5, NT), jnp.float32)], axis=0)
    ctrl = ctrl_ref[0]  # (Tp, 128)

    # squared distances: sum_k (ctrl[t, k] - pts[k, n])^2  -> (Tp, NT)
    sq = jnp.zeros((Tp, NT), jnp.float32)
    for k in range(3):
        diff = ctrl[:, k : k + 1] - pts[k : k + 1, :]  # (Tp, NT) broadcast
        sq = sq + diff * diff
    # same op order as solvers.tps_pairwise_dist/tps_rbf
    r = jnp.sqrt(sq + _EPS_DIST)
    U = r * r * jnp.log(r + _EPS_LOG)  # (Tp, NT)

    # RBF contraction on the MXU. Mosaic lowers an f32 matmul single-pass
    # (bf16 multiplies — 0.12 relative error measured on the flow), so run
    # the bf16 hi/lo decompositions stacked on both output dims (the warp
    # kernel's trick, resample3d.py): the four (8, NT) blocks of
    # [wh|wl] x [Uh|Ul] sum to the ~16-bit-mantissa product.
    wgt = wgt_ref[0]  # (8, Tp) f32
    wh = wgt.astype(jnp.bfloat16)
    wl = (wgt - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    Uh = U.astype(jnp.bfloat16)
    Ul = (U - Uh.astype(jnp.float32)).astype(jnp.bfloat16)
    q = jax.lax.dot_general(
        jnp.concatenate([wh, wl], axis=0),  # (16, Tp)
        jnp.concatenate([Uh, Ul], axis=1),  # (Tp, 2*NT)
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, 2*NT)
    b = q[:8, :NT] + q[:8, NT:] + q[8:, :NT] + q[8:, NT:]

    # Affine part in exact fp32 on the VPU: (8,1) x (1,NT) broadcasts —
    # coordinates must not round to bf16 (0.4% position error otherwise).
    aff = aff_ref[0]  # (8, 8)
    z = jnp.broadcast_to(aff[:, 3:4], (8, NT))  # constant term
    for j in range(3):
        z = z + aff[:, j : j + 1] * pts[j : j + 1, :]
    out_ref[0] = b + z


def _tps_flow_pallas(ctrl_cols, wgt_t, aff_t, pts_t=None, *, N=None,
                     interpret, spatial=None):
    """pts_t: (B, 8, N) padded/augmented points, or None with ``spatial``
    set (identity-grid points generated in-kernel). Returns (B, 8, N) f32."""
    B = ctrl_cols.shape[0]
    if pts_t is not None:
        N = pts_t.shape[2]
    Tp = ctrl_cols.shape[1]
    grid = (B, N // _NT)
    in_specs = [
        pl.BlockSpec((1, Tp, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, Tp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [ctrl_cols, wgt_t, aff_t]
    if pts_t is not None:
        in_specs.append(
            pl.BlockSpec((1, 8, _NT), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM)
        )
        args.append(pts_t)
    return pl.pallas_call(
        functools.partial(_kernel, Tp=Tp, NT=_NT, spatial=spatial),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, _NT), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, N), jnp.float32),
        interpret=interpret,
    )(*args)


def _backend_ok() -> bool:
    """Mosaic lowering exists only for TPU; CPU runs the kernel in
    interpret mode (tests). Any other backend (GPU included) must take
    the XLA path — same allowlist rule as resample3d.fast_warp_enabled."""
    return jax.default_backend() in ("tpu", "cpu")


def tps_flow_eligible(points) -> bool:
    """Static eligibility for the fused kernel (shape + backend)."""
    if os.environ.get("KM_NO_FAST_TPS"):
        return False
    if not _backend_ok():
        return False
    B, N, d = points.shape
    return d == 3 and N % _NT == 0


def _xla_eval(theta, ctrl, points):
    from keymorph_tpu.transforms import solvers

    return solvers.tps_eval(theta, ctrl, points)


def _pack_params(theta, ctrl, d):
    """theta/ctrl -> the kernel's (ctrl_cols, wgt_t, aff_t) operands."""
    B, T = ctrl.shape[:2]
    Tp = _round_up(T, 128)
    wgt = theta[:, : -(d + 1), :].astype(jnp.float32)  # (B, T, 3)
    affine = theta[:, -(d + 1) :, :].astype(jnp.float32)  # (B, 4, 3)
    ctrl = ctrl.astype(jnp.float32)

    # ctrl_cols: (B, Tp, 128), dim k in lane-column k; padded rows sit at
    # the origin but their weight columns are zero so they cancel exactly.
    ctrl_cols = jnp.zeros((B, Tp, 128), jnp.float32)
    ctrl_cols = ctrl_cols.at[:, :T, :3].set(ctrl)

    # wgt_t: (B, 8, Tp), row k = output dim k of the spline weights.
    wgt_t = jnp.zeros((B, 8, Tp), jnp.float32)
    wgt_t = wgt_t.at[:, :3, :T].set(jnp.swapaxes(wgt, 1, 2))

    # aff_t: (B, 8, 8). Row k contracts points-block lane j: j in 0..2 the
    # point dims (affine[:, 1:]), j == 3 the constant row (affine[:, 0]).
    aff_t = jnp.zeros((B, 8, 8), jnp.float32)
    aff_t = aff_t.at[:, :3, :3].set(jnp.swapaxes(affine[:, 1:], 1, 2))
    aff_t = aff_t.at[:, :3, 3].set(jnp.swapaxes(affine[:, :1], 1, 2)[..., 0])
    return ctrl_cols, wgt_t, aff_t


@jax.custom_vjp
def _tps_flow(theta, ctrl, points):
    B, N, d = points.shape
    ctrl_cols, wgt_t, aff_t = _pack_params(theta, ctrl, d)

    # pts_t: (B, 8, N) — rows 0..2 the coords, rows 3..7 sublane padding
    # (one pad op; the affine constant term is a broadcast in-kernel).
    pts_t = jnp.pad(
        jnp.swapaxes(points.astype(jnp.float32), 1, 2), ((0, 0), (0, 5), (0, 0))
    )

    interpret = jax.default_backend() == "cpu"
    out = _tps_flow_pallas(ctrl_cols, wgt_t, aff_t, pts_t, interpret=interpret)
    return jnp.swapaxes(out[:, :3], 1, 2)  # (B, N, 3)


def _tps_flow_fwd(theta, ctrl, points):
    return _tps_flow(theta, ctrl, points), (theta, ctrl, points)


def _tps_flow_bwd(res, g):
    theta, ctrl, points = res
    _, vjp = jax.vjp(_xla_eval, theta, ctrl, points)
    return vjp(g)


_tps_flow.defvjp(_tps_flow_fwd, _tps_flow_bwd)


def tps_flow(theta, ctrl, points):
    """Fused dense TPS evaluation; same contract as `solvers.tps_eval`."""
    return _tps_flow(theta, ctrl, points)


def _xla_planes(theta, ctrl, spatial):
    from keymorph_tpu.ops import coords

    B = theta.shape[0]
    n = 1
    for s in spatial:
        n *= int(s)
    pts = jnp.broadcast_to(coords.flat_norm_grid(spatial), (B, n, 3))
    moved = _xla_eval(theta, ctrl, pts)  # (B, N, 3)
    return jnp.moveaxis(moved, -1, 1).reshape(B, 3, *spatial)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tps_planes(theta, ctrl, spatial):
    B = theta.shape[0]
    D, H, W = (int(s) for s in spatial)
    N = D * H * W
    if os.environ.get("KM_NO_FAST_TPS") or N % _NT != 0 or not _backend_ok():
        return _xla_planes(theta, ctrl, spatial)
    ctrl_cols, wgt_t, aff_t = _pack_params(theta, ctrl, 3)
    interpret = jax.default_backend() == "cpu"
    out = _tps_flow_pallas(
        ctrl_cols, wgt_t, aff_t, None, N=N, interpret=interpret,
        spatial=(D, H, W),
    )  # (B, 8, N)
    return out[:, :3].reshape(B, 3, D, H, W)


def _tps_planes_fwd(theta, ctrl, spatial):
    return _tps_planes(theta, ctrl, spatial), (theta, ctrl)


def _bwd_kernel(ctrl_ref, wgt_ref, g_ref, out_ref, *, Tp, NT, spatial):
    """One (b, tile) cell of the planes backward: partial contractions of
    the cotangent tile g (8, NT) against the RECOMPUTED RBF block — U never
    touches HBM in the backward either (the whole point; the XLA VJP would
    re-materialize the (T, N) matrix: 4.3 GB at 256^3 with T=64).

    out (16, Tp):
      rows 0..7  = g @ U^T          (rows 0..2 useful -> spline-weight grad)
      rows 8..15 = pts_aug @ m^T    (m = (wgt^T @ g) * dU/dsq; rows 0..2 =
                   sum_n m*pts_j, row 3 = sum_n m -> control-point grad)
    pts_aug rows: 0..2 the identity-grid coords (generated in-kernel like
    the forward), row 3 ones, rows 4..7 zero.
    """
    D, H, W = spatial
    t = pl.program_id(1)
    n = t * NT + jax.lax.broadcasted_iota(jnp.int32, (1, NT), 1)
    rows = []
    for idx, S in (((n // (H * W)), D), ((n // W) % H, H), (n % W, W)):
        step = jnp.float32(2.0 / (S - 1)) if S > 1 else jnp.float32(0.0)
        rows.append(idx.astype(jnp.float32) * step - 1.0)
    pts_aug = jnp.concatenate(
        rows + [jnp.ones((1, NT), jnp.float32), jnp.zeros((4, NT), jnp.float32)],
        axis=0,
    )  # (8, NT)
    ctrl = ctrl_ref[0]  # (Tp, 128)

    sq = jnp.zeros((Tp, NT), jnp.float32)
    for k in range(3):
        diff = ctrl[:, k : k + 1] - pts_aug[k : k + 1, :]
        sq = sq + diff * diff
    r = jnp.sqrt(sq + _EPS_DIST)
    U = r * r * jnp.log(r + _EPS_LOG)
    # d U / d sq, from U = r^2 log(r+eps), r = sqrt(sq + eps_d):
    dUdsq = jnp.log(r + _EPS_LOG) + r / (2.0 * (r + _EPS_LOG))

    g = g_ref[0]  # (8, NT) f32, rows 0..2 the flow cotangent

    def _mm_hilo(lhs, rhs_t):
        """Exact-ish f32 matmul lhs (8, NT) x rhs_t (Tp, NT)^T -> (8, Tp):
        bf16 hi/lo stacked on both output dims (Mosaic lowers f32
        dot_general as a single bf16 pass)."""
        lh = lhs.astype(jnp.bfloat16)
        ll = (lhs - lh.astype(jnp.float32)).astype(jnp.bfloat16)
        rh = rhs_t.astype(jnp.bfloat16)
        rl = (rhs_t - rh.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jax.lax.dot_general(
            jnp.concatenate([lh, ll], axis=0),  # (16, NT)
            jnp.concatenate([rh, rl], axis=0),  # (2Tp, NT)
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, 2Tp)
        return q[:8, :Tp] + q[:8, Tp:] + q[8:, :Tp] + q[8:, Tp:]

    gU = _mm_hilo(g, U)  # (8, Tp)

    # s = wgt^T @ g -> (Tp, NT); K=8 contraction, wgt rows 0..2 nonzero
    wgt = wgt_ref[0]  # (8, Tp)
    wh = wgt.astype(jnp.bfloat16)
    wl = (wgt - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    gh = g.astype(jnp.bfloat16)
    gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
    qs = jax.lax.dot_general(
        jnp.concatenate([wh, wl], axis=1),  # (8, 2Tp)
        jnp.concatenate([gh, gl], axis=1),  # (8, 2NT)
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2Tp, 2NT)
    s = qs[:Tp, :NT] + qs[:Tp, NT:] + qs[Tp:, :NT] + qs[Tp:, NT:]
    m = s * dUdsq  # (Tp, NT)

    pm = _mm_hilo(pts_aug, m)  # (8, Tp)
    out_ref[0, 0] = jnp.concatenate([gU, pm], axis=0)  # (16, Tp)


def _tps_planes_bwd_pallas(theta, ctrl, spatial, g):
    """Assemble (g_theta, g_ctrl) from the per-tile kernel partials plus
    cheap XLA reductions for the affine rows (pure reads of g — no U)."""
    B, M, d = theta.shape
    T = ctrl.shape[1]
    Tp = _round_up(T, 128)
    D, H, W = spatial
    N = D * H * W
    nt = N // _NT

    ctrl_cols, wgt_t, _ = _pack_params(theta, ctrl, d)
    # cotangent plane-major (B, 3, D, H, W) -> padded (B, 8, N)
    g8 = jnp.pad(g.reshape(B, 3, N).astype(jnp.float32), ((0, 0), (0, 5), (0, 0)))

    interpret = jax.default_backend() == "cpu"
    parts = pl.pallas_call(
        functools.partial(_bwd_kernel, Tp=Tp, NT=_NT, spatial=(D, H, W)),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, Tp, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Tp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _NT), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 16, Tp), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nt, 16, Tp), jnp.float32),
        interpret=interpret,
    )(ctrl_cols, wgt_t, g8)

    acc = jnp.sum(parts, axis=1)  # (B, 16, Tp)
    g_wgt = jnp.swapaxes(acc[:, :3, :T], 1, 2)  # (B, T, 3)
    msum = acc[:, 8 + 3, :T]  # (B, T): sum_n m[t, n]
    mpts = acc[:, 8 : 8 + 3, :T]  # (B, 3, T): sum_n m*pts_j
    g_ctrl = 2.0 * (
        ctrl.astype(jnp.float32) * msum[..., None]
        - jnp.swapaxes(mpts, 1, 2)
    )  # (B, T, 3)

    # affine rows: plain reductions of g against the separable identity
    # grid — XLA fuses these into one pass over g (no U involvement)
    from keymorph_tpu.ops import coords

    gflat = g.reshape(B, 3, N).astype(jnp.float32)
    pts = coords.flat_norm_grid(spatial).astype(jnp.float32).reshape(N, 3)
    g_const = jnp.sum(gflat, axis=-1)  # (B, 3)
    g_lin = jnp.einsum("bkn,nj->bjk", gflat, pts, precision="highest")
    g_theta = jnp.concatenate(
        [g_wgt, g_const[:, None, :], g_lin], axis=1
    )  # (B, T+4, 3)
    return g_theta.astype(theta.dtype), g_ctrl.astype(ctrl.dtype)


def _tps_planes_bwd(spatial, res, g):
    theta, ctrl = res
    D, H, W = (int(s) for s in spatial)
    N = D * H * W
    if os.environ.get("KM_NO_FAST_TPS") or N % _NT != 0 or not _backend_ok():
        _, vjp = jax.vjp(lambda th, c: _xla_planes(th, c, spatial), theta, ctrl)
        return vjp(g)
    return _tps_planes_bwd_pallas(theta, ctrl, (D, H, W), g)


_tps_planes.defvjp(_tps_planes_fwd, _tps_planes_bwd)


def tps_planes(theta, ctrl, spatial):
    """`ij`-ordered flow PLANES of a fitted TPS at the identity grid.

    The planes-native serving path: equals
    ``moveaxis(tps_eval(theta, ctrl, flat_norm_grid(spatial)), -1, 1)``
    reshaped to (B, 3, D, H, W) — i.e. exactly what `ops.resample`'s
    ``warp_planes`` consumes — but the identity grid is generated inside
    the kernel from the flat index and the output is emitted plane-major,
    so neither the (N, 3) points tensor nor any minor-dim-3 transpose ever
    touches HBM. Reference semantics anchor: keypoint_aligners.py:365-433
    + the grid orientation of model.py:264-288 (the xy flip happens in the
    grid contract, not here).
    """
    return _tps_planes(theta, ctrl, tuple(int(s) for s in spatial))
