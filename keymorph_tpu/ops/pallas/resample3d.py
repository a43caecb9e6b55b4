"""Gather-free trilinear 3D warp (Pallas TPU): the resampler-wall breaker.

XLA's TPU ``gather`` runs at a flat ~116M elements/s, so the 8-corner
formulation of ``grid_sample`` (reference keymorph/utils.py:14-21) costs
``8 * N_voxels / 116M`` seconds — 145 ms at 128^3, ~1.16 s at 256^3, 67-85%
of every registration (PERF.md "the resampler wall"). This kernel removes
the gather entirely:

  * The output volume is tiled into (BZ, BY, BX) blocks.
  * Each kernel cell reads its flow block, takes the exact min/max of the
    sample coordinates, and DMAs the bounded source band
    ``src[z0:z0+DZ, y0:y0+YW, x0:x0+XW]`` into VMEM with *dynamic starts*.
  * Trilinear interpolation becomes dense linear algebra on the band:

        out[b]   = sum_r  OH[b, r] * band[r, x] * hat_x[b, x]
        OH[b, r] = hat(rz(r) - zl_b) * hat(ry(r) - yl_b)     (4 nonzeros)

    i.e. one (B_tile, DZ*YW) @ (DZ*YW, XW) matmul on the MXU plus a VPU
    row-reduction — no indexed loads anywhere.

Exactness contract: a cheap exact XLA prepass computes every tile's
coordinate span once; ``lax.cond`` then picks the SMALLEST window config of
``_WIN_LADDER`` that holds, and falls back to the XLA gather path if none
does (high-frequency or non-smooth flows). Every per-cell cost scales with
the band rows R = DZ*YW, so the ladder is a direct perf lever: a measured
lambda=1 TPS registration flow spans only (6, 15, 29) per (4, 8, 32) tile
and runs the (8, 24, 32) config, while a 128-keypoint TPS at lambda=0 with
15 deg rotation + 15% scale spans up to (16, 21, 43) and needs the full
(16, 40, 64).

Semantics match ``ops.resample.grid_sample`` (torch ``grid_sample`` with
padding_mode="border", align_corners=False) for mode in {bilinear, nearest};
parity is tested against the torch-bit-parity XLA path.

Autodiff: ``warp_planes`` carries a custom VJP. The planes (flow) gradient —
the only branch a training step keeps (images/segs are data, their cotangent
path never reaches the params and is pruned) — runs a gather-free Pallas
kernel of the same band-DMA shape as the forward: the trilinear corner
DIFFERENCES are two extra rhs parts through the same band matmul
(``oh``, ``dohz``, ``dohy``, contracted sequentially to bound scoped VMEM),
so grad-wrt-flow costs ~3x the forward
matmul instead of eight 116M-elem/s XLA gathers (measured 145 ms of a 406 ms
training step at 128^3 before this kernel). The image gradient (and every
ineligible/wild-flow case) keeps the XLA path's VJP.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output tile and source-band windows. Windows were sized from measured
# per-tile spans of dense TPS flows (see module docstring); they must
# satisfy span <= window for the kernel to be exact, which the prepass
# verifies per call.
_TILE = (4, 8, 32)  # (BZ, BY, BX) output voxels per kernel cell
# (DZ, YW, XW) source band per cell. YW includes 8 rows of slack: the band's
# y start must be sublane-aligned (large HBM memrefs are (8, 128)-tiled and
# DMA offsets must respect the tiling), so y0 is rounded down to 8.
_WIN = (16, 40, 64)
# Adaptive window ladder, smallest first. Every per-cell cost — band DMA
# bytes, hat-weight VPU math, and the trilerp matmul — scales with
# R = DZ*YW, so smooth flows (the common registration case: measured bench
# TPS flow spans (6, 15, 29) per (4, 8, 32) tile) should run a ~3x smaller
# kernel. The exactness prepass computes the actual spans once per call and
# lax.cond picks the smallest window config that holds; wild flows keep the
# big windows, and anything beyond them still falls back to the XLA gather.
_WIN_LADDER = ((8, 24, 64), _WIN)
# The small rung keeps XW=64: the x window never enters the band DMA (whole
# lane rows are copied; x is selected in VMEM by a roll), and a matmul with
# M <= 128 costs the same MXU cycles at M=32 or 64 — hi/lo stacking at
# M=2*XW=128 fills the array exactly — so a narrower XW would buy nothing
# and lose x-span robustness.

# Group band window (GDZ, GYW): when the UNION span of a whole kernel cell
# (_GROUP consecutive x-tiles — a full x-row at 256^3) fits these windows,
# the cell issues ONE band DMA covering all 8 sub-tiles instead of 8
# per-sub-tile DMAs (each sub-tile then slices its (DZ, YW) window out of
# the group band in VMEM). The warp ablation measured the per-sub-tile DMAs
# at 14.9 of 40.7 ms (256^3 small rung, fp32) — mostly issue/latency, so 8x
# fewer, larger copies is the direct fix. Smooth serving flows fit (bench
# TPS flow union ~(15-25, 18)); rotation-heavy flows exceed it (14 deg
# rotation drifts z by ~62 voxels across a 256-voxel x-row) and take the
# per-sub-tile rungs via the prepass. KM_NO_WARP_GROUP=1 kills the path.
_GROUP_WIN = (32, 40)


def _tile_config():
    """(tile, window ladder), overridable via KM_WARP_TILES=
    "BZ,BY,BX,DZ,YW,XW" (read at trace time; tools/warp_tile_sweep.py uses
    this — a forced config disables the ladder). The prepass still guards
    exactness per call, so a mis-sized override can only cause XLA
    fallbacks, never wrong results."""
    forced = os.environ.get("KM_WARP_TILES")
    if forced:
        v = [int(t) for t in forced.split(",")]
        assert len(v) == 6 and v[4] % 8 == 0, v
        return (v[0], v[1], v[2]), ((v[3], v[4], v[5]),)
    return _TILE, _WIN_LADDER


_GROUP = 8  # sub-tiles per kernel cell (fills the output block's sublane dim)


def _kernel(*refs, src_spatial,
            pad_spatial, windows, channels, nearest, bf16_mm=False,
            group_windows=None):
    """One cell = _GROUP output tiles: band DMAs + one-hot-matmul trilerp.

    Layout note: every in-kernel array keeps voxels in LANES and small
    structured dims (coords / band rows) in sublanes. Lane-minor (.., 3)
    arrays would be tile-padded 3 -> 128 in HBM (8.6 GB at 256^3), and
    voxel-major layouts would need sublane<->lane relayouts — this
    transposed formulation needs neither.

    planes_ref: (1, 3*_GROUP, B) — rows 3s..3s+2 are the (z, y, x) normalized
                coords of sub-tile s, voxels in lanes.
    src_ref:    (C, Z, Yp, Xp) in HBM — banded dynamic-start DMA only.
    out_ref:    (1, _GROUP, C*B) — sub-tile s in sublane s, channel c in
                lanes [c*B, (c+1)*B).
    band:       (2, C, DZ, YW, Xp) double buffer: sub-tile s+1's DMA runs
                while s computes.
    """
    # KM_WARP_ABLATE (perf attribution only; most modes give WRONG results):
    #   nodma  - skip the band DMAs          nooh  - constant trilerp weights
    #   noroll - skip the x-window roll      nomm  - skip roll+matmul
    #   fatoh  - full (R, B) hat build (correct; the pre-round-3 default)
    if group_windows is not None:
        # group mode carries the per-cell union starts as a scalar-prefetch
        # operand so cell t can DMA cell t+1's band (cross-cell double
        # buffering — the starts depend on the NEXT cell's planes block,
        # which is not resident; the XLA prepass computes them all once)
        starts_ref, planes_ref, src_ref, out_ref, band, sem = refs
    else:
        planes_ref, src_ref, out_ref, band, sem = refs
    ablate = os.environ.get("KM_WARP_ABLATE", "")
    Z, Y, X = src_spatial  # true dims: coordinate math and border clamping
    _, Yp, Xp = pad_spatial  # HBM memref dims (lane/sublane aligned)
    DZ, YW, XW = windows
    R = DZ * YW
    B = planes_ref.shape[2]

    p = planes_ref[0].astype(jnp.float32)  # (3*_GROUP, B), ij-ordered
    # unnormalize (align_corners=False) + border clamp, all sub-tiles at once
    # (sizes built from iota: pallas kernels cannot capture constant arrays)
    axis = jax.lax.broadcasted_iota(jnp.int32, (3 * _GROUP, 1), 0) % 3
    sizes = jnp.where(
        axis == 0, jnp.float32(Z), jnp.where(axis == 1, jnp.float32(Y), jnp.float32(X))
    )
    v = jnp.clip(((p + 1.0) * sizes - 1.0) * 0.5, 0.0, sizes - 1.0)
    if nearest:
        # torch nearest rounds the coordinate half-to-even; integral coords
        # then hit a single one-hot lane below (frac == 0).
        v = jnp.round(v)

    def starts(s):
        vz = v[3 * s : 3 * s + 1]  # (1, B)
        vy = v[3 * s + 1 : 3 * s + 2]
        vx = v[3 * s + 2 : 3 * s + 3]
        z0 = jnp.clip(jnp.floor(jnp.min(vz)).astype(jnp.int32), 0, max(Z - DZ, 0))
        # y start sublane-aligned (Yp % 8 == 0 keeps the upper clamp aligned)
        y0 = jnp.clip(
            (jnp.floor(jnp.min(vy)).astype(jnp.int32) // 8) * 8,
            0,
            max(Yp - YW, 0),
        )
        y0 = pl.multiple_of(y0, 8)
        x0 = jnp.clip(jnp.floor(jnp.min(vx)).astype(jnp.int32), 0, max(Xp - XW, 0))
        return vz, vy, vx, z0, y0, x0

    def dma(s, slot, z0, y0):
        # slices z (untiled) and y (sublane dim, start kept 8-aligned)
        # dynamically; the lane dim X must come whole (HBM memrefs are
        # lane-tiled and DMA slices along lanes must be tile-aligned) —
        # x is windowed in VMEM with a dynamic lane rotate instead.
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(z0, DZ), pl.ds(y0, YW), :],
            band.at[slot],
            sem.at[slot],
        )

    st = [starts(s) for s in range(_GROUP)]

    if group_windows is not None:
        # ONE band DMA for the whole cell: the prefetched union starts cover
        # all 8 sub-tiles (the prepass guaranteed the union span fits
        # (GDZ, GYW)); each sub-tile below slices its own (DZ, YW) window
        # out of the group band in VMEM. Kills the per-sub-tile DMA
        # issue/latency wall, and cell t+1's band streams in while t
        # computes (double-buffered on the cell axis).
        GDZ, GYW = group_windows
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def gdma(cell, gs):
            zc = starts_ref[0, cell]
            yc = pl.multiple_of(starts_ref[1, cell], 8)
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(zc, GDZ), pl.ds(yc, GYW), :],
                band.at[gs],
                sem.at[gs],
            )

        if ablate != "nodma":
            @pl.when(t == 0)
            def _():
                gdma(0, 0).start()

            @pl.when(t + 1 < n_t)
            def _():
                gdma(t + 1, (t + 1) % 2).start()

            gdma(t, t % 2).wait()
        z0g = starts_ref[0, t]
        y0g = pl.multiple_of(starts_ref[1, t], 8)
        gslot = t % 2
    elif ablate != "nodma":
        dma(0, 0, st[0][3], st[0][4]).start()

    r = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    rz = (r // YW).astype(jnp.float32)
    ry = (r % YW).astype(jnp.float32)
    cxi = jax.lax.broadcasted_iota(jnp.int32, (XW, 1), 0).astype(jnp.float32)

    for s in range(_GROUP):
        vz, vy, vx, z0, y0, x0 = st[s]
        slot = s % 2
        if group_windows is not None:
            # clamp the sub-tile window inside the group band. The upper
            # clamp can only LOWER z0/y0 below floor(min) — coverage of the
            # top then follows from the group window covering the union
            # span (prepass-guaranteed), so exactness holds either way.
            GDZ, GYW = group_windows
            z0 = jnp.clip(z0, z0g, z0g + max(GDZ - DZ, 0))
            y0 = pl.multiple_of(
                jnp.clip(y0, y0g, y0g + max(GYW - YW, 0)), 8
            )
            slot = gslot
        elif ablate != "nodma" and s + 1 < _GROUP:
            dma(s + 1, (s + 1) % 2, st[s + 1][3], st[s + 1][4]).start()

        zl = vz - z0.astype(jnp.float32)  # (1, B)
        yl = vy - y0.astype(jnp.float32)
        xl = vx - x0.astype(jnp.float32)
        # hat(t) = max(0, 1 - |t|): exactly the two trilinear corner weights.
        # Default is the SEPARABLE build (device-measured 6.4 ms faster at
        # 256^3 small rung than hat math at (R, B)): hats on the two small
        # axes (DZ+YW rows), then an outer-product expansion — O(DZ*B+YW*B)
        # transcendental-free VPU math plus two relayout copies and one
        # multiply at (R, B). `fatoh` ablates back to the full (R, B) build.
        if ablate == "nooh":
            oh = jnp.full((R, B), 0.25, jnp.float32) + zl
        elif ablate == "fatoh":
            oh = jnp.maximum(0.0, 1.0 - jnp.abs(rz - zl)) * jnp.maximum(
                0.0, 1.0 - jnp.abs(ry - yl)
            )  # (R, B)
        else:
            zi = jax.lax.broadcasted_iota(jnp.int32, (DZ, 1), 0).astype(jnp.float32)
            yi = jax.lax.broadcasted_iota(jnp.int32, (YW, 1), 0).astype(jnp.float32)
            hz = jnp.maximum(0.0, 1.0 - jnp.abs(zi - zl))  # (DZ, B)
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(yi - yl))  # (YW, B)
            oh = jnp.repeat(hz, YW, axis=0) * jnp.tile(hy, (DZ, 1))  # (R, B)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(cxi - xl))  # (XW, B)

        if group_windows is None and ablate != "nodma":
            dma(s, slot, z0, y0).wait()
        if ablate == "nomm":
            for c in range(channels):
                out_ref[0, s : s + 1, c * B : (c + 1) * B] = jnp.sum(
                    hx, axis=0, keepdims=True
                ) + jnp.sum(oh, axis=0, keepdims=True)
            continue

        # window each channel's band rows (x-selection by lane roll), then
        # stack channels along the matmul M dim: ONE MXU dispatch per
        # sub-tile regardless of channel count (one-hot seg warps carry
        # C = 5-50; a per-channel matmul loop was C dispatches)
        bands = []
        for c in range(channels):
            if group_windows is not None:
                band2 = band[
                    slot, c, pl.ds(z0 - z0g, DZ),
                    pl.ds(pl.multiple_of(y0 - y0g, 8), YW), :,
                ].reshape(R, Xp)
            else:
                band2 = band[slot, c].reshape(R, Xp)
            if ablate == "noroll":
                band2 = band2[:, :XW]
            elif XW < Xp:
                # Mosaic's dynamic_rotate is 32-bit only (bf16 crashes the
                # server-side compile: "Rotate with non-32-bit data"), so
                # the bf16 band rolls through f32 — the DMA stays halved,
                # which is the bf16 mode's point.
                if band2.dtype != jnp.float32:
                    band2 = pltpu.roll(
                        band2.astype(jnp.float32), -x0, 1
                    )[:, :XW].astype(band2.dtype)
                else:
                    band2 = pltpu.roll(band2, -x0, 1)[:, :XW]
            bands.append(band2)
        bandC = bands[0] if channels == 1 else jnp.concatenate(bands, axis=1)

        # contract band rows against one-hot rows:
        # (R, C*XW) x (R, B) -> (C*XW, B).
        # Precision: ONE bf16 matmul of the hi/lo decompositions stacked
        # on both output dims — lhs [bh|bl] (R, 2*C*XW), rhs [ohh|ohl]
        # (R, 2B) — whose four (C*XW, B) blocks sum to the exact product
        # (b.o = (bh+bl)(ohh+ohl), each bf16 x bf16 product exact in the
        # fp32 accumulator). vs the original 6-pass HIGHEST: one dispatch
        # instead of 6, M >= 2XW fills the MXU's 128 sublanes, and 4/6 of
        # the FLOPs. KM_WARP_BF16=1 runs one single-width pass (band +
        # weights rounded to bf16, fp32 accumulate): ~2x further, ~1e-3
        # relative error.
        CXW = channels * XW

        def _mm(a, b):
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if bf16_mm:
            tmp_all = _mm(bandC, oh.astype(jnp.bfloat16))  # (C*XW, B)
        else:
            bf = bandC.astype(jnp.float32)
            bh = bf.astype(jnp.bfloat16)
            bl = (bf - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            ohh = oh.astype(jnp.bfloat16)
            ohl = (oh - ohh.astype(jnp.float32)).astype(jnp.bfloat16)
            q = _mm(
                jnp.concatenate([bh, bl], axis=1),
                jnp.concatenate([ohh, ohl], axis=1),
            )  # (2*C*XW, 2B)
            tmp_all = (
                q[:CXW, :B] + q[:CXW, B:] + q[CXW:, :B] + q[CXW:, B:]
            )
        for c in range(channels):
            tmp = tmp_all[c * XW : (c + 1) * XW]
            o = jnp.sum(tmp * hx, axis=0, keepdims=True)  # (1, B)
            out_ref[0, s : s + 1, c * B : (c + 1) * B] = o


def _tile_planes(planes, tile):
    """(3, D, H, W) -> (T//_GROUP, 3*_GROUP, B): voxels in lanes."""
    BZ, BY, BX = tile
    D, H, W = (int(s) for s in planes.shape[1:])
    B = BZ * BY * BX
    p = planes.reshape(3, D // BZ, BZ, H // BY, BY, W // BX, BX)
    p = jnp.transpose(p, (1, 3, 5, 0, 2, 4, 6))  # (tz, ty, tx, 3, BZ, BY, BX)
    return p.reshape(-1, 3 * _GROUP, B)


def _untile_output(out_tiled, out_spatial, tile, channels):
    """(T//_GROUP, _GROUP, C*B) -> (C, D, H, W)."""
    BZ, BY, BX = tile
    D, H, W = out_spatial
    o = out_tiled.reshape(
        D // BZ, H // BY, W // BX, channels, BZ, BY, BX
    )
    o = jnp.transpose(o, (3, 0, 4, 1, 5, 2, 6))
    return o.reshape(channels, D, H, W)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _tile_output(x, tile):
    """(C, D, H, W) -> (T//_GROUP, _GROUP, C*B): inverse of _untile_output.
    Used to tile the output-cotangent g for the backward kernel."""
    BZ, BY, BX = tile
    C, D, H, W = (int(s) for s in x.shape)
    o = x.reshape(C, D // BZ, BZ, H // BY, BY, W // BX, BX)
    o = jnp.transpose(o, (1, 3, 5, 0, 2, 4, 6))  # (tz, ty, tx, C, BZ, BY, BX)
    return o.reshape(-1, _GROUP, C * BZ * BY * BX)


def _untile_planes(pt, out_spatial, tile):
    """(T//_GROUP, 3*_GROUP, B) -> (3, D, H, W): inverse of _tile_planes.
    Used to untile the planes-cotangent the backward kernel emits."""
    BZ, BY, BX = tile
    D, H, W = out_spatial
    p = pt.reshape(D // BZ, H // BY, W // BX, 3, BZ, BY, BX)
    p = jnp.transpose(p, (3, 0, 4, 1, 5, 2, 6))
    return p.reshape(3, D, H, W)


def _grad_kernel(planes_ref, g_ref, src_ref, out_ref, band, sem, *,
                 src_spatial, pad_spatial, windows, channels, bf16_mm=False):
    """Backward (grad-wrt-planes) cell: same band DMAs as the forward, the
    trilinear corner DIFFERENCES stacked into the one matmul.

    The XLA formulation's exact planes-gradient (ops/planes.py:94-106, with
    floor's zero gradient) is, per axis a:
        d out[c]/d v_a = sum over the other axes' corner weights of
                         (img[corner_a = lo_a+1, clipped] - img[corner_a = lo_a])
    i.e. the forward's hat vector on axis a replaced by a +-1 corner-
    difference vector dh_a[k] = 1{k == min(lo_a+1, S_a-1-start)} - 1{k == lo_a}
    (the clip collapses the two corners at the true top edge -> exact zero,
    matching XLA). The contraction reuses the forward's band matmul, run
    once per rhs part (oh, dohz, dohy); the x-axis difference is the forward
    matmul output contracted against dhx instead of hx. The chain through
    clip+unnormalize (scale S_a/2, border mask with 0.5 at exact-tie clamps)
    is applied by the caller in XLA — it is elementwise on the planes.

    planes_ref: (1, 3*_GROUP, B) as the forward.
    g_ref:      (1, _GROUP, C*B) fp32 — output cotangent, forward-out tiling.
    out_ref:    (1, 3*_GROUP, B) fp32 — grad wrt the CLAMPED VOXEL coords v,
                rows 3s..3s+2 = (z, y, x) of sub-tile s (planes tiling).
    """
    Z, Y, X = src_spatial
    _, Yp, Xp = pad_spatial
    DZ, YW, XW = windows
    R = DZ * YW
    B = planes_ref.shape[2]

    p = planes_ref[0].astype(jnp.float32)
    axis = jax.lax.broadcasted_iota(jnp.int32, (3 * _GROUP, 1), 0) % 3
    sizes = jnp.where(
        axis == 0, jnp.float32(Z), jnp.where(axis == 1, jnp.float32(Y), jnp.float32(X))
    )
    v = jnp.clip(((p + 1.0) * sizes - 1.0) * 0.5, 0.0, sizes - 1.0)

    def starts(s):
        vz = v[3 * s : 3 * s + 1]
        vy = v[3 * s + 1 : 3 * s + 2]
        vx = v[3 * s + 2 : 3 * s + 3]
        z0 = jnp.clip(jnp.floor(jnp.min(vz)).astype(jnp.int32), 0, max(Z - DZ, 0))
        y0 = jnp.clip(
            (jnp.floor(jnp.min(vy)).astype(jnp.int32) // 8) * 8,
            0,
            max(Yp - YW, 0),
        )
        y0 = pl.multiple_of(y0, 8)
        x0 = jnp.clip(jnp.floor(jnp.min(vx)).astype(jnp.int32), 0, max(Xp - XW, 0))
        return vz, vy, vx, z0, y0, x0

    def dma(s, slot, z0, y0):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(z0, DZ), pl.ds(y0, YW), :],
            band.at[slot],
            sem.at[slot],
        )

    st = [starts(s) for s in range(_GROUP)]
    dma(0, 0, st[0][3], st[0][4]).start()

    zi = jax.lax.broadcasted_iota(jnp.int32, (DZ, 1), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (YW, 1), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (XW, 1), 0)
    zif = zi.astype(jnp.float32)
    yif = yi.astype(jnp.float32)
    xif = xi.astype(jnp.float32)

    for s in range(_GROUP):
        vz, vy, vx, z0, y0, x0 = st[s]
        slot = s % 2
        if s + 1 < _GROUP:
            dma(s + 1, (s + 1) % 2, st[s + 1][3], st[s + 1][4]).start()

        zl = vz - z0.astype(jnp.float32)  # (1, B)
        yl = vy - y0.astype(jnp.float32)
        xl = vx - x0.astype(jnp.float32)
        hz = jnp.maximum(0.0, 1.0 - jnp.abs(zif - zl))  # (DZ, B)
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(yif - yl))  # (YW, B)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(xif - xl))  # (XW, B)

        # corner-difference vectors: +1 at the (top-clipped) upper corner,
        # -1 at the lower; they collapse to zero at the true top edge
        def dh(iaxis, local, top):
            lo = jnp.floor(local).astype(jnp.int32)  # (1, B)
            c1 = jnp.minimum(lo + 1, top)
            return (
                (iaxis == c1).astype(jnp.float32)
                - (iaxis == lo).astype(jnp.float32)
            )

        dhz = dh(zi, zl, Z - 1 - z0)  # (DZ, B)
        dhy = dh(yi, yl, Y - 1 - y0)  # (YW, B)
        dhx = dh(xi, xl, X - 1 - x0)  # (XW, B)

        dma(s, slot, z0, y0).wait()
        bands = []
        for c in range(channels):
            band2 = band[slot, c].reshape(R, Xp)
            if XW < Xp:
                if band2.dtype != jnp.float32:
                    band2 = pltpu.roll(
                        band2.astype(jnp.float32), -x0, 1
                    )[:, :XW].astype(band2.dtype)
                else:
                    band2 = pltpu.roll(band2, -x0, 1)[:, :XW]
            bands.append(band2)
        bandC = bands[0] if channels == 1 else jnp.concatenate(bands, axis=1)
        CXW = channels * XW

        def _mm(a, b):
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # One matmul per rhs part, SEQUENTIALLY — a single concatenated
        # (R, 3B) rhs plus its hi/lo bf16 stacks keeps ~3x8 MB of transients
        # live at once and blows the 16 MiB scoped-VMEM limit (measured
        # 18.04M at 64^3/C=1 on device); per-part transients are B-wide and
        # die before the next part is built.
        if bf16_mm:
            lhs = bandC  # (R, C*XW) bf16
        else:
            bf = bandC.astype(jnp.float32)
            bh = bf.astype(jnp.bfloat16)
            bl = (bf - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            lhs = jnp.concatenate([bh, bl], axis=1)  # (R, 2*C*XW)

        def contract(rpart):
            """(R, B) fp32 rhs part -> (C*XW, B) fp32 exact product."""
            if bf16_mm:
                return _mm(lhs, rpart.astype(jnp.bfloat16))
            rh = rpart.astype(jnp.bfloat16)
            rl = (rpart - rh.astype(jnp.float32)).astype(jnp.bfloat16)
            q = _mm(lhs, jnp.concatenate([rh, rl], axis=1))  # (2CXW, 2B)
            return q[:CXW, :B] + q[:CXW, B:] + q[CXW:, :B] + q[CXW:, B:]

        hzr = jnp.repeat(hz, YW, axis=0)  # (R, B)
        hyt = jnp.tile(hy, (DZ, 1))
        m_oh = contract(hzr * hyt)  # forward contraction (for the x grad)
        m_z = contract(jnp.repeat(dhz, YW, axis=0) * hyt)
        m_y = contract(hzr * jnp.tile(dhy, (DZ, 1)))

        gz = jnp.zeros((1, B), jnp.float32)
        gy = jnp.zeros((1, B), jnp.float32)
        gx = jnp.zeros((1, B), jnp.float32)
        for c in range(channels):
            gs = g_ref[0, s : s + 1, c * B : (c + 1) * B].astype(jnp.float32)
            sl = slice(c * XW, (c + 1) * XW)
            gz = gz + gs * jnp.sum(m_z[sl] * hx, axis=0, keepdims=True)
            gy = gy + gs * jnp.sum(m_y[sl] * hx, axis=0, keepdims=True)
            gx = gx + gs * jnp.sum(m_oh[sl] * dhx, axis=0, keepdims=True)
        out_ref[0, 3 * s : 3 * s + 1, :] = gz
        out_ref[0, 3 * s + 1 : 3 * s + 2, :] = gy
        out_ref[0, 3 * s + 2 : 3 * s + 3, :] = gx


def _warp_pallas(img, planes, *, nearest, interpret, win, group_win=None):
    """(C, Z, Y, X) x (3, D, H, W) -> (C, D, H, W); caller checked shapes.

    ``group_win=(GDZ, GYW)`` selects the one-DMA-per-cell variant: the band
    scratch holds the cell's union window and each sub-tile slices its own
    (DZ, YW) view (see _GROUP_WIN)."""
    C = img.shape[0]
    src_spatial = tuple(int(s) for s in img.shape[1:])
    out_spatial = tuple(int(s) for s in planes.shape[1:])
    tile, _ = _tile_config()
    BZ, BY, BX = tile
    B = BZ * BY * BX

    # The band DMA needs a lane-aligned X (whole rows are copied) and a
    # sublane-aligned Y start; pad the source once so any true size works.
    # Border clamping keeps every sample inside the true region, so the pad
    # contents are never weighted.
    Z, Y, X = src_spatial
    pad_spatial = (Z, _round_up(Y, 8), _round_up(X, 128))
    if pad_spatial != src_spatial:
        img = jnp.pad(
            img,
            [(0, 0), (0, 0), (0, pad_spatial[1] - Y), (0, pad_spatial[2] - X)],
        )
    DZ = min(win[0], Z)
    YW = min(win[1], pad_spatial[1])
    XW = min(win[2], pad_spatial[2])
    group_windows = None
    if group_win is not None:
        group_windows = (
            max(min(group_win[0], Z), DZ),
            max(min(group_win[1], pad_spatial[1]), YW),
        )
    num_tiles = (
        (out_spatial[0] // BZ) * (out_spatial[1] // BY) * (out_spatial[2] // BX)
    )
    planes_t = _tile_planes(planes.astype(jnp.float32), tile)
    bf16_mm = os.environ.get("KM_WARP_BF16") == "1"
    band_dtype = jnp.bfloat16 if bf16_mm else jnp.float32
    if group_windows is not None:
        band_shape = (2, C, group_windows[0], group_windows[1], pad_spatial[2])
    else:
        band_shape = (2, C, DZ, YW, pad_spatial[2])

    kernel_fn = functools.partial(
        _kernel,
        src_spatial=src_spatial,
        pad_spatial=pad_spatial,
        windows=(DZ, YW, XW),
        channels=C,
        nearest=nearest,
        bf16_mm=bf16_mm,
        group_windows=group_windows,
    )
    out_shape = jax.ShapeDtypeStruct(
        (num_tiles // _GROUP, _GROUP, C * B), jnp.float32
    )
    scratch_shapes = [
        pltpu.VMEM(band_shape, band_dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    src_spec = pl.BlockSpec(memory_space=pltpu.HBM)  # src in HBM; banded DMA

    if group_windows is not None:
        starts = _group_starts(
            planes, src_spatial, pad_spatial, group_windows, nearest=nearest
        )
        out_tiled = pl.pallas_call(
            kernel_fn,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(num_tiles // _GROUP,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3 * _GROUP, B),
                        lambda t, sref: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    src_spec,
                ],
                out_specs=pl.BlockSpec(
                    (1, _GROUP, C * B),
                    lambda t, sref: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(starts, planes_t, img.astype(band_dtype))
    else:
        out_tiled = pl.pallas_call(
            kernel_fn,
            grid=(num_tiles // _GROUP,),
            in_specs=[
                pl.BlockSpec(
                    (1, 3 * _GROUP, B), lambda t: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                src_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, _GROUP, C * B), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(planes_t, img.astype(band_dtype))
    return _untile_output(out_tiled, out_spatial, tile, C)


def _grad_pallas(img, g, planes, *, interpret, win):
    """(C, Z, Y, X) x (C, D, H, W) x (3, D, H, W) -> (3, D, H, W) gradient of
    the warp wrt the CLAMPED VOXEL coordinates v (chain through
    clip+unnormalize applied by the caller)."""
    C = img.shape[0]
    src_spatial = tuple(int(s) for s in img.shape[1:])
    out_spatial = tuple(int(s) for s in planes.shape[1:])
    tile, _ = _tile_config()
    BZ, BY, BX = tile
    B = BZ * BY * BX

    Z, Y, X = src_spatial
    pad_spatial = (Z, _round_up(Y, 8), _round_up(X, 128))
    if pad_spatial != src_spatial:
        img = jnp.pad(
            img,
            [(0, 0), (0, 0), (0, pad_spatial[1] - Y), (0, pad_spatial[2] - X)],
        )
    DZ = min(win[0], Z)
    YW = min(win[1], pad_spatial[1])
    XW = min(win[2], pad_spatial[2])
    num_tiles = (
        (out_spatial[0] // BZ) * (out_spatial[1] // BY) * (out_spatial[2] // BX)
    )
    planes_t = _tile_planes(planes.astype(jnp.float32), tile)
    g_t = _tile_output(g.astype(jnp.float32), tile)
    bf16_mm = os.environ.get("KM_WARP_BF16") == "1"
    band_dtype = jnp.bfloat16 if bf16_mm else jnp.float32

    kernel_fn = functools.partial(
        _grad_kernel,
        src_spatial=src_spatial,
        pad_spatial=pad_spatial,
        windows=(DZ, YW, XW),
        channels=C,
        bf16_mm=bf16_mm,
    )
    out_tiled = pl.pallas_call(
        kernel_fn,
        grid=(num_tiles // _GROUP,),
        in_specs=[
            pl.BlockSpec(
                (1, 3 * _GROUP, B), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _GROUP, C * B), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3 * _GROUP, B), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles // _GROUP, 3 * _GROUP, B), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, DZ, YW, pad_spatial[2]), band_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(planes_t, g_t, img.astype(band_dtype))
    return _untile_planes(out_tiled, out_spatial, tile)


def _chain_planes(gv, pe, src_spatial):
    """Chain the grad-wrt-v through clip+unnormalize, exactly matching the
    XLA path's jnp.clip tie convention: scale S_a/2 inside the border, 0.5x
    at an exact clamp tie, 0 strictly outside."""
    sizes = jnp.asarray(src_spatial, jnp.float32).reshape(3, 1, 1, 1)
    vun = ((pe.astype(jnp.float32) + 1.0) * sizes - 1.0) * 0.5
    hi = sizes - 1.0
    mask = jnp.where(
        (vun < 0.0) | (vun > hi),
        0.0,
        jnp.where((vun == 0.0) | (vun == hi), 0.5, 1.0),
    )
    return gv * mask * (sizes * 0.5)


def _grad_planes_impl(img, planes, g, mode):
    """Pallas grad-wrt-planes dispatch, mirroring _warp_planes_fwd_impl's
    ladder: smallest fitting window per batch item (grad-span prepass), XLA
    VJP fallback for wild flows. Returns None if statically ineligible."""
    out_spatial = tuple(int(s) for s in planes.shape[2:])
    if (
        os.environ.get("KM_NO_WARP_GRAD") == "1"  # kill-switch: XLA VJP
        or not fast_warp_enabled()
        or mode != "bilinear"
        or img.ndim != 5
        or planes.shape[1] != 3
        or not _shapes_eligible(img.shape, out_spatial)
    ):
        return None

    interpret = jax.default_backend() == "cpu"
    B, C = img.shape[:2]
    src_spatial = tuple(int(s) for s in img.shape[2:])

    ladder, seen = [], set()
    for w in _tile_config()[1]:
        eff = _effective_win(w, src_spatial)
        if eff not in seen:
            seen.add(eff)
            ladder.append(w)

    def _xla_grad(im, pe, gb):
        _, vjp = jax.vjp(
            lambda p: _xla_warp(im[None], p[None], "bilinear")[0], pe
        )
        return vjp(gb)[0]

    def _make_fast(win):
        cb = _max_band_channels(src_spatial, win, grad=True)

        def _fast(im, pe, gb):
            parts = [
                _grad_pallas(im[c0 : c0 + cb], gb[c0 : c0 + cb], pe,
                             interpret=interpret, win=win)
                for c0 in range(0, C, cb)
            ]
            gv = parts[0]
            for part in parts[1:]:
                gv = gv + part
            return _chain_planes(gv, pe, src_spatial).astype(pe.dtype)

        return _fast

    outs = []
    for b in range(B):
        spans = _tile_spans(planes[b], src_spatial, nearest=False, grad=True)
        branch = _xla_grad
        for win in reversed(ladder):
            fits = jnp.all(
                spans
                <= jnp.asarray(_effective_win(win, src_spatial), jnp.float32)
            )

            def _cond(im, pe, gb, _fit=fits, _f=_make_fast(win), _alt=branch):
                return jax.lax.cond(_fit, _f, _alt, im, pe, gb)

            branch = _cond
        outs.append(branch(img[b], planes[b], g[b]))
    return jnp.stack(outs, axis=0)


def _tile_spans(planes, src_spatial, *, nearest, grad=False):
    """Exact XLA prepass: per-axis MAX coordinate span over all tiles.

    planes: (3, D, H, W). Returns a (3,) fp32 vector. Pure reductions — no
    gather. Computed once per call; each ladder window config compares
    against it (see :func:`_effective_win`).

    ``grad``: the backward kernel's corner-difference formulation reads
    ``floor(v)+1`` even at exactly-integral coordinates (where the forward
    hat weight there is zero and ``ceil`` == ``floor``), so its band must
    span one more row in that case: span uses floor(vmax)+1, not ceil(vmax).
    """
    D, H, W = (int(s) for s in planes.shape[1:])
    (BZ, BY, BX), _ = _tile_config()
    p = planes.astype(jnp.float32).reshape(3, D // BZ, BZ, H // BY, BY, W // BX, BX)
    sizes = jnp.asarray(src_spatial, jnp.float32).reshape(3, 1, 1, 1)
    v = ((p + 1.0) * sizes[..., None, None, None] - 1.0) * 0.5
    v = jnp.clip(
        v, 0.0, (sizes - 1.0)[..., None, None, None]
    )
    if nearest:
        v = jnp.round(v)
    vmin = jnp.min(v, axis=(2, 4, 6))  # (3, tz, ty, tx)
    vmax = jnp.max(v, axis=(2, 4, 6))
    lo = jnp.floor(vmin)
    # the kernel rounds the y band start down to a sublane multiple of 8
    lo = lo.at[1].set(jnp.floor(lo[1] / 8.0) * 8.0)
    hi = jnp.floor(vmax) + 1.0 if grad else jnp.ceil(vmax)
    span = hi - lo + 1.0
    return jnp.max(span, axis=(1, 2, 3))


def _group_spans(planes, src_spatial, *, nearest):
    """Exact XLA prepass for the group-DMA path: max UNION (z, y) span over
    each kernel cell's _GROUP consecutive tiles (same flattening order as
    :func:`_tile_planes`). Returns a (2,) fp32 vector."""
    D, H, W = (int(s) for s in planes.shape[1:])
    (BZ, BY, BX), _ = _tile_config()
    p = planes.astype(jnp.float32).reshape(3, D // BZ, BZ, H // BY, BY, W // BX, BX)
    sizes = jnp.asarray(src_spatial, jnp.float32).reshape(3, 1, 1, 1)
    v = ((p + 1.0) * sizes[..., None, None, None] - 1.0) * 0.5
    v = jnp.clip(v, 0.0, (sizes - 1.0)[..., None, None, None])
    if nearest:
        v = jnp.round(v)
    T = (D // BZ) * (H // BY) * (W // BX)
    vmin = jnp.min(v, axis=(2, 4, 6)).reshape(3, T // _GROUP, _GROUP)
    vmax = jnp.max(v, axis=(2, 4, 6)).reshape(3, T // _GROUP, _GROUP)
    gmin = jnp.min(vmin, axis=2)[:2]  # (2, T//_GROUP): z, y only
    gmax = jnp.max(vmax, axis=2)[:2]
    lo = jnp.floor(gmin)
    lo = lo.at[1].set(jnp.floor(lo[1] / 8.0) * 8.0)  # y start 8-aligned
    span = jnp.ceil(gmax) - lo + 1.0
    return jnp.max(span, axis=1)


def _group_starts(planes, src_spatial, pad_spatial, group_windows, *, nearest):
    """Per-cell (z0g, y0g) union band starts for the group-DMA path,
    (2, T//_GROUP) int32 — the scalar-prefetch operand. Must mirror the
    kernel's per-sub-tile start computation exactly: clip semantics match
    because clip/min commute and the group upper bounds are tighter.

    Layout: cells in the MINOR dim. SMEM pads the minor dim to 128 lanes,
    so the transposed (T//_GROUP, 2) form ballooned to T//_GROUP * 128 s32
    — exactly 1.00 MiB at 256^3 (2048 cells), overflowing the 1 MiB SMEM
    budget once the register allocator added spill slots. (2, 2048) is
    16 KiB."""
    D, H, W = (int(s) for s in planes.shape[1:])
    (BZ, BY, BX), _ = _tile_config()
    Z = src_spatial[0]
    Yp = pad_spatial[1]
    GDZ, GYW = group_windows
    p = planes.astype(jnp.float32).reshape(3, D // BZ, BZ, H // BY, BY, W // BX, BX)
    sizes = jnp.asarray(src_spatial, jnp.float32).reshape(3, 1, 1, 1)
    v = ((p + 1.0) * sizes[..., None, None, None] - 1.0) * 0.5
    v = jnp.clip(v, 0.0, (sizes - 1.0)[..., None, None, None])
    if nearest:
        v = jnp.round(v)
    T = (D // BZ) * (H // BY) * (W // BX)
    gmin = jnp.min(
        jnp.min(v, axis=(2, 4, 6)).reshape(3, T // _GROUP, _GROUP), axis=2
    )
    z0 = jnp.clip(
        jnp.floor(gmin[0]).astype(jnp.int32), 0, max(Z - GDZ, 0)
    )
    y0 = jnp.clip(
        (jnp.floor(gmin[1]).astype(jnp.int32) // 8) * 8, 0, max(Yp - GYW, 0)
    )
    return jnp.stack([z0, y0], axis=0)


def _effective_win(win, src_spatial):
    """Clamp a ladder window config to the (padded) source dims."""
    Z, Y, X = src_spatial
    return (
        min(win[0], Z),
        min(win[1], _round_up(Y, 8)),
        min(win[2], _round_up(X, 128)),
    )


def _tile_spans_fit(planes, src_spatial, *, nearest, win=None):
    """Does every tile's coordinate span fit `win` (default: the LARGEST
    ladder config, i.e. 'will the kernel path run at all')?"""
    if win is None:
        win = _tile_config()[1][-1]
    spans = _tile_spans(planes, src_spatial, nearest=nearest)
    wins = jnp.asarray(_effective_win(win, src_spatial), jnp.float32)
    return jnp.all(spans <= wins)


def _shapes_eligible(img_shape, out_spatial):
    """Static check: can the kernel be instantiated for these shapes?"""
    (BZ, BY, BX), _ = _tile_config()
    D, H, W = out_spatial
    Z, Y, X = img_shape[2:]
    num_tiles = (D // BZ) * (H // BY) * (W // BX) if min(D, H, W) > 0 else 0
    return (
        D % BZ == 0
        and H % BY == 0
        and W % BX == 0
        and num_tiles % _GROUP == 0
        and min(Z, D) >= BZ
        and min(Y, H) >= BY
        and min(X, W) >= BX
    )


def fast_warp_enabled():
    """The kernel is the default on TPU; KM_NO_FAST_WARP=1 restores the XLA
    gather path, KM_FORCE_FAST_WARP=1 exercises the kernel (interpreted) on
    CPU for tests. Allowlist: Mosaic lowering exists only for TPU — any
    other backend (GPU included) must take the XLA path."""
    if os.environ.get("KM_NO_FAST_WARP") == "1":
        return False
    if os.environ.get("KM_FORCE_FAST_WARP") == "1":
        return True
    return jax.default_backend() == "tpu"


# Per-chunk channel budget against the ~16 MiB scoped-VMEM limit. Channel-
# scaled costs per kernel cell: the double-buffered band (2*DZ*YW*Xp), the
# rolled band2 copy (R*Xp), and the x-contraction temporary + output lanes
# (~B*(XW+2*_GROUP)); fixed costs (one-hot (R,B), planes block, pipeline
# copies, and XLA's choice to park small whole outputs in VMEM) get the
# remaining headroom. 4 MiB for the channel-scaled part held a measured
# C=6 64^3 case (16.45M total at C=6 unchunked) with margin. Channels
# beyond the budget are warped in chunks — the planes/one-hot work is
# redone per chunk, cheap next to the band DMAs.
_BAND_VMEM_BUDGET = 4 * 2**20


def _band_vmem_budget():
    """KM_BAND_VMEM_MB sweeps the channel-scaled VMEM budget (device
    measurement knob for the group path's per-channel cost — the group band
    is ~2.6 MiB/channel at Xp=256, which chunks multi-channel seg warps to
    cb=1 under the 4 MiB default; see tools/warp_channels_bench.py)."""
    mb = os.environ.get("KM_BAND_VMEM_MB")
    return int(float(mb) * 2**20) if mb else _BAND_VMEM_BUDGET


def _max_band_channels(src_spatial, win=None, group_win=None, grad=False):
    Z, Y, X = src_spatial
    (BZ, BY, BX), ladder = _tile_config()
    if win is None:
        win = ladder[-1]
    DZ, YW, XW = _effective_win(win, src_spatial)
    Xp = _round_up(X, 128)
    R = DZ * YW
    B = BZ * BY * BX
    if group_win is not None:
        # cell-axis double-buffered group band + the sliced (R, Xp) view
        gdz = max(min(group_win[0], Z), DZ)
        gyw = max(min(group_win[1], _round_up(Y, 8)), YW)
        band_elems = 2 * gdz * gyw * Xp + R * Xp
    else:
        band_elems = 2 * DZ * YW * Xp
    # channel-scaled VMEM: the band buffer(s), the rolled (R, Xp)
    # transient, the channel-stacked matmul operands (hi/lo bf16 ~ 2 words
    # of R*XW) + its (XW, B) output slab, and the output lanes. The grad
    # kernel's matmul rhs/output triple in width ([oh|dohz|dohy]).
    mm_out = 3 if grad else 1
    per_channel = (
        band_elems + R * Xp + 2 * R * XW + B * (2 * mm_out * XW + 2 * _GROUP)
    ) * 4
    return max(1, _band_vmem_budget() // per_channel)


def _xla_warp(img, planes, mode):
    from keymorph_tpu.ops.planes import grid_sample_planes

    return grid_sample_planes(img, planes, mode=mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _warp(mode, img, planes):
    return _warp_planes_fwd_impl(img, planes, mode)


def _warp_planes_fwd_impl(img, planes, mode):
    out_spatial = tuple(int(s) for s in planes.shape[2:])
    if (
        not fast_warp_enabled()
        or mode not in ("bilinear", "nearest")
        or img.ndim != 5
        or planes.shape[1] != 3
        or not _shapes_eligible(img.shape, out_spatial)
    ):
        return _xla_warp(img, planes, mode)

    nearest = mode == "nearest"
    interpret = jax.default_backend() == "cpu"
    B, C = img.shape[:2]
    src_spatial = tuple(int(s) for s in img.shape[2:])

    # the window ladder, deduped by effective (clamped) size — small volumes
    # collapse several configs onto the same kernel
    ladder, seen = [], set()
    for w in _tile_config()[1]:
        eff = _effective_win(w, src_spatial)
        if eff not in seen:
            seen.add(eff)
            ladder.append(w)

    def _make_fast(win, group_win=None):
        # channel chunking bounds the band scratch (many-channel one-hot
        # segmentations would otherwise exceed scoped VMEM)
        cb = _max_band_channels(src_spatial, win, group_win)

        def _fast(im, pe):
            chunks = [
                _warp_pallas(im[c0 : c0 + cb], pe, nearest=nearest,
                             interpret=interpret, win=win,
                             group_win=group_win)
                for c0 in range(0, C, cb)
            ]
            out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
            return out.astype(img.dtype)

        return _fast

    outs = []
    for b in range(B):  # B is 1 on the serving path; small unroll otherwise
        # one span reduction per call; each ladder rung compares against it
        spans = _tile_spans(planes[b], src_spatial, nearest=nearest)

        branch = lambda im, pe: _xla_warp(im[None], pe[None], mode)[0]  # noqa: E731
        for win in reversed(ladder):
            fits = jnp.all(
                spans
                <= jnp.asarray(_effective_win(win, src_spatial), jnp.float32)
            )

            def _cond(im, pe, _fit=fits, _f=_make_fast(win), _alt=branch):
                return jax.lax.cond(_fit, _f, _alt, im, pe)

            branch = _cond

        if (
            os.environ.get("KM_NO_WARP_GROUP") != "1"
            and not os.environ.get("KM_WARP_TILES")  # forced sweep config:
            # the sweep's invariant is "the forced per-sub-tile kernel is
            # what runs" — don't mask it with the group branch
        ):
            # outermost (preferred): one band DMA per kernel cell when the
            # cell-union span also fits _GROUP_WIN (smooth serving flows)
            win0 = ladder[0]
            effw = _effective_win(win0, src_spatial)
            effg = (
                max(min(_GROUP_WIN[0], src_spatial[0]), effw[0]),
                max(min(_GROUP_WIN[1], _round_up(src_spatial[1], 8)), effw[1]),
            )
            gspans = _group_spans(planes[b], src_spatial, nearest=nearest)
            gfit = jnp.all(
                spans <= jnp.asarray(effw, jnp.float32)
            ) & jnp.all(gspans <= jnp.asarray(effg, jnp.float32))

            def _gcond(im, pe, _fit=gfit,
                       _f=_make_fast(win0, _GROUP_WIN), _alt=branch):
                return jax.lax.cond(_fit, _f, _alt, im, pe)

            branch = _gcond
        outs.append(branch(img[b], planes[b]))
    return jnp.stack(outs, axis=0)


def _warp_planes_fwd(mode, img, planes):
    return _warp_planes_fwd_impl(img, planes, mode), (img, planes)


def _warp_planes_bwd(mode, res, g):
    # The planes (flow) gradient rides the gather-free Pallas grad kernel
    # when eligible (the only branch a training step keeps — image/seg
    # cotangents never reach the params and are pruned); the image gradient
    # and every ineligible case keep the XLA path's VJP. Both compute the
    # same function, so values are unchanged either way; XLA DCEs whichever
    # XLA-side cotangent ends up unused.
    img, planes = res
    _, vjp = jax.vjp(lambda im, pe: _xla_warp(im, pe, mode), img, planes)
    g_img, g_planes_xla = vjp(g)
    g_planes = _grad_planes_impl(img, planes, g, mode)
    if g_planes is None:
        g_planes = g_planes_xla
    return g_img, g_planes.astype(g_planes_xla.dtype)


_warp.defvjp(_warp_planes_fwd, _warp_planes_bwd)


def warp_planes(img, planes, mode="bilinear"):
    """Trilinear/nearest warp from `ij`-ordered coordinate planes.

    Drop-in for ``ops.planes.grid_sample_planes`` (same border /
    align_corners=False semantics; reference keymorph/utils.py:14-21) with
    the gather-free Pallas kernel on the eligible path and the XLA gather
    path as exactness fallback.

    Args:
        img: (B, C, Z, Y, X)
        planes: (B, 3, D, H, W) normalized [-1, 1] coords, plane a indexes
            spatial axis a of img.
    Returns:
        (B, C, D, H, W), dtype of img.
    """
    return _warp(mode, img, planes)


def warp_grid(img, grid, mode="bilinear"):
    """Warp from the reference's xy-ordered (B, D, H, W, 3) grid contract."""
    planes = jnp.flip(jnp.moveaxis(grid, -1, 1), axis=1)
    return warp_planes(img, planes, mode)
