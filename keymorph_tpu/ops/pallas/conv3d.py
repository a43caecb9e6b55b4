"""Fused norm+conv3x3x3+ReLU Pallas kernel: the extraction-wall breaker.

XLA's channel-last 3D convolutions collapse at the U-Net's small-channel
full-resolution levels (measured on the v5e, 256^3 bf16, GN+conv+ReLU):
conv 16->32 runs at 4.4 TFLOPS (105.6 ms), 192->64 at 18.3 TFLOPS (76.2 ms),
1->16 at 0.2 TFLOPS (68.5 ms) — while the deep levels reach 45-59 TFLOPS
(tools/conv_microbench.py). The cause is lane occupancy: with C in lanes,
Cout<=64 uses <=half the MXU's 128 lanes and Cin<=32 starves the K dim.

This kernel reformulates the hot convs so the MXU runs full:

  * Layout (Z, C, Y, X) with (y, x) FLATTENED into the lane axis — rows of
    the matmul N dimension are whole y-rows of voxels, so N = YB*X (2048-4096
    lanes) regardless of channel count.
  * The 9 (dz, dy) taps stack into the contraction dim: K = 9*Cin_chunk.
    A (Cout, 9*Cin) x (9*Cin, YB*X) matmul per dx tap; the dx in {-1,0,+1}
    shift is applied as a LANE ROLL of the (small) output instead of a
    shifted copy of the (large) input, with the two boundary columns that a
    roll would contaminate masked off (they correspond to the conv's zero
    padding).
  * The preceding GroupNorm/InstanceNorm collapses to a per-channel affine
    once its (cheap, XLA) stats are known, and an input affine folds EXACTLY
    into the conv weights: conv(a*x+b) = conv_{a*W}(x) + (sum W)·b. The
    normalization's full-volume elementwise pass disappears into the kernel.
  * ReLU (or none) fuses into the epilogue.

The contraction runs in bf16 with fp32 accumulation — the same arithmetic
XLA's bf16 conv performs. Parity: reference `SingleConv` 'gcr'
(keymorph/unet3d/buildingblocks.py:10-95) and `ConvBlock`
(keymorph/layers.py:137-187); numerics are tested against the XLA lowering
of the identical affine+conv+relu composition.

Eligibility (static): X % 128 == 0, Y % YB == 0, Z % ZB == 0, dtype bf16 or
fp32 input (compute always bf16 x bf16 -> fp32, like the backbone's AMP
mode). Ineligible shapes fall back to XLA. The custom VJP's backward runs
the XLA formulation (identical function), so training is unchanged.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


def _slide_stack(Cg, ZB):
    """Sliding tap stack: every (z-plane, dy) block is copied ONCE per cell
    into a ((ZB+2)*3*Cg, N) stack and each lz matmul reads the contiguous
    K-slice [lz*3*Cg : lz*3*Cg + 9*Cg] — 3*(ZB+2) strided copies per cell
    instead of 9*ZB (2x less at ZB=4). Requires the slice offset 3*Cg to be
    a bf16 sublane-tile multiple (Cg % 16 == 0); other group sizes keep the
    per-lz stacking. KM_NO_CONV_SLIDE=1 kills the path."""
    if os.environ.get("KM_NO_CONV_SLIDE") == "1":
        return False
    return Cg % 16 == 0 and ZB >= 2


def _vmem_bytes(ZB, YB, Cg, cin, cout, X, slide):
    """Scoped-VMEM estimate of one kernel call (band + S + acc + out)."""
    WL = (YB + 16) * X
    N = YB * X
    s_rows = (3 * (ZB + 2) if slide else 9) * max(Cg, 8)
    return (
        2 * (ZB + 2) * Cg * WL * 2  # double-buffered input band (bf16)
        + s_rows * N * 2  # S stack (bf16; sublane-padded)
        + ZB * cout * N * 4  # fp32 accumulator
        + 2 * ZB * cout * N * 2  # pipelined output blocks (bf16)
        + 9 * cin * cout * 3 * 2  # weights
    )


_VMEM_BUDGET = 13 * 2**20


def _pick_tiles(cin, cout, Y, X, cg_divides=None):
    """(ZB, YB, Cg, slide): z rows per cell, y rows per cell, Cin chunk,
    sliding-tap-stack flag — sized against the ~16 MiB scoped-VMEM budget
    (band + S + acc + out block).

    ``cg_divides``: additionally require Cg to divide this value (the gcd
    of a multi-part input's channel counts — conv3x3_fused_flat_parts
    groups must not straddle a part boundary)."""
    forced = os.environ.get("KM_CONV_TILES")
    if forced and cg_divides is None:
        ZB, YB, Cg = (int(v) for v in forced.split(","))
        Cg = min(Cg, cin)
        slide = _slide_stack(Cg, ZB)
        # the slide stack's scratch is up to 2x the per-lz stack; a forced
        # config that fit without it must not silently exceed scoped VMEM —
        # drop the slide stack first, keep the forced tiles either way
        if slide and _vmem_bytes(ZB, YB, Cg, cin, cout, X, True) > _VMEM_BUDGET:
            slide = False
        return ZB, YB, Cg, slide
    # lane row of one y-window: (YB+16)*X elems
    # try generous tiles first, shrink until the budget holds
    ladder = (
        (4, 16, cin),
        (4, 16, 64),
        (2, 16, 64),
        (2, 8, 64),
        (2, 8, 32),
        (1, 8, 32),
    )
    if os.environ.get("KM_NO_CONV_BIGCG") != "1":
        # big-Cg rungs: fewer Cin groups at the deep levels (X in {32, 64},
        # where the small lane row lets 96-256-channel bands fit VMEM) —
        # e3/e4/d1c2 become SINGLE-group (no fp32 partial-sum round trip),
        # d1c1 drops 6 -> 3 groups, d2c1 3 -> 2. Default ON: with the fused
        # upsample-conv it measured 7.22 vs 6.77 reg/s at 256^3 and 54.7 vs
        # 52.5 at 128^3 end-to-end (r5 device sweep). KM_NO_CONV_BIGCG=1
        # restores the small rungs.
        ladder = (
            (4, 16, cin),
            (2, 16, cin),
            (2, 16, 192),
            (2, 16, 128),
            (2, 8, 96),
        ) + ladder[1:]
    for ZB, YB, Cg in ladder:
        Cg = min(Cg, cin)
        if cin % Cg != 0 or Y % YB != 0:
            continue
        if cg_divides is not None and cg_divides % Cg != 0:
            continue
        slide = _slide_stack(Cg, ZB)
        if _vmem_bytes(ZB, YB, Cg, cin, cout, X, slide) <= _VMEM_BUDGET:
            return ZB, YB, Cg, slide
    return None


def _shapes_eligible(shape):
    Z, C, Y, X = shape
    if X % 128 == 0 and X >= 128 and Y % 8 == 0 and Z >= 1:
        return True
    # Sub-lane-tile X (the U-Net's 64^3/32^3 deep levels): every DMA lane
    # offset is a multiple of 8*X >= 256 (hinted via pl.multiple_of — the
    # device-measured kernel runs 112-183 TF at these shapes, vs 33.7 TF
    # for the channel-last XLA conv+stats fusion it replaces). Flat kernel
    # only: the padded-copy fallback was never built for X < 128, so the
    # KM_NO_CONV_FLAT degrade also turns these shapes off.
    # KM_NO_CONV_X64=1 is the targeted kill-switch.
    if (
        os.environ.get("KM_NO_CONV_X64") == "1"
        or os.environ.get("KM_NO_CONV_FLAT") == "1"
    ):
        return False
    return X in (32, 64) and Y % 8 == 0 and Y >= 8 and Z >= 1


def _kernel(wt_ref, bias_ref, xp_ref, out_ref, *refs, ZB, YB, Cg, X, Cout,
            n_cells_y, relu, out_dtype, Z=None, emit_stats=False, slide=True,
            ablate=None):
    """Grid: (n_cells_z * n_cells_y,) linearized. One Cin group per call —
    larger channel counts are split into independent single-group calls and
    summed by the host wrapper (keeps the kernel free of revisited-output
    accumulation, which the tunnel's Mosaic build miscompiles).

    wt_ref:  (3, Cout, 9*Cg) VMEM — dx-tap weights, bf16.
    bias_ref:(Cout, 128) fp32 (columns 0..2 meaningful).
    xp_ref:  (Z+2, Cg, (Y+16)*X) HBM, halo-padded, bf16.
    out_ref: (ZB, Cout, YB*X) VMEM block.
    stat_ref (emit_stats only): (1, Cout, 128) per-cell partials — lane 0
             holds sum(out), lane 1 sum(out^2), over this cell's true
             (z < Z) rows, computed on the bf16-ROUNDED output so the
             aggregated mean/msq match an XLA reduce of the returned
             tensor (up to fp32 summation order).
    band:    (2, ZB+2, Cg, (YB+16)*X) bf16 double buffer.
    s_ref:   (9*Cg, YB*X) bf16 tap stack.
    """
    if emit_stats:
        stat_ref, band, s_ref, sem = refs
    else:
        band, s_ref, sem = refs
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    WL = (YB + 16) * X
    N = YB * X

    def dma(step, slot):
        iz = step // n_cells_y
        iy = step % n_cells_y
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(iz * ZB, ZB + 2), :, pl.ds(iy * YB * X, WL)],
            band.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        dma(t + 1, (t + 1) % 2).start()

    dma(t, t % 2).wait()
    slot = t % 2

    # lane index within each y-row (for dx boundary masking)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % X
    b = bias_ref[:, 0:1]  # (Cout, 1) folded bias
    c_left = bias_ref[:, 1:2]  # x=0 boundary constant (dx=-1 tap)
    c_right = bias_ref[:, 2:3]  # x=X-1 boundary constant (dx=+1 tap)

    _cell_compute(
        wt_ref, out_ref, band, s_ref, slot, lane, b, c_left, c_right,
        stats=(stat_ref, t) if emit_stats else None,
        ZB=ZB, Cg=Cg, X=X, Cout=Cout, N=N, Z=Z, n_cells_y=n_cells_y,
        relu=relu, out_dtype=out_dtype, slide=slide, ablate=ablate,
    )


def _cell_compute(wt_ref, out_ref, band, s_ref, slot, lane, b, c_left,
                  c_right, *, stats, ZB, Cg, X, Cout, N, Z, n_cells_y,
                  relu, out_dtype, slide, ablate, cshift=None, parity=None):
    """Shared per-cell compute: tap stack -> matmul -> dx combine -> relu ->
    out block (+ optional per-cell stats partials). ``cshift`` — the flat
    (in-kernel-halo) kernel's (Cg, 1) +b/a column — is added during the
    stack copies; with the halo regions pre-filled to -b/a, out-of-bounds
    taps become exact zeros (see _kernel_flat).

    ``parity``: (pz, py, px) in {0,1}^3 — the fused nearest-upsample conv:
    the 3^3 conv on the x2-upsampled input collapses, per output parity
    class, to a 2^3-tap conv on the LOW-RES input (taps folded in
    _prepack_parity). The 2 taps per dim are a contiguous subset of the
    same band offsets the 3-tap path uses (dz in {pz, pz+1}, dy in
    {py, py+1}, dx rolls for {px-1, px} of the hi-res stencil), so the
    band DMA/halo machinery is shared verbatim. FLOPs drop 27 -> 8 taps."""
    if stats is not None:
        stat_ref, t = stats
        s1 = jnp.zeros((Cout, 1), jnp.float32)
        s2 = jnp.zeros((Cout, 1), jnp.float32)

    dzs = (0, 1, 2) if parity is None else (parity[0], parity[0] + 1)
    dys = (0, 1, 2) if parity is None else (parity[1], parity[1] + 1)
    dxs = (0, 1, 2) if parity is None else (parity[2], parity[2] + 1)
    n_dy = len(dys)
    n_pairs = len(dzs) * n_dy

    def stacked(src):
        return src if cshift is None else src + cshift

    if slide and ablate != "nostack":
        # sliding stack: each (z-plane, dy) block copied once per cell;
        # every lz reads a contiguous K window (see _slide_stack).
        # Parity mode: only the 2 needed dy rows per plane are stacked and
        # each lz reads the window starting at its first needed plane.
        for zp in range(ZB + 2 if parity is None else ZB + 1):
            for j, dy in enumerate(dys):
                s_ref[(zp * n_dy + j) * Cg : (zp * n_dy + j + 1) * Cg, :] = (
                    stacked(
                        band[
                            slot, zp + (0 if parity is None else dzs[0]), :,
                            (7 + dy) * X : (7 + dy) * X + N,
                        ]
                    )
                )

    for lz in range(ZB):
        if not slide and ablate != "nostack":
            # stack the (dz, dy) taps: S[(i*n_dy+j)*Cg : +Cg] = shifted rows
            for i, dz in enumerate(dzs):
                for j, dy in enumerate(dys):
                    s_ref[(i * n_dy + j) * Cg : (i * n_dy + j + 1) * Cg, :] = (
                        stacked(
                            band[
                                slot, lz + dz, :,
                                (7 + dy) * X : (7 + dy) * X + N,
                            ]
                        )
                    )
        s = (
            s_ref[lz * n_dy * Cg : lz * n_dy * Cg + n_pairs * Cg, :]
            if slide
            else s_ref[...]
        )
        o = jnp.broadcast_to(b, (Cout, N)).astype(jnp.float32)
        o = o + jnp.where(lane == 0, c_left, 0.0)
        o = o + jnp.where(lane == X - 1, c_right, 0.0)
        if ablate == "nomm":
            y_all = jnp.zeros((len(dxs) * Cout, N), jnp.float32)
        else:
            # one matmul for all dx taps: M = n_dx*Cout fills the MXU's 128
            # sublanes where a per-tap M = Cout (16-64 at the hot levels)
            # left it 12-50% occupied — the difference between the kernel
            # being matmul-bound and bandwidth-bound at Cout=32
            y_all = jax.lax.dot_general(
                wt_ref[...].reshape(len(dxs) * Cout, n_pairs * Cg),
                s,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n_dx*Cout, N)
        for k, dx in enumerate(dxs):
            y_dx = y_all[k * Cout : (k + 1) * Cout]
            if ablate != "noroll":
                if dx == 0:
                    # output x gets input x-1: shift contributions right;
                    # the first column of every X-row would wrap — zero it
                    # (the boundary constant was added above)
                    y_dx = jnp.where(lane > 0, pltpu.roll(y_dx, 1, 1), 0.0)
                elif dx == 2:
                    # left-roll by 1 == right-roll by N-1 (roll wants >= 0)
                    y_dx = jnp.where(
                        lane < X - 1, pltpu.roll(y_dx, N - 1, 1), 0.0
                    )
            o = o + y_dx
        if relu:
            o = jnp.maximum(o, 0.0)
        oc = o.astype(out_dtype)
        out_ref[lz] = oc
        if stats is not None:
            # register accumulation across the unrolled lz loop, one write
            # at the end — no revisited-output-block accumulation (which
            # this tunnel's Mosaic build miscompiles). z-pad rows (z >= Z)
            # hold halo-driven garbage and are masked out.
            zok = (t // n_cells_y) * ZB + lz < Z
            w = jnp.where(zok, 1.0, 0.0)
            of = oc.astype(jnp.float32)
            s1 = s1 + w * jnp.sum(of, axis=1, keepdims=True)
            s2 = s2 + w * jnp.sum(of * of, axis=1, keepdims=True)

    if stats is not None:
        stat_ref[0] = jnp.pad(
            jnp.concatenate([s1, s2], axis=1), ((0, 0), (0, 126))
        )


def _kernel_flat(wt_ref, bias_ref, cvec_ref, x_ref, out_ref, *refs, ZB, YB,
                 Cg, c0, X, Y, Z, Cout, n_cells_y, relu, out_dtype,
                 emit_stats=False, slide=True, has_shift=False, ablate=None,
                 parity=None):
    """In-kernel-halo variant: reads the UNPADDED flat volume directly.

    The xp-building chain the padded kernel needs (pad + reshape + layout
    copy) measured 5-7 ms per 256^3 conv — more than the 4.8 ms kernel
    itself. Here each cell's band DMA comes straight out of the flat
    (Z, Cin_total, Y*X) tensor with statically-shaped boundary branches,
    halo rows/lane-strips are filled in-kernel with -b/a, and the +b/a
    pre-shift (see _prepack: zero-halo folding) rides the tap-stack copies
    — so out-of-bounds taps are exact zeros and NO padded copy of the
    volume ever exists.

    x_ref:    (Z, Cin_total, Y*X) HBM, bf16; this call reads channels
              [c0, c0+Cg) — channel grouping without host-side slicing.
    cvec_ref: (Cg, 128) bf16, every column = b/a (zeros without a shift).
    Other refs/scratch as _kernel.
    """
    if emit_stats:
        stat_ref, band, s_ref, sem = refs
    else:
        band, s_ref, sem = refs
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    WL = (YB + 16) * X
    N = YB * X
    n_cz = n_t // n_cells_y
    tail = Z - (n_cz - 1) * ZB  # static rows of the last z cell (<= ZB)

    # ---- statically-shaped boundary cases -------------------------------
    # z: (cond, src row start, rows, dest row offset). The band holds
    # ZB+2 z rows; row 0 / row tail+1.. are halo when the window clips.
    def z_cases(iz):
        if n_cz == 1:
            return [(None, 0, Z, 1)]
        cases = [(iz == 0, 0, ZB + 1, 1)]
        if n_cz > 2:
            cases.append(
                ((iz > 0) & (iz < n_cz - 1), iz * ZB - 1, ZB + 2, 0)
            )
        cases.append((iz == n_cz - 1, iz * ZB - 1, tail + 1, 0))
        return cases

    # y: (cond, src lane start, lanes, dest lane offset); the 8-row halo
    # strips at the volume's y edges are filled, interior cells' strips are
    # real neighbor rows (the sublane-alignment slack, as in the xp path).
    def y_cases(iy):
        if n_cells_y == 1:
            return [(None, 0, Y * X, 8 * X)]
        cases = [(iy == 0, 0, WL - 8 * X, 8 * X)]
        if n_cells_y > 2:
            cases.append(
                (
                    (iy > 0) & (iy < n_cells_y - 1),
                    (iy * YB - 8) * X, WL, 0,
                )
            )
        cases.append(
            (iy == n_cells_y - 1, (iy * YB - 8) * X, WL - 8 * X, 0)
        )
        return cases

    hneg = -cvec_ref[:, 0:1]  # (Cg, 1) bf16: halo fill; stack adds +b/a

    def fill_rows(slot, r0, r1, l0, l1):
        for r in range(r0, r1):
            band[slot, r, :, l0:l1] = jnp.broadcast_to(hneg, (Cg, l1 - l0))

    def copies(step, slot, go):
        """Run ``go(async_copy)`` under each boundary case's condition —
        the same branch table serves issue (.start) and wait (.wait): a
        wait's byte count must match its issued copy."""
        iz = step // n_cells_y
        iy = step % n_cells_y
        for zc, z0, zr, zd in z_cases(iz):
            for yc, y0, yl, yd in y_cases(iy):
                def _go(z0=z0, zr=zr, zd=zd, y0=y0, yl=yl, yd=yd):
                    if not isinstance(y0, int):
                        # lane offsets are k*8*X (X >= 32) — always a
                        # multiple of 128, but Mosaic can't prove it for
                        # X < 128 without the hint
                        y0 = pl.multiple_of(y0, 128)
                    go(
                        pltpu.make_async_copy(
                            x_ref.at[
                                pl.ds(z0, zr), pl.ds(c0, Cg), pl.ds(y0, yl)
                            ],
                            band.at[slot, pl.ds(zd, zr), :, pl.ds(yd, yl)],
                            sem.at[slot],
                        )
                    )
                cond = zc if yc is None else (yc if zc is None else zc & yc)
                if cond is None:
                    _go()
                else:
                    pl.when(cond)(_go)

    def issue(step, slot):
        copies(step, slot, lambda cp: cp.start())
        # halo fills (disjoint from the DMA's dest region; VPU work that
        # overlaps the copy). Only boundary cells write anything.
        iz = step // n_cells_y
        iy = step % n_cells_y
        if n_cz == 1:
            fill_rows(slot, 0, 1, 0, WL)
            fill_rows(slot, Z + 1, ZB + 2, 0, WL)
        else:
            @pl.when(iz == 0)
            def _():
                fill_rows(slot, 0, 1, 0, WL)

            @pl.when(iz == n_cz - 1)
            def _():
                fill_rows(slot, tail + 1, ZB + 2, 0, WL)
        if n_cells_y == 1:
            fill_rows(slot, 0, ZB + 2, 0, 8 * X)
            fill_rows(slot, 0, ZB + 2, WL - 8 * X, WL)
        else:
            @pl.when(iy == 0)
            def _():
                fill_rows(slot, 0, ZB + 2, 0, 8 * X)

            @pl.when(iy == n_cells_y - 1)
            def _():
                fill_rows(slot, 0, ZB + 2, WL - 8 * X, WL)

    def wait(step, slot):
        copies(step, slot, lambda cp: cp.wait())

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < n_t)
    def _():
        issue(t + 1, (t + 1) % 2)

    wait(t, t % 2)
    slot = t % 2

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % X
    b = bias_ref[:, 0:1]
    c_left = bias_ref[:, 1:2]
    c_right = bias_ref[:, 2:3]
    cshift = cvec_ref[:, 0:1] if has_shift else None

    _cell_compute(
        wt_ref, out_ref, band, s_ref, slot, lane, b, c_left, c_right,
        stats=(stat_ref, t) if emit_stats else None,
        ZB=ZB, Cg=Cg, X=X, Cout=Cout, N=N, Z=Z, n_cells_y=n_cells_y,
        relu=relu, out_dtype=out_dtype, slide=slide, ablate=ablate,
        cshift=cshift, parity=parity,
    )


def _prepack(w, scale, shift, bias):
    """(3,3,3,Cin,Cout) HWIO + per-Cin affine -> kernel operands.

    Returns (wt (3, Cout, 9*Cin) bf16, bias_col (Cout, 128) fp32,
    xshift (Cin,) fp32 or None).

    Zero-halo folding: the true op is conv_W(pad0(a*x + b)). With the
    input pre-shifted to xs = x + b/a, conv_{aW}(pad0(xs)) equals it
    EXACTLY — an interior tap gives aW·(x + b/a) = W·(ax + b), and an
    out-of-bounds tap contributes 0 on both sides. The former
    pad_{-b/a} scheme's halo value, folded ΣWb bias, and x-boundary
    roll constants all collapse to zero: one plain zero-pad (a single
    fused XLA op, with the + b/a shift fused into it) replaces the
    measured 3-pass pad+concat+reshape chain (6.7 of l1c2's 11.5 ms at
    256³ — the kernel itself was only 4.8). bias_col carries only the
    conv bias; columns 1-2 (the former roll constants) stay zero.
    """
    k1, k2, k3, cin, cout = w.shape
    assert (k1, k2, k3) == (3, 3, 3)
    wf = w.astype(jnp.float32)
    if scale is not None:
        wf = wf * scale.astype(jnp.float32)[None, None, None, :, None]
    fold_bias = jnp.zeros((cout,), jnp.float32)
    xshift = None
    if shift is not None:
        b = shift.astype(jnp.float32)
        if scale is not None:
            a = scale.astype(jnp.float32)
            xshift = jnp.where(a != 0.0, b / jnp.where(a == 0.0, 1.0, a), 0.0)
        else:
            xshift = b
    if bias is not None:
        fold_bias = fold_bias + bias.astype(jnp.float32)
    # (dz, dy, dx, ci, co) -> (dx, co, dz, dy, ci)
    wt = jnp.transpose(wf, (2, 4, 0, 1, 3)).reshape(3, cout, 9 * cin)
    bias_col = jnp.zeros((cout, 128), jnp.float32).at[:, 0].set(fold_bias)
    return wt.astype(jnp.bfloat16), bias_col, xshift


def _fold_parity(wf, axis, p):
    """Collapse one 3-tap conv axis onto a x2-nearest-upsampled input to
    its 2-tap equivalent for output parity ``p``: taps that read the same
    low-res voxel sum their weights (even: [W0, W1+W2]; odd: [W0+W1, W2])."""
    w0, w1, w2 = (jnp.take(wf, i, axis=axis) for i in range(3))
    lo = w0 + (w1 if p == 1 else 0.0)
    hi = w2 + (w1 if p == 0 else 0.0)
    return jnp.stack([lo, hi], axis=axis)


def _prepack_parity(w, scale, shift, parity):
    """Parity-class operands for the fused upsample-conv (see _cell_compute
    ``parity``): fold the per-Cin affine into the 3^3 weights (as _prepack),
    then fold each conv axis to its 2-tap parity equivalent. Returns
    (wt (2, Cout, 4*Cin) bf16, bias_col (Cout, 128) zeros, xshift)."""
    pz, py, px = parity
    cout = int(w.shape[-1])
    cin = int(w.shape[3])
    wf = w.astype(jnp.float32)
    if scale is not None:
        wf = wf * scale.astype(jnp.float32)[None, None, None, :, None]
    xshift = None
    if shift is not None:
        b = shift.astype(jnp.float32)
        if scale is not None:
            a = scale.astype(jnp.float32)
            xshift = jnp.where(a != 0.0, b / jnp.where(a == 0.0, 1.0, a), 0.0)
        else:
            xshift = b
    w2 = _fold_parity(wf, 0, pz)
    w2 = _fold_parity(w2, 1, py)
    w2 = _fold_parity(w2, 2, px)  # (2, 2, 2, cin, cout)
    wt = jnp.transpose(w2, (2, 4, 0, 1, 3)).reshape(2, cout, 4 * cin)
    bias_col = jnp.zeros((cout, 128), jnp.float32)
    return wt.astype(jnp.bfloat16), bias_col, xshift


def _conv_pallas_group(x, w, scale, shift, bias, relu, interpret, tiles,
                       out_dtype=jnp.bfloat16, emit_stats=False):
    """Single Cin-group call: x (Z, Cg, Y, X) -> (Z, Cout, Y, X).

    With ``emit_stats``, also returns the per-Cout fp32 (mean, mean-square)
    of the output — aggregated from per-cell in-kernel partials, saving the
    full-volume XLA reduce the next conv's GroupNorm would otherwise pay."""
    Z, Cin, Y, X = (int(s) for s in x.shape)
    Cout = int(w.shape[-1])
    ZB, YB, _, slide = tiles
    # pad Z to a ZB multiple (zeros; extra rows discarded)
    Zp = _round_up(Z, ZB)

    wt, bias_col, xshift = _prepack(w, scale, shift, bias)

    # pre-shifted input (see _prepack: zero-halo folding) + ONE zero-pad:
    # +1 z both sides (+ZB alignment), +8 y rows both sides (the band DMA's
    # y start must be sublane-aligned). XLA fuses shift+cast into the pad.
    xb = x
    if xshift is not None:
        xb = x.astype(jnp.float32) + xshift[None, :, None, None]
    xb = xb.astype(jnp.bfloat16)
    xp = jnp.pad(xb, ((1, 1 + Zp - Z), (0, 0), (8, 8), (0, 0)))
    xp = xp.reshape(Zp + 2, Cin, (Y + 16) * X)

    n_cells_z = Zp // ZB
    n_cells_y = Y // YB
    grid = (n_cells_z * n_cells_y,)
    N = YB * X
    WL = (YB + 16) * X

    out_specs = pl.BlockSpec(
        (ZB, Cout, N),
        lambda t: (t // n_cells_y, 0, t % n_cells_y),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((Zp, Cout, Y * X), out_dtype)
    if emit_stats:
        n_cells = grid[0]
        out_specs = [
            out_specs,
            pl.BlockSpec((1, Cout, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((n_cells, Cout, 128), jnp.float32),
        ]

    # timing-only ablation hook (tools/conv_ablate.py): numerics are WRONG
    # under any non-empty value — never set outside attribution runs
    ablate = os.environ.get("KM_CONV_ABLATE") or None

    res = pl.pallas_call(
        functools.partial(
            _kernel,
            ZB=ZB, YB=YB, Cg=Cin, X=X, Cout=Cout,
            n_cells_y=n_cells_y, relu=relu, out_dtype=out_dtype,
            Z=Z, emit_stats=emit_stats, slide=slide, ablate=ablate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, Cout, 9 * Cin), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Cout, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, ZB + 2, Cin, WL), jnp.bfloat16),
            pltpu.VMEM(
                ((3 * (ZB + 2) if slide else 9) * Cin, N),
                jnp.bfloat16,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wt, bias_col, xp)
    if emit_stats:
        out, partials = res
        sums = jnp.sum(partials[:, :, :2], axis=0)  # (Cout, 2)
        n = jnp.float32(Z * Y * X)
        stats = (sums[:, 0] / n, sums[:, 1] / n)
        return out.reshape(Zp, Cout, Y, X)[:Z], stats
    return res.reshape(Zp, Cout, Y, X)[:Z]


def _xla_out_stats(out):
    """Per-Cout fp32 (mean, mean-square) of a (Z, Cout, Y, X) output —
    the XLA formulation the in-kernel partials must match."""
    of = out.astype(jnp.float32)
    return jnp.mean(of, axis=(0, 2, 3)), jnp.mean(jnp.square(of), axis=(0, 2, 3))


def _xla_out_stats_flat(out):
    """Flat-layout (Z, Cout, Y*X) version of _xla_out_stats."""
    of = out.astype(jnp.float32)
    return jnp.mean(of, axis=(0, 2)), jnp.mean(jnp.square(of), axis=(0, 2))


def _conv_pallas_group_flat(xf, spatial, c0, w, scale, shift, bias, relu,
                            interpret, tiles, out_dtype=jnp.bfloat16,
                            emit_stats=False, parity=None):
    """Single Cin-group call via the in-kernel-halo kernel: reads channels
    [c0, c0+Cg) of the UNPADDED flat (Z, Cin_total, Y*X) volume directly
    (no padded copy, no host-side channel slice). w/scale/shift are the
    group's slices. Returns flat (Zp, Cout, Y*X).

    ``parity``: (pz, py, px) — fused-upsample-conv mode: ``xf``/``spatial``
    are the LOW-RES tensor and the output is that parity class of the
    conv-on-upsampled result at the same (low-res) shape. 2^3 folded taps
    (_prepack_parity); no bias/stats (the orchestrator owns both)."""
    Z, Y, X = spatial
    Cg = int(w.shape[3])
    Cout = int(w.shape[-1])
    ZB, YB, _, slide = tiles
    Zp = _round_up(Z, ZB)

    if parity is not None:
        assert not emit_stats and bias is None
        wt, bias_col, xshift = _prepack_parity(w, scale, shift, parity)
    else:
        wt, bias_col, xshift = _prepack(w, scale, shift, bias)
    has_shift = xshift is not None
    cvec = jnp.broadcast_to(
        (
            xshift if has_shift else jnp.zeros((Cg,), jnp.float32)
        ).astype(jnp.bfloat16)[:, None],
        (Cg, 128),
    )

    n_cells_z = Zp // ZB
    n_cells_y = Y // YB
    grid = (n_cells_z * n_cells_y,)
    N = YB * X
    WL = (YB + 16) * X

    out_specs = pl.BlockSpec(
        (ZB, Cout, N),
        lambda t: (t // n_cells_y, 0, t % n_cells_y),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((Zp, Cout, Y * X), out_dtype)
    if emit_stats:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, Cout, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((grid[0], Cout, 128), jnp.float32),
        ]

    ablate = os.environ.get("KM_CONV_ABLATE") or None
    n_dx = 3 if parity is None else 2
    n_pairs = 9 if parity is None else 4
    n_dy = 3 if parity is None else 2
    if slide:
        s_rows = (n_dy * (ZB + 2) if parity is None else n_dy * (ZB + 1)) * Cg
    else:
        s_rows = n_pairs * Cg
    res = pl.pallas_call(
        functools.partial(
            _kernel_flat,
            ZB=ZB, YB=YB, Cg=Cg, c0=c0, X=X, Y=Y, Z=Z, Cout=Cout,
            n_cells_y=n_cells_y, relu=relu, out_dtype=out_dtype,
            emit_stats=emit_stats, slide=slide, has_shift=has_shift,
            ablate=ablate, parity=parity,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_dx, Cout, n_pairs * Cg), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Cout, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cg, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, ZB + 2, Cg, WL), jnp.bfloat16),
            pltpu.VMEM((s_rows, N), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wt, bias_col, cvec, xf)
    if emit_stats:
        out, partials = res
        sums = jnp.sum(partials[:, :, :2], axis=0)
        n = jnp.float32(Z * Y * X)
        return out, (sums[:, 0] / n, sums[:, 1] / n)
    return res


def _conv_pallas_flat(xf, spatial, w, scale, shift, bias, relu, interpret,
                      emit_stats=False):
    """Flat (Z, Cin, Y*X) -> flat (Z, Cout, Y*X) via the in-kernel-halo
    kernel. Channel groups beyond the VMEM budget run as independent calls
    reading their slice in-kernel (no host-side slicing), summed here."""
    Z, Y, X = spatial
    Cin = int(xf.shape[1])
    Cout = int(w.shape[-1])
    if Cin < 8:
        # sub-sublane channel counts hit Mosaic DMA limits; zero-pad
        # channels (zero weights -> numerics unchanged)
        pad = 8 - Cin
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        if scale is not None:
            scale = jnp.pad(scale, (0, pad))
        if shift is not None:
            shift = jnp.pad(shift, (0, pad))
        Cin = 8
    xf = xf.astype(jnp.bfloat16)
    tiles = _pick_tiles(Cin, Cout, Y, X)
    assert tiles is not None
    ZB, YB, Cg, slide = tiles
    Zp = _round_up(Z, ZB)

    def grp(c0, with_consts, relu_g, out_dtype, stats_g=False):
        c1 = min(c0 + Cg, Cin)
        return _conv_pallas_group_flat(
            xf, spatial, c0,
            w[:, :, :, c0:c1],
            scale[c0:c1] if scale is not None else None,
            shift[c0:c1] if shift is not None else None,
            bias if with_consts else None,
            relu_g, interpret, tiles,
            out_dtype=out_dtype, emit_stats=stats_g,
        )

    if Cg == Cin:
        res = grp(0, True, relu, jnp.bfloat16, stats_g=emit_stats)
        if emit_stats:
            out, stats = res
            return out[:Z], stats
        return res[:Z]
    # fp32 group outputs keep the cross-group sum at full precision; the
    # single bf16 rounding happens after the sum, like the XLA lowering
    parts = [
        grp(c0, c0 == 0, False, jnp.float32) for c0 in range(0, Cin, Cg)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    if relu:
        out = jnp.maximum(out, 0.0)
    out = out.astype(jnp.bfloat16)[:Z]
    if emit_stats:
        return out, _xla_out_stats_flat(out)
    return out


def _conv_pallas_flat_parts(parts, spatial, w, scale, shift, bias, relu,
                            interpret, emit_stats=False):
    """Multi-source channel groups: the conv input is the CHANNEL
    CONCATENATION of ``parts`` (flat (Z, C_i, Y*X) tensors), but the
    concatenated tensor is never materialized — each Cin group call reads
    its channel slice straight from the part that owns it via the kernel's
    in-kernel ``c0`` offset. This is the U-Net decoder's [skip, upsampled]
    concat input (reference unet3d/buildingblocks.py decoder `torch.cat`):
    the 384-channel concat at d1 / 192-channel at d2 disappears from HBM.

    Returns None when the group size doesn't tile every part (caller falls
    back to the concat path)."""
    Z, Y, X = spatial
    sizes = [int(p.shape[1]) for p in parts]
    Cin = sum(sizes)
    Cout = int(w.shape[-1])
    import math

    g = math.gcd(*sizes)
    tiles = _pick_tiles(Cin, Cout, Y, X, cg_divides=g)
    if tiles is None:
        return None
    ZB, YB, Cg, slide = tiles
    parts = [p.astype(jnp.bfloat16) for p in parts]

    def grp(c0, with_consts, relu_g, out_dtype):
        off = 0
        for p, s in zip(parts, sizes):
            if c0 < off + s:
                break
            off += s
        c1 = min(c0 + Cg, Cin)
        return _conv_pallas_group_flat(
            p, spatial, c0 - off,
            w[:, :, :, c0:c1],
            scale[c0:c1] if scale is not None else None,
            shift[c0:c1] if shift is not None else None,
            bias if with_consts else None,
            relu_g, interpret, tiles,
            out_dtype=out_dtype,
        )

    # >= 2 parts means >= 2 groups: always the fp32 partial-sum path (the
    # single bf16 rounding happens after the cross-group sum, like XLA)
    out = grp(0, True, False, jnp.float32)
    for c0 in range(Cg, Cin, Cg):
        out = out + grp(c0, False, False, jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    out = out.astype(jnp.bfloat16)[:Z]
    if emit_stats:
        return out, _xla_out_stats_flat(out)
    return out


def _upsample2_flat(xb, lo_spatial):
    """Nearest x2 of a flat (Zl, C, Yl*Xl) tensor -> flat (Z, C, Y*X)
    (the U-Net decoder's F.interpolate(mode='nearest') semantics)."""
    Zl, Yl, Xl = lo_spatial
    x4 = xb.reshape(Zl, -1, Yl, Xl)
    x4 = jnp.repeat(jnp.repeat(jnp.repeat(x4, 2, 0), 2, 2), 2, 3)
    return x4.reshape(2 * Zl, -1, 4 * Yl * Xl)


def _conv_pallas_flat_upconv(xa, xb_lo, spatial, w, scale, shift, bias,
                             relu, interpret, emit_stats=False):
    """Fused-upsample decoder conv: input = concat([xa (hi-res skip),
    nearest-x2-upsample(xb_lo)]) along channels, with NEITHER the upsampled
    tensor NOR the concat ever materialized. The hi-res part runs normal
    group calls; the low-res part runs 8 parity-class calls with 2^3
    folded taps (8 instead of 27 MACs per upsampled-input channel — the
    reference decoder's upsample+cat+conv, unet3d/buildingblocks.py), and
    the parity outputs interleave into the hi-res flat layout.

    Returns None when either side has no fitting tile config."""
    Z, Y, X = spatial
    lo = (Z // 2, Y // 2, X // 2)
    Ca = int(xa.shape[1])
    Cb = int(xb_lo.shape[1])
    Cout = int(w.shape[-1])
    tiles_a = _pick_tiles(Ca, Cout, Y, X)
    tiles_b = _pick_tiles(Cb, Cout, lo[1], lo[2])
    if tiles_a is None or tiles_b is None:
        return None
    xa = xa.astype(jnp.bfloat16)
    xb = xb_lo.astype(jnp.bfloat16)
    w_a, w_b = w[:, :, :, :Ca], w[:, :, :, Ca:]
    sc_a = scale[:Ca] if scale is not None else None
    sc_b = scale[Ca:] if scale is not None else None
    sh_a = shift[:Ca] if shift is not None else None
    sh_b = shift[Ca:] if shift is not None else None

    # hi-res skip part (bias rides the first group)
    Cg_a = tiles_a[2]
    out = None
    for c0 in range(0, Ca, Cg_a):
        c1 = min(c0 + Cg_a, Ca)
        part = _conv_pallas_group_flat(
            xa, spatial, c0, w_a[:, :, :, c0:c1],
            sc_a[c0:c1] if sc_a is not None else None,
            sh_a[c0:c1] if sh_a is not None else None,
            bias if c0 == 0 else None, False, interpret, tiles_a,
            out_dtype=jnp.float32,
        )
        out = part if out is None else out + part
    out = out[:Z]

    # low-res part: 8 parity classes, each summed over its Cin groups
    Cg_b = tiles_b[2]
    Zl, Yl, Xl = lo
    pclasses = []
    for pz in (0, 1):
        for py in (0, 1):
            for px in (0, 1):
                acc = None
                for c0 in range(0, Cb, Cg_b):
                    c1 = min(c0 + Cg_b, Cb)
                    part = _conv_pallas_group_flat(
                        xb, lo, c0, w_b[:, :, :, c0:c1],
                        sc_b[c0:c1] if sc_b is not None else None,
                        sh_b[c0:c1] if sh_b is not None else None,
                        None, False, interpret, tiles_b,
                        out_dtype=jnp.float32, parity=(pz, py, px),
                    )
                    acc = part if acc is None else acc + part
                pclasses.append(acc[:Zl])
    # interleave: out[2q+pz, c, 2y+py, 2x+px] = P[pz,py,px][q, c, y, x]
    P = jnp.stack(pclasses).reshape(2, 2, 2, Zl, Cout, Yl, Xl)
    up = jnp.transpose(P, (3, 0, 4, 5, 1, 6, 2)).reshape(Z, Cout, Y * X)

    out = out + up
    if relu:
        out = jnp.maximum(out, 0.0)
    out = out.astype(jnp.bfloat16)
    if emit_stats:
        return out, _xla_out_stats_flat(out)
    return out


def _conv_pallas(x, w, scale, shift, bias, relu, interpret, emit_stats=False):
    """x: (Z, Cin, Y, X) -> (Z, Cout, Y, X). Shapes pre-checked.

    Default path: flatten (y, x) into lanes once and run the in-kernel-halo
    kernel (_kernel_flat) — no padded copy of the volume.
    KM_NO_CONV_FLAT=1 falls back to the padded-copy kernel (_kernel).
    Cin beyond the VMEM budget splits into independent channel-group calls
    summed at the JAX level (in-kernel accumulate-across-revisits crashes
    the tunnel's Mosaic build).
    """
    Z, Cin, Y, X = (int(s) for s in x.shape)
    Cout = int(w.shape[-1])
    if os.environ.get("KM_NO_CONV_FLAT") != "1":
        xf = x.reshape(Z, Cin, Y * X)
        res = _conv_pallas_flat(
            xf, (Z, Y, X), w, scale, shift, bias, relu, interpret,
            emit_stats=emit_stats,
        )
        if emit_stats:
            out, stats = res
            return out.reshape(Z, Cout, Y, X), stats
        return res.reshape(Z, Cout, Y, X)
    if Cin < 8:
        # sub-sublane channel counts (the U-Net's 1-channel first conv) hit
        # Mosaic DMA limits; zero-pad channels to one sublane tile. The
        # padded channels carry zero weights, so numerics are unchanged.
        pad = 8 - Cin
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        if scale is not None:
            scale = jnp.pad(scale, (0, pad))
        if shift is not None:
            shift = jnp.pad(shift, (0, pad))
        Cin = 8
    tiles = _pick_tiles(Cin, Cout, Y, X)
    assert tiles is not None
    ZB, YB, Cg, slide = tiles

    def grp(c0, c1, with_consts, relu_g, out_dtype):
        return _conv_pallas_group(
            x[:, c0:c1],
            w[:, :, :, c0:c1],
            scale[c0:c1] if scale is not None else None,
            shift[c0:c1] if shift is not None else None,
            bias if with_consts else None,
            relu_g,
            interpret,
            (ZB, YB, Cg, slide),
            out_dtype=out_dtype,
        )

    if Cg == Cin:
        return _conv_pallas_group(
            x, w, scale, shift, bias, relu, interpret, tiles,
            out_dtype=jnp.bfloat16, emit_stats=emit_stats,
        )
    # fp32 group outputs keep the cross-group sum at full precision; the
    # single bf16 rounding happens after the sum, like the XLA lowering
    parts = [
        grp(c0, min(c0 + Cg, Cin), c0 == 0, False, jnp.float32)
        for c0 in range(0, Cin, Cg)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    if relu:
        out = jnp.maximum(out, 0.0)
    out = out.astype(jnp.bfloat16)
    if emit_stats:
        # cross-group sums exist only after the JAX-level add: stats come
        # from one XLA reduce of the final tensor here
        return out, _xla_out_stats(out)
    return out


def _conv_xla(x, w, scale, shift, bias, relu, emit_stats=False):
    """Reference lowering on the same (Z, C, Y, X) layout (fallback + VJP).

    Matches the kernel's arithmetic: bf16 inputs/weights, fp32 accumulate.
    """
    xc = x.astype(jnp.float32)
    if scale is not None:
        xc = xc * scale.astype(jnp.float32)[None, :, None, None]
    if shift is not None:
        xc = xc + shift.astype(jnp.float32)[None, :, None, None]
    # (Z, C, Y, X) -> (1, C, Z, Y, X). Operands are rounded to bf16 then
    # lifted to fp32: bf16 x bf16 products are exact in fp32, so this equals
    # the kernel's bf16-multiply/fp32-accumulate arithmetic while keeping
    # the conv primitive single-dtype (its transpose rule rejects mixed).
    lhs = (
        jnp.transpose(xc, (1, 0, 2, 3))[None]
        .astype(jnp.bfloat16)
        .astype(jnp.float32)
    )
    rhs = (
        jnp.transpose(w, (4, 3, 0, 1, 2)).astype(jnp.bfloat16).astype(jnp.float32)
    )  # OIDHW
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32,
    )[0]  # (Cout, Z, Y, X)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[:, None, None, None]
    if relu:
        out = jnp.maximum(out, 0.0)
    out = jnp.transpose(out, (1, 0, 2, 3)).astype(jnp.bfloat16)
    if emit_stats:
        return out, _xla_out_stats(out)
    return out


def fast_conv_enabled():
    """Default on TPU; KM_NO_FAST_CONV=1 disables, KM_FORCE_FAST_CONV=1
    exercises the kernel (interpreted) on CPU for tests."""
    if os.environ.get("KM_NO_FAST_CONV") == "1":
        return False
    if os.environ.get("KM_FORCE_FAST_CONV") == "1":
        return True
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _conv(x, w, scale, shift, bias, relu, emit_stats):
    return _conv_fwd_impl(x, w, scale, shift, bias, relu, emit_stats)


def _conv_fwd_impl(x, w, scale, shift, bias, relu, emit_stats):
    if (
        not fast_conv_enabled()
        or not _shapes_eligible(tuple(int(s) for s in x.shape))
        or _pick_tiles(
            int(x.shape[1]), int(w.shape[-1]), int(x.shape[2]), int(x.shape[3])
        )
        is None
    ):
        return _conv_xla(x, w, scale, shift, bias, relu, emit_stats)
    interpret = jax.default_backend() == "cpu"
    return _conv_pallas(x, w, scale, shift, bias, relu, interpret, emit_stats)


def _conv_fwd(x, w, scale, shift, bias, relu, emit_stats):
    return (
        _conv_fwd_impl(x, w, scale, shift, bias, relu, emit_stats),
        (x, w, scale, shift, bias),
    )


def _conv_bwd_xla(relu, emit_stats, res, g):
    x, w, scale, shift, bias = res
    def f(x_, w_, scale_, shift_, bias_):
        return _conv_xla(x_, w_, scale_, shift_, bias_, relu, emit_stats)
    _, vjp = jax.vjp(f, x, w, scale, shift, bias)
    return vjp(g)


def _conv_bwd(relu, emit_stats, res, g):
    """Backward pass. The input gradient of a 3^3 SAME conv is itself a 3^3
    SAME conv (taps flipped, Cin/Cout transposed), so it rides the SAME
    Pallas kernel that makes the forward fast — XLA's transposed conv on
    this (Z, C, Y, X) layout collapses at small channel counts exactly like
    its forward did (the measured reason KM_TRAIN_FAST_EXTRACT lost,
    PERF.md). The weight/affine/bias gradients are reductions; the weight
    gradient goes through jax.vjp of the XLA formulation (DCE keeps only
    the wgrad conv).

    Forward decomposition: u = a*x + b ; v = conv_W(pad0(u)) + bias ;
    y = relu(v), with stats (mean, msq) of bf16(y) when emit_stats.
    """
    x, w, scale, shift, bias = res
    if not (
        fast_conv_enabled()
        and _shapes_eligible(tuple(int(s) for s in x.shape))
        and _pick_tiles(
            int(w.shape[-1]), int(x.shape[1]), int(x.shape[2]), int(x.shape[3])
        )
        is not None
    ):
        return _conv_bwd_xla(relu, emit_stats, res, g)

    if emit_stats:
        g_y, (g_m, g_m2) = g
    else:
        g_y = g
    g_y = g_y.astype(jnp.float32)

    # recompute the forward output cheaply where needed (relu mask / stats
    # chain); one extra kernel conv is far cheaper than the XLA transposed
    # conv this replaces
    need_y = relu or emit_stats
    y = _conv_fwd_impl(x, w, scale, shift, bias, relu, False) if need_y else None

    if emit_stats:
        # stats = (sum(y)/N, sum(y^2)/N) over (Z, Y, X) per Cout
        n = jnp.float32(x.shape[0] * x.shape[2] * x.shape[3])
        yf = y.astype(jnp.float32)
        g_y = g_y + (
            g_m.astype(jnp.float32)[None, :, None, None]
            + 2.0 * yf * g_m2.astype(jnp.float32)[None, :, None, None]
        ) / n
    if relu:
        g_v = jnp.where(y > 0, g_y, 0.0).astype(jnp.bfloat16)
    else:
        g_v = g_y.astype(jnp.bfloat16)

    # g_u = conv_{W~}(pad0(g_v)): taps flipped, Cin/Cout transposed. The
    # kernel with shift=None runs exact zero-padding semantics.
    w_t = jnp.flip(w, axis=(0, 1, 2))
    w_t = jnp.swapaxes(w_t, 3, 4)  # (3,3,3, Cout, Cin)
    interpret = jax.default_backend() == "cpu"
    g_u = _conv_pallas(
        g_v, w_t, None, None, None, False, interpret
    ).astype(jnp.float32)

    g_x = g_u if scale is None else g_u * scale.astype(jnp.float32)[None, :, None, None]
    g_x = g_x.astype(x.dtype)

    g_scale = None
    if scale is not None:
        g_scale = jnp.sum(
            g_u * x.astype(jnp.float32), axis=(0, 2, 3)
        ).astype(scale.dtype)
    g_shift = None
    if shift is not None:
        g_shift = jnp.sum(g_u, axis=(0, 2, 3)).astype(shift.dtype)
    g_bias = None
    if bias is not None:
        g_bias = jnp.sum(
            g_v.astype(jnp.float32), axis=(0, 2, 3)
        ).astype(bias.dtype)

    # weight gradient as 27 tap-sliced z-batched matmuls in the native
    # (Z, C, Y, X) layout:
    #   dW[dz,dy,dx,ci,co] = sum_{z,y,x} u[z+dz-1,ci,y+dy-1,x+dx-1] g_v[z,co,y,x]
    # XLA's wgrad conv (jax.vjp of the NCDHW conv_general_dilated) was the
    # 256^3 training OOM: its 5-D operands put C in the lane dimension and
    # pad 8-16x (two 8 GB copies for the l0 convs alone). Here every
    # operand keeps X minor; arithmetic matches the conv's
    # bf16-multiply/fp32-accumulate.
    u = x.astype(jnp.float32)
    if scale is not None:
        u = u * scale.astype(jnp.float32)[None, :, None, None]
    if shift is not None:
        u = u + shift.astype(jnp.float32)[None, :, None, None]
    u = u.astype(jnp.bfloat16)
    Z, C, Y, X = (int(s) for s in u.shape)
    up = jnp.pad(u, ((1, 1), (0, 0), (1, 1), (1, 1)))
    g_vb = g_v.astype(jnp.bfloat16)
    taps = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                usl = jax.lax.slice(
                    up, (dz, 0, dy, dx), (dz + Z, C, dy + Y, dx + X)
                )
                taps.append(
                    jnp.sum(
                        jnp.einsum(
                            "zcyx,zkyx->zck", usl, g_vb,
                            preferred_element_type=jnp.float32,
                        ),
                        axis=0,
                    )
                )
    g_w = jnp.stack(taps).reshape(3, 3, 3, C, -1).astype(w.dtype)

    return g_x, g_w, g_scale, g_shift, g_bias


_conv.defvjp(_conv_fwd, _conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6, 7))
def _conv_flat(xf, spatial, w, scale, shift, bias, relu, emit_stats):
    return _conv_flat_fwd_impl(xf, spatial, w, scale, shift, bias, relu,
                               emit_stats)


def _conv_flat_fwd_impl(xf, spatial, w, scale, shift, bias, relu, emit_stats):
    Z, Y, X = spatial
    Cin = int(xf.shape[1])
    if (
        fast_conv_enabled()
        and os.environ.get("KM_NO_CONV_FLAT") != "1"
        and _shapes_eligible((Z, Cin, Y, X))
        and _pick_tiles(max(Cin, 8), int(w.shape[-1]), Y, X) is not None
    ):
        interpret = jax.default_backend() == "cpu"
        return _conv_pallas_flat(
            xf, spatial, w, scale, shift, bias, relu, interpret,
            emit_stats=emit_stats,
        )
    # fallback: round-trip through the 4-D formulation
    res = _conv_fwd_impl(
        xf.reshape(Z, Cin, Y, X), w, scale, shift, bias, relu, emit_stats
    )
    if emit_stats:
        out, stats = res
        return out.reshape(Z, -1, Y * X), stats
    return res.reshape(Z, -1, Y * X)


def _conv_flat_fwd(xf, spatial, w, scale, shift, bias, relu, emit_stats):
    return (
        _conv_flat_fwd_impl(xf, spatial, w, scale, shift, bias, relu,
                            emit_stats),
        (xf, w, scale, shift, bias),
    )


def _conv_flat_bwd(spatial, relu, emit_stats, res, g):
    xf, w, scale, shift, bias = res
    Z, Y, X = spatial
    x = xf.reshape(Z, -1, Y, X)
    if emit_stats:
        g = (g[0].reshape(Z, -1, Y, X), g[1])
    else:
        g = g.reshape(Z, -1, Y, X)
    outs = _conv_bwd(relu, emit_stats, (x, w, scale, shift, bias), g)
    return (outs[0].reshape(Z, -1, Y * X),) + tuple(outs[1:])


_conv_flat.defvjp(_conv_flat_fwd, _conv_flat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 7, 8))
def _conv_flat2(xa, xb, spatial, w, scale, shift, bias, relu, emit_stats):
    return _conv_flat2_fwd_impl(xa, xb, spatial, w, scale, shift, bias,
                                relu, emit_stats)


def _conv_flat2_fwd_impl(xa, xb, spatial, w, scale, shift, bias, relu,
                         emit_stats):
    Z, Y, X = spatial
    Cin = int(xa.shape[1]) + int(xb.shape[1])
    if (
        fast_conv_enabled()
        and os.environ.get("KM_NO_CONV_FLAT") != "1"
        and os.environ.get("KM_NO_CONV_PARTS") != "1"
        and min(int(xa.shape[1]), int(xb.shape[1])) >= 8
        and _shapes_eligible((Z, Cin, Y, X))
    ):
        interpret = jax.default_backend() == "cpu"
        res = _conv_pallas_flat_parts(
            [xa, xb], spatial, w, scale, shift, bias, relu, interpret,
            emit_stats=emit_stats,
        )
        if res is not None:
            return res
    return _conv_flat_fwd_impl(
        jnp.concatenate([xa, xb], axis=1), spatial, w, scale, shift, bias,
        relu, emit_stats,
    )


def _conv_flat2_fwd(xa, xb, spatial, w, scale, shift, bias, relu, emit_stats):
    return (
        _conv_flat2_fwd_impl(xa, xb, spatial, w, scale, shift, bias, relu,
                             emit_stats),
        (xa, xb, w, scale, shift, bias),
    )


def _conv_flat2_bwd(spatial, relu, emit_stats, res, g):
    xa, xb, w, scale, shift, bias = res
    Z, Y, X = spatial
    Ca = int(xa.shape[1])
    x = jnp.concatenate([xa, xb], axis=1).reshape(Z, -1, Y, X)
    if emit_stats:
        g = (g[0].reshape(Z, -1, Y, X), g[1])
    else:
        g = g.reshape(Z, -1, Y, X)
    outs = _conv_bwd(relu, emit_stats, (x, w, scale, shift, bias), g)
    g_x = outs[0].reshape(Z, -1, Y * X)
    return (g_x[:, :Ca], g_x[:, Ca:]) + tuple(outs[1:])


_conv_flat2.defvjp(_conv_flat2_fwd, _conv_flat2_bwd)


def conv3x3_fused_flat_parts(xa, xb, spatial, w, scale=None, shift=None,
                             bias=None, relu=True, emit_stats=False):
    """conv3x3_fused_flat whose input is the channel concat [xa, xb] —
    without materializing the concat (see _conv_pallas_flat_parts).
    KM_NO_CONV_PARTS=1 forces the concat path."""
    return _conv_flat2(xa, xb, spatial, w, scale, shift, bias, relu,
                       emit_stats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 7, 8))
def _conv_upconv(xa, xb_lo, spatial, w, scale, shift, bias, relu, emit_stats):
    return _conv_upconv_fwd_impl(xa, xb_lo, spatial, w, scale, shift, bias,
                                 relu, emit_stats)


def _conv_upconv_fwd_impl(xa, xb_lo, spatial, w, scale, shift, bias, relu,
                          emit_stats):
    Z, Y, X = spatial
    Ca = int(xa.shape[1])
    Cb = int(xb_lo.shape[1])
    if (
        fast_conv_enabled()
        and os.environ.get("KM_NO_CONV_FLAT") != "1"
        and os.environ.get("KM_NO_CONV_UPCONV") != "1"  # default ON (r5 device sweep)
        and min(Ca, Cb) >= 8
        and Z % 2 == 0 and Y % 2 == 0 and X % 2 == 0
        and _shapes_eligible((Z, Ca, Y, X))
        and _shapes_eligible((Z // 2, Cb, Y // 2, X // 2))
    ):
        interpret = jax.default_backend() == "cpu"
        res = _conv_pallas_flat_upconv(
            xa, xb_lo, spatial, w, scale, shift, bias, relu, interpret,
            emit_stats=emit_stats,
        )
        if res is not None:
            return res
    # fallback: materialize the upsample, take the parts path (which
    # itself falls back to concat / XLA as needed)
    xb = _upsample2_flat(xb_lo, (Z // 2, Y // 2, X // 2))
    return _conv_flat2_fwd_impl(xa, xb, spatial, w, scale, shift, bias,
                                relu, emit_stats)


def _conv_upconv_fwd(xa, xb_lo, spatial, w, scale, shift, bias, relu,
                     emit_stats):
    return (
        _conv_upconv_fwd_impl(xa, xb_lo, spatial, w, scale, shift, bias,
                              relu, emit_stats),
        (xa, xb_lo, w, scale, shift, bias),
    )


def _conv_upconv_bwd(spatial, relu, emit_stats, res, g):
    xa, xb_lo, w, scale, shift, bias = res
    Z, Y, X = spatial

    def ref(xa_, xb_, w_, scale_, shift_, bias_):
        x = jnp.concatenate(
            [xa_, _upsample2_flat(xb_, (Z // 2, Y // 2, X // 2))], axis=1
        ).reshape(Z, -1, Y, X)
        r = _conv_xla(x, w_, scale_, shift_, bias_, relu, emit_stats)
        if emit_stats:
            return r[0].reshape(Z, -1, Y * X), r[1]
        return r.reshape(Z, -1, Y * X)

    _, vjp = jax.vjp(ref, xa, xb_lo, w, scale, shift, bias)
    return vjp(g)


_conv_upconv.defvjp(_conv_upconv_fwd, _conv_upconv_bwd)


def conv3x3_fused_flat_upconv(xa, xb_lo, spatial, w, scale=None, shift=None,
                              bias=None, relu=True, emit_stats=False):
    """The decoder's upsample+concat+conv in one op: input is the channel
    concat [xa, nearest_x2(xb_lo)] at hi-res ``spatial``, computed from the
    LOW-RES ``xb_lo`` directly — 2^3 folded parity taps, no upsampled
    tensor, no concat (see _conv_pallas_flat_upconv). Opt-in via
    enabled by default; KM_NO_CONV_UPCONV=1 falls back to upsample + the
    parts path."""
    return _conv_upconv(xa, xb_lo, spatial, w, scale, shift, bias, relu,
                        emit_stats)


def conv3x3_fused_flat(xf, spatial, w, scale=None, shift=None, bias=None,
                       relu=True, emit_stats=False):
    """conv3x3_fused on the flat (Z, Cin, Y*X) lane layout.

    The kernel's native IO form: chained convs (DoubleConv) pass flat
    tensors between stages so the (Y, X)->lanes relayout (measured
    1.6-3.3 ms per 256^3 tensor) is paid once per block, not per conv.
    ``spatial`` is the static (Z, Y, X). Returns flat (Z, Cout, Y*X).
    """
    return _conv_flat(xf, spatial, w, scale, shift, bias, relu, emit_stats)


def conv3x3_fused(x, w, scale=None, shift=None, bias=None, relu=True,
                  emit_stats=False):
    """Fused (per-channel affine) + 3^3 same-conv + bias + (ReLU).

    Args:
        x: (Z, Cin, Y, X) volume (bf16 or fp32; compute is bf16 with fp32
           accumulation either way).
        w: (3, 3, 3, Cin, Cout) HWIO conv weights (flax ``nn.Conv`` layout).
        scale/shift: optional per-Cin affine applied BEFORE the conv — the
           folded form of GroupNorm/InstanceNorm/stateless-BatchNorm once
           their stats are known (reference 'gcr' order,
           unet3d/buildingblocks.py:10-95).
        bias: optional per-Cout conv bias.
        relu: fuse a trailing ReLU.
        emit_stats: also return the per-Cout fp32 (mean, mean-square) of
           the output, aggregated from in-kernel per-cell partials — feeds
           the NEXT conv's GroupNorm without a full-volume reduce.

    Returns:
        (Z, Cout, Y, X) bf16; with ``emit_stats``, (out, (mean, msq)).
    """
    return _conv(x, w, scale, shift, bias, relu, emit_stats)
