"""Kernel-layout U-Net executor: runs the DoubleConv U-Net family on the
fused Pallas conv (ops/pallas/conv3d.py) without per-conv layout churn.

The flax backbone (models/unet.py) computes channel-last; the Pallas conv
wants (Z, C, Y, X) with (y, x) flattened into lanes. Converting per conv
would re-pay the relayouts the kernel exists to avoid, so this module
re-executes the WHOLE network from the flax param tree:

  * levels whose X is a lane multiple (>= 128) run in (Z, C, Y, X) on the
    fused norm+conv+relu kernel — at 256^3 that is encoder levels 1-2 and
    the last decoder, i.e. everything the microbenchmarks showed XLA
    mishandling (tools/conv_microbench.py);
  * deeper levels (XLA already at 45-59 TFLOPS there) run channel-last with
    the same arithmetic as the flax modules;
  * the single entry transpose is free (the input has one channel) and the
    exit transpose is one heatmap relayout.

Numerical contract: identical math to models/unet.py `AbstractUNet`
(basic_module="double", layer_order="gcr"/"cr") in bf16 — GroupNorm fp32
stats with torch eps 1e-5, conv bf16 multiplies with fp32 accumulation,
nearest upsample, 2x max-pool, [skip, x] concat order, final 1x1 conv.
Parity is tested against the flax apply in tests/test_fast_unet.py.

Parity anchor: reference keymorph/unet3d/{model,buildingblocks}.py (the
same network this re-executes); SURVEY §7's "keep the MXU busy" rule.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from keymorph_tpu.ops.pallas import conv3d


def supports_fast_unet(backbone) -> bool:
    """Static check: can this flax backbone module run on the fast path?"""
    from keymorph_tpu.models.unet import AbstractUNet

    return (
        isinstance(backbone, AbstractUNet)
        and backbone.basic_module == "double"
        and backbone.layer_order in ("gcr", "cr")
        and backbone.dim == 3
        and backbone.conv_kernel_size == 3
        and backbone.conv_padding == 1
        and backbone.dtype == jnp.bfloat16
        and not backbone.is_segmentation
    )


def _gn_groups(c: int, num_groups: int) -> int:
    """Group-count rule of models/unet.py SingleConv (reference
    buildingblocks.py:66-72)."""
    if c < num_groups:
        return 1
    if c % num_groups == 0:
        return num_groups
    return next(g for g in range(num_groups, 0, -1) if c % g == 0)


def _channel_stats(x, channel_axis):
    """Per-channel fp32 (mean, mean-square) over all non-channel axes.

    Layout-invariant (a transpose does not change per-channel stats) and
    upsample-invariant (nearest x2 repeats every element 8x, leaving the
    mean and mean-square unchanged) — the decoder exploits both to compute
    its GroupNorm stats on the SMALL pre-upsample / pre-transpose tensors.
    """
    xf = x.astype(jnp.float32)
    axes = tuple(a for a in range(x.ndim) if a != (channel_axis % x.ndim))
    return jnp.mean(xf, axis=axes), jnp.mean(jnp.square(xf), axis=axes)


def _gn_affine_from_stats(stats, gamma, beta, groups):
    """(scale, shift) from per-channel (mean, msq): aggregate each
    (equal-sized) group — algebraically identical to group statistics.
    Stats in fp32 (flax normalization default), eps 1e-5 (torch)."""
    mean_c, msq_c = stats
    C = mean_c.shape[0]
    cg = C // groups
    mean_g = jnp.mean(mean_c.reshape(groups, cg), axis=1)
    var_g = jnp.mean(msq_c.reshape(groups, cg), axis=1) - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + 1e-5)
    gamma = gamma.astype(jnp.float32)
    scale = jnp.repeat(inv_g, cg) * gamma
    shift = beta.astype(jnp.float32) - jnp.repeat(mean_g * inv_g, cg) * gamma
    return scale, shift


def _gn_affine(x, gamma, beta, groups, channel_axis):
    """Per-channel (scale, shift) equivalent of GroupNorm on x."""
    return _gn_affine_from_stats(
        _channel_stats(x, channel_axis), gamma, beta, groups
    )


def _conv_affine(p: Dict[str, Any], cin: int, num_groups: int, stats):
    """(w, scale, shift, bias) kernel operands for a SingleConv param dict
    ('gcr' -> GN folded to a per-channel affine from ``stats``; 'cr' ->
    conv bias only)."""
    w = p["Conv_0"]["kernel"]
    scale = shift = bias = None
    if "GroupNorm_0" in p:
        g = _gn_groups(cin, num_groups)
        scale, shift = _gn_affine_from_stats(
            stats, p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"], g,
        )
    else:
        bias = p["Conv_0"].get("bias")
    return w, scale, shift, bias


def _single_conv_zc(p: Dict[str, Any], x, num_groups: int, relu=True, stats=None,
                    emit_stats=False):
    """'gcr'/'cr' SingleConv on (Z, C, Y, X) via the fused kernel.

    ``stats``: optional precomputed per-channel (mean, msq) for the
    GroupNorm — the decoder supplies stats computed on the pre-upsample /
    pre-transpose tensors (see :func:`_channel_stats`). ``emit_stats``
    additionally returns the OUTPUT's (mean, msq), aggregated from
    in-kernel partials — DoubleConv feeds them to its second conv so the
    intermediate tensor is never re-read for GroupNorm statistics."""
    w, scale, shift, bias = _conv_affine(
        p, int(x.shape[1]), num_groups,
        stats if stats is not None else _channel_stats(x, 1),
    )
    return conv3d.conv3x3_fused(x, w, scale=scale, shift=shift, bias=bias,
                                relu=relu, emit_stats=emit_stats)


@jax.custom_vjp
def _conv_cl(x, w):
    """bf16 channel-last 3^3 same-conv, fp32 accumulate: (Z,Y,X,C)->(Z,Y,X,Co).

    The primal keeps bf16 operands (a single MXU pass); a bf16-operand conv
    with a fp32 preferred_element_type is NOT differentiable (the conv
    transpose rule rejects the mixed-dtype cotangent), so the VJP reruns the
    identical arithmetic with operands rounded to bf16 then lifted to fp32
    (bf16 x bf16 products are exact in fp32) and differentiates that —
    KM_TRAIN_FAST_EXTRACT gradients flow through here.
    """
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )[0]


def _conv_cl_ref(x, w):
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.bfloat16).astype(jnp.float32),
        w.astype(jnp.bfloat16).astype(jnp.float32),
        (1, 1, 1),
        "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )[0]


def _conv_cl_fwd(x, w):
    return _conv_cl(x, w), (x, w)


def _conv_cl_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(_conv_cl_ref, x, w)
    return vjp(g)


_conv_cl.defvjp(_conv_cl_fwd, _conv_cl_bwd)


def _single_conv_cl(p: Dict[str, Any], x, num_groups: int, relu=True, stats=None):
    """'gcr'/'cr' SingleConv on channel-last (Z, Y, X, C) via XLA (the deep
    levels, where XLA is already near roofline)."""
    if "GroupNorm_0" in p:
        g = _gn_groups(x.shape[-1], num_groups)
        scale, shift = _gn_affine_from_stats(
            stats if stats is not None else _channel_stats(x, -1),
            p["GroupNorm_0"]["scale"], p["GroupNorm_0"]["bias"], g,
        )
        x = (x.astype(jnp.float32) * scale + shift).astype(jnp.bfloat16)
    out = _conv_cl(x, p["Conv_0"]["kernel"])
    if "GroupNorm_0" not in p and "bias" in p["Conv_0"]:
        out = out + p["Conv_0"]["bias"].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(jnp.bfloat16)


def _double_conv_flat(p, xf, spatial, num_groups: int, stats0=None, xb=None,
                      xb_lo=False):
    """DoubleConv on the kernel's native flat (Z, C, Y*X) lane layout:
    both convs chained flat — the (Y, X)->lanes relayout is paid once per
    block, not per conv — and conv2's GN affine comes from conv1's
    in-kernel stats, so the intermediate is never re-read.

    ``xb``: optional second flat input — conv1 then runs over the channel
    concat [xf, xb] WITHOUT materializing it (the decoder's
    [skip, upsampled] input; conv3d.conv3x3_fused_flat_parts). ``stats0``
    must then cover the concatenated channels. With ``xb_lo``, ``xb`` is
    the PRE-upsample low-res tensor and conv1 is the fused upsample-conv
    (conv3d.conv3x3_fused_flat_upconv — 2^3 parity taps, no upsampled
    tensor in HBM).

    conv1 emits its output stats in-kernel iff conv2 will normalize
    (KM_NO_CONV_STATS=1 is the kill-switch: falls back to the XLA reduce
    without touching the conv kernel itself).
    """
    wants = (
        "GroupNorm_0" in p["SingleConv_1"]
        and os.environ.get("KM_NO_CONV_STATS") != "1"
    )
    Z, Y, X = spatial
    C = int(xf.shape[1]) + (int(xb.shape[1]) if xb is not None else 0)
    w0, sc0, sh0, b0 = _conv_affine(
        p["SingleConv_0"], C, num_groups,
        stats0 if stats0 is not None else _channel_stats(xf, 1),
    )
    if xb is not None and xb_lo:
        r = conv3d.conv3x3_fused_flat_upconv(
            xf, xb, (Z, Y, X), w0, scale=sc0, shift=sh0, bias=b0,
            emit_stats=wants,
        )
    elif xb is not None:
        r = conv3d.conv3x3_fused_flat_parts(
            xf, xb, (Z, Y, X), w0, scale=sc0, shift=sh0, bias=b0,
            emit_stats=wants,
        )
    else:
        r = conv3d.conv3x3_fused_flat(
            xf, (Z, Y, X), w0, scale=sc0, shift=sh0, bias=b0,
            emit_stats=wants,
        )
    yf, s1 = r if wants else (r, None)
    C1 = int(yf.shape[1])
    w1, sc1, sh1, b1 = _conv_affine(
        p["SingleConv_1"], C1, num_groups,
        s1 if s1 is not None else _channel_stats(yf, 1),
    )
    return conv3d.conv3x3_fused_flat(
        yf, (Z, Y, X), w1, scale=sc1, shift=sh1, bias=b1,
    )


def _double_conv(p, x, fast: bool, num_groups: int, stats0=None):
    if fast:
        Z, C, Y, X = (int(s) for s in x.shape)
        of = _double_conv_flat(
            p, x.reshape(Z, C, Y * X), (Z, Y, X), num_groups, stats0=stats0
        )
        return of.reshape(Z, int(of.shape[1]), Y, X)
    x = _single_conv_cl(p["SingleConv_0"], x, num_groups, stats=stats0)
    return _single_conv_cl(p["SingleConv_1"], x, num_groups)


def _maxpool2_reshape(x, window):
    """Reference 2x max-pool formulation (reshape + multi-axis max)."""
    shape = []
    axes = []
    for i, (s, w) in enumerate(zip(x.shape, window)):
        if w == 2:
            shape.extend([s // 2, 2])
            axes.append(len(shape) - 1)
        else:
            shape.append(s)
    return jnp.max(x.reshape(shape), axis=tuple(axes))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _maxpool2_rw(x, window):
    """2x max-pool via lax.reduce_window — 3.1 ms vs 22.9 ms for the
    reshape+max lowering on the l1 (256,32,256,256) bf16 tensor (the
    7-d reshape forces an 8.9 ms layout copy plus a 13 ms minor-dim
    reduce; the native pooling window avoids both). Identical values;
    the VJP differentiates the reshape formulation instead (its gather-free
    scatter beats SelectAndScatter)."""
    return jax.lax.reduce_window(
        x,
        jnp.array(-jnp.inf, x.dtype),
        jax.lax.max,
        window,
        window,
        "VALID",
    )


def _maxpool2_rw_fwd(x, window):
    return _maxpool2_rw(x, window), x


def _pool_upsample(v, window):
    """Nearest-repeat a pooled tensor back to the pre-pool shape."""
    for ax, w in enumerate(window):
        if w == 2:
            v = jnp.repeat(v, 2, axis=ax)
    return v


def _maxpool2_rw_bwd(window, x, g):
    """Max-pool gradient with ties split evenly (eq/count — the same math
    as differentiating the reshape+max formulation), computed in the
    tensor's native 4-D layout. jax.vjp of _maxpool2_reshape materializes
    the 7-D windowed eq and div tensors, whose layout puts C in the lane
    dimension: at 256^3/C=32 each is lane-padded 4x to 4 GB — the sole
    reason the 256^3 training step exceeded HBM. Here everything is
    (Z, C, Y, X) elementwise + one reduce_window, all X-minor, zero
    padding; mx is recomputed (3 ms) instead of saved."""
    mx = _maxpool2_rw(x, window)
    eq = (x == _pool_upsample(mx, window)).astype(g.dtype)
    cnt = jax.lax.reduce_window(
        eq, jnp.array(0, g.dtype), jax.lax.add, window, window, "VALID"
    )
    return (eq * _pool_upsample(g / cnt, window),)


_maxpool2_rw.defvjp(_maxpool2_rw_fwd, _maxpool2_rw_bwd)


def _maxpool2(x, fast: bool):
    window = (2, 1, 2, 2) if fast else (2, 2, 2, 1)  # (Z,C,Y,X) / (Z,Y,X,C)
    return _maxpool2_rw(x, window)


def _upsample2(x, fast: bool):
    """Nearest x2 (the U-Net decoder's F.interpolate(mode='nearest'))."""
    if fast:  # (Z, C, Y, X)
        x = jnp.repeat(x, 2, axis=0)
        x = jnp.repeat(x, 2, axis=2)
        return jnp.repeat(x, 2, axis=3)
    x = jnp.repeat(x, 2, axis=0)
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _to_cl(x):  # (Z, C, Y, X) -> (Z, Y, X, C)
    return jnp.transpose(x, (0, 2, 3, 1))


def _to_zc(x):  # (Z, Y, X, C) -> (Z, C, Y, X)
    return jnp.transpose(x, (0, 3, 1, 2))


def _block_params(params, i):
    """Resolve DoubleConv block i's param subtree. With use_checkpoint the
    flax module wraps blocks in nn.remat, which prefixes the collection
    name ('CheckpointDoubleConv_{i}'); the fast path reads raw params, so
    accept either name."""
    p = params.get(f"DoubleConv_{i}")
    return p if p is not None else params[f"CheckpointDoubleConv_{i}"]


def _level_fast(spatial):
    Z, Y, X = spatial
    # mirror the conv kernel's lane eligibility (includes the 64^3/32^3
    # deep levels — the whole flagship net then runs channel-first through
    # the flat kernel, with no channel-last segment or transposes)
    return conv3d._shapes_eligible((Z, 8, Y, X))


def fast_unet_forward(backbone, params: Dict[str, Any], img):
    """Run the U-Net from its flax params on the hybrid fast path.

    Args:
        backbone: the flax AbstractUNet module (for static config).
        params: its param subtree (params["params"]["backbone"]).
        img: (B, 1, Z, Y, X) channel-first volume (the pipeline contract).

    Returns:
        (B, *spatial_out, K) channel-last heatmaps — the same contract as
        ``backbone.apply`` gives the keypoint heads.
    """
    from keymorph_tpu.models.unet import number_of_features_per_level

    if isinstance(backbone.f_maps, int):
        f_maps = number_of_features_per_level(backbone.f_maps, backbone.num_levels)
    else:
        f_maps = list(backbone.f_maps)
    L = len(f_maps)
    num_groups = backbone.num_groups
    num_decoders = L - 1 - backbone.num_truncated_layers
    # Block-level rematerialization. nn.remat on the flax module cannot help
    # this path: jax.checkpoint does not see through the conv kernels'
    # custom_vjp, whose residuals (every conv's input) are saved regardless —
    # at 256^3 that is ~25 GB live and the training step exceeds HBM. Wrapping
    # each DoubleConv here instead saves only block boundaries and replays the
    # block (Pallas kernels included) in the backward.
    if backbone.use_checkpoint:
        _ckpt = jax.checkpoint
    else:
        def _ckpt(f):
            return f

    outs = []
    for b in range(img.shape[0]):
        x = jnp.swapaxes(img[b], 0, 1).astype(jnp.bfloat16)  # (Z, 1, Y, X)
        spatial = int(x.shape[0]), int(x.shape[2]), int(x.shape[3])
        fast = _level_fast(spatial)
        xf = None
        if fast:
            # the fast segment carries FLAT (Z, C, Y*X) tensors end-to-end;
            # 4-D re-expansion happens only where pooling/upsampling needs it
            xf = x.reshape(int(x.shape[0]), 1, spatial[1] * spatial[2])
        else:
            # lane-ineligible volumes run fully channel-last (free transpose:
            # the input has one channel)
            x = _to_cl(x)

        # encoder
        skips = []  # (flat | channel-last tensor, fast_layout, spatial)
        for i in range(L):
            if i > 0:
                if fast_prev:
                    Z, Y, X = spatial
                    x = xf.reshape(Z, -1, Y, X)  # pool consumes 4-D
                x = _maxpool2(x, fast_prev)
                spatial = tuple(s // 2 for s in spatial)
                want_fast = _level_fast(spatial)
                if fast_prev and not want_fast:
                    x = _to_cl(x)
                fast = want_fast and fast_prev
                if fast:
                    Z, Y, X = spatial
                    xf = x.reshape(Z, int(x.shape[1]), Y * X)
            if fast:
                xf = _ckpt(
                    lambda p, v, _sp=spatial: _double_conv_flat(
                        p, v, _sp, num_groups
                    )
                )(_block_params(params, i), xf)
                # the skip keeps the kernel's native flat output: the
                # decoder reads it directly (conv3x3_fused_flat_parts) and
                # the old concat-side re-flatten of the skip disappears
                skips.append((xf, True, spatial))
            else:
                x = _ckpt(
                    lambda p, v: _double_conv(p, v, False, num_groups)
                )(_block_params(params, i), x)
                skips.append((x, False, spatial))
            fast_prev = fast

        # decoder (deepest skip is the current x; truncation drops the last
        # decoders — models/unet.py:314-340)
        enc_list = skips[:-1][::-1]
        for i in range(num_decoders):
            enc, enc_fast, enc_sp = enc_list[i]
            dc = _block_params(params, L + i)
            # GroupNorm stats for the first conv, computed on the SMALL
            # pre-upsample / pre-transpose tensors: nearest x2 repeats every
            # element 8x (mean/msq unchanged) and stats are layout-invariant,
            # so the concat's stats are the concat of the parts' stats —
            # this keeps the big upsample+concat tensor out of any reduce.
            stats0 = None
            if "GroupNorm_0" in dc["SingleConv_0"]:
                s_enc = _channel_stats(enc, 1 if enc_fast else -1)
                s_x = _channel_stats(
                    xf if fast else x, 1 if fast else -1
                )
                stats0 = (
                    jnp.concatenate([s_enc[0], s_x[0]]),
                    jnp.concatenate([s_enc[1], s_x[1]]),
                )
            if fast and not enc_fast:
                Z, Y, X = spatial
                x = _to_cl(xf.reshape(Z, -1, Y, X))
                fast = False
            if enc_fast and not fast:
                # lane-ineligible deep level: transpose to zc at the SMALL
                # pre-upsample size and hand the flat low-res tensor over
                x4 = _to_zc(x)
                xf = x4.reshape(int(x4.shape[0]), int(x4.shape[1]), -1)
                fast = True
            if fast:
                spatial = enc_sp
                # upsample+concat+conv in one op: conv1 reads the
                # PRE-upsample flat tensor (conv3x3_fused_flat_upconv:
                # 2^3 parity taps, default ON; KM_NO_CONV_UPCONV=1 falls
                # back to a materialized upsample + the concat-free parts
                # path)
                xf = _ckpt(
                    lambda p, e, b, s0, _sp=spatial: _double_conv_flat(
                        p, e, _sp, num_groups, stats0=s0, xb=b, xb_lo=True
                    )
                )(dc, enc, xf, stats0)
            else:
                x = _upsample2(x, False)
                spatial = enc_sp
                x = jnp.concatenate([enc, x], axis=-1)
                x = _ckpt(
                    lambda p, v, s0: _double_conv(
                        p, v, False, num_groups, stats0=s0
                    )
                )(dc, x, stats0)

        # final 1x1 conv as a channel matmul (XLA's conv lowering of the
        # 1x1 measured 2.2 TFLOPS; the einsum lowers as a clean matmul)
        hw = params["Conv_0"]["kernel"][0, 0, 0].astype(jnp.bfloat16)  # (C, K)
        hb = params["Conv_0"]["bias"].astype(jnp.float32)
        if fast:
            Z, Y, X = spatial
            out = (
                jnp.einsum(
                    "zcn,ck->znk", xf, hw, preferred_element_type=jnp.float32
                )
                + hb
            ).reshape(Z, Y, X, -1)
        else:
            out = (
                jnp.einsum(
                    "zyxc,ck->zyxk", x, hw, preferred_element_type=jnp.float32
                )
                + hb
            )
        outs.append(out.astype(jnp.bfloat16))
    return jnp.stack(outs, axis=0)
