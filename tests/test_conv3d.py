"""Parity tests for the fused Pallas conv3x3 kernel (ops/pallas/conv3d.py)
against the XLA lowering of the identical affine+conv+relu composition.

Runs the kernel in interpret mode on the CPU backend (KM_FORCE_FAST_CONV),
the same mechanism the warp kernel's tests use."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keymorph_tpu.ops.pallas import conv3d


@pytest.fixture(autouse=True)
def _force_fast_conv(monkeypatch):
    # fixture (not import-time env mutation): pytest imports every test
    # module at collection, so a module-level setenv would leak into the
    # whole suite run
    monkeypatch.setenv("KM_FORCE_FAST_CONV", "1")


def _mk(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _compare(x, w, scale=None, shift=None, bias=None, relu=True, tol=3e-2):
    got = np.asarray(
        conv3d.conv3x3_fused(x, w, scale=scale, shift=shift, bias=bias, relu=relu)
    ).astype(np.float32)
    want = np.asarray(
        conv3d._conv_xla(x, w, scale, shift, bias, relu)
    ).astype(np.float32)
    assert got.shape == want.shape
    scale_ref = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale_ref, want / scale_ref, atol=tol)


def test_conv_basic(rng):
    x = _mk(rng, (4, 16, 16, 128))
    w = _mk(rng, (3, 3, 3, 16, 32)) * 0.1
    _compare(x, w, relu=False)


def test_conv_relu_bias(rng):
    x = _mk(rng, (4, 8, 16, 128))
    w = _mk(rng, (3, 3, 3, 8, 16)) * 0.1
    b = _mk(rng, (16,))
    _compare(x, w, bias=b, relu=True)


def test_conv_affine_fold(rng):
    """GN-folded per-channel scale/shift before the conv."""
    x = _mk(rng, (4, 16, 16, 128))
    w = _mk(rng, (3, 3, 3, 16, 32)) * 0.1
    a = jnp.abs(_mk(rng, (16,))) + 0.5
    s = _mk(rng, (16,))
    _compare(x, w, scale=a, shift=s, relu=True)


def test_conv_single_channel_input(rng):
    """Cin=1 — the U-Net's first conv."""
    x = _mk(rng, (4, 1, 16, 128))
    w = _mk(rng, (3, 3, 3, 1, 16)) * 0.3
    _compare(x, w, relu=True)


def test_conv_multi_cell_halos(rng):
    """Multiple z cells and y cells: halo DMAs across cell boundaries."""
    x = _mk(rng, (8, 8, 32, 128))
    w = _mk(rng, (3, 3, 3, 8, 16)) * 0.1
    _compare(x, w, relu=False)


def test_conv_cin_chunking(rng):
    """Cin large enough to force K chunking (decoder shapes)."""
    x = _mk(rng, (2, 192, 8, 128))
    w = _mk(rng, (3, 3, 3, 192, 64)) * 0.05
    _compare(x, w, relu=True)


def test_conv_z_not_multiple_of_tile(rng):
    """Z not divisible by ZB exercises the z padding path."""
    x = _mk(rng, (5, 8, 16, 128))
    w = _mk(rng, (3, 3, 3, 8, 16)) * 0.1
    _compare(x, w, relu=False)


def test_conv_ineligible_falls_back(rng):
    """X outside the kernel's lane set ({32, 64, k*128}) routes to XLA
    (still correct)."""
    x = _mk(rng, (4, 8, 16, 48))
    w = _mk(rng, (3, 3, 3, 8, 16)) * 0.1
    _compare(x, w, relu=False, tol=1e-5)


def test_conv_grad_flows(rng):
    """The custom VJP produces finite grads matching the XLA function."""
    x = _mk(rng, (4, 8, 16, 128))
    w = _mk(rng, (3, 3, 3, 8, 16)) * 0.1

    def loss_k(w_):
        return jnp.sum(conv3d.conv3x3_fused(x, w_, relu=True).astype(jnp.float32) ** 2)

    def loss_x(w_):
        return jnp.sum(conv3d._conv_xla(x, w_, None, None, None, True).astype(jnp.float32) ** 2)

    gk = np.asarray(jax.grad(loss_k)(w))
    gx = np.asarray(jax.grad(loss_x)(w))
    assert np.all(np.isfinite(gk))
    ref = np.abs(gx).max() + 1e-6
    np.testing.assert_allclose(gk / ref, gx / ref, atol=3e-2)


def test_conv_emit_stats_single_group(rng):
    """In-kernel per-cell stat partials aggregate to the XLA reduce of the
    returned tensor (Z deliberately not a ZB multiple: pad rows masked)."""
    x = _mk(rng, (10, 16, 16, 128))
    w = _mk(rng, (3, 3, 3, 16, 32)) * 0.1
    scale, shift = _mk(rng, (16,)), _mk(rng, (16,))
    out, (m, m2) = conv3d.conv3x3_fused(x, w, scale=scale, shift=shift,
                                        emit_stats=True)
    out2 = conv3d.conv3x3_fused(x, w, scale=scale, shift=shift)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    mr, m2r = conv3d._xla_out_stats(out2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m2r), atol=1e-4, rtol=1e-5)


def test_conv_emit_stats_multi_group_and_grad(rng, monkeypatch):
    """Cross-group path computes stats on the summed output; gradients flow
    through both the tensor and the stats outputs."""
    monkeypatch.setenv("KM_CONV_TILES", "2,8,8")
    x = _mk(rng, (8, 16, 16, 128))
    w = _mk(rng, (3, 3, 3, 16, 8)) * 0.1
    out, (m, m2) = conv3d.conv3x3_fused(x, w, emit_stats=True)
    mr, m2r = conv3d._xla_out_stats(out)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), atol=1e-5, rtol=1e-5)

    def loss(x_):
        o, (mm, qq) = conv3d.conv3x3_fused(x_, w, emit_stats=True)
        return jnp.sum(o.astype(jnp.float32)) * 1e-3 + jnp.sum(mm) + jnp.sum(qq)

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_conv_pallas_backward_matches_xla(rng, monkeypatch):
    """The hand-written backward (input-gradient rides the Pallas kernel
    with flipped/transposed taps; reductions for affine/bias; XLA wgrad)
    matches the XLA-formulation vjp within bf16 arithmetic noise."""
    x = _mk(rng, (6, 16, 16, 128))
    w = _mk(rng, (3, 3, 3, 16, 32)) * 0.1
    scale, shift = _mk(rng, (16,)), _mk(rng, (16,))

    def loss(x_, w_, scale_, shift_):
        o, (m, m2) = conv3d.conv3x3_fused(x_, w_, scale_, shift_, relu=True,
                                          emit_stats=True)
        return (jnp.sum(o.astype(jnp.float32) ** 2) * 1e-2
                + jnp.sum(m * jnp.arange(32)) + jnp.sum(m2))

    g_fast = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    monkeypatch.setenv("KM_NO_FAST_CONV", "1")
    monkeypatch.delenv("KM_FORCE_FAST_CONV")
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, scale, shift)
    for a, b in zip(g_fast, g_ref):
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        sc = max(np.abs(bn).max(), 1e-6)
        assert np.abs(an - bn).max() / sc < 3e-2


def test_conv_flat_parts_matches_concat(rng):
    """conv3x3_fused_flat_parts([xa, xb]) == conv3x3_fused_flat(concat):
    the decoder's [skip, upsampled] conv without materializing the concat.
    Channel counts force the multi-group path (gcd-aligned groups)."""
    Z, Y, X = 8, 16, 128
    Ca, Cb, Cout = 64, 128, 16
    xa = _mk(rng, (Z, Ca, Y * X)) * 0.5
    xb = _mk(rng, (Z, Cb, Y * X)) * 0.5
    w = _mk(rng, (3, 3, 3, Ca + Cb, Cout)) * 0.05
    scale = _mk(rng, (Ca + Cb,)) * 0.1 + 1.0
    shift = _mk(rng, (Ca + Cb,)) * 0.1
    for emit in (False, True):
        got = conv3d.conv3x3_fused_flat_parts(
            xa, xb, (Z, Y, X), w, scale=scale, shift=shift, emit_stats=emit
        )
        want = conv3d.conv3x3_fused_flat(
            jnp.concatenate([xa, xb], axis=1), (Z, Y, X), w,
            scale=scale, shift=shift, emit_stats=emit,
        )
        if emit:
            got, gs = got
            want, ws = want
            for a, b in zip(gs, ws):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-2
                )
        an = np.asarray(got, np.float32)
        bn = np.asarray(want, np.float32)
        sc = np.abs(bn).max() + 1e-6
        np.testing.assert_allclose(an / sc, bn / sc, atol=3e-2)


def test_conv_flat_parts_grad_matches_concat(rng):
    """The parts conv's VJP (concat in backward only) matches
    differentiating the concat formulation."""
    Z, Y, X = 4, 16, 128
    Ca, Cb, Cout = 64, 64, 8
    xa = _mk(rng, (Z, Ca, Y * X)) * 0.5
    xb = _mk(rng, (Z, Cb, Y * X)) * 0.5
    w = _mk(rng, (3, 3, 3, Ca + Cb, Cout)) * 0.05

    def loss_parts(xa_, xb_, w_):
        o = conv3d.conv3x3_fused_flat_parts(xa_, xb_, (Z, Y, X), w_)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_concat(xa_, xb_, w_):
        o = conv3d.conv3x3_fused_flat(
            jnp.concatenate([xa_, xb_], axis=1), (Z, Y, X), w_
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_parts = jax.grad(loss_parts, argnums=(0, 1, 2))(xa, xb, w)
    g_concat = jax.grad(loss_concat, argnums=(0, 1, 2))(xa, xb, w)
    for a, b in zip(g_parts, g_concat):
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        sc = max(np.abs(bn).max(), 1e-6)
        assert np.abs(an - bn).max() / sc < 3e-2


def test_conv_flat_parts_misaligned_falls_back(rng):
    """Part sizes whose gcd admits no fitting group size fall back to the
    concat path (still correct)."""
    Z, Y, X = 4, 16, 128
    xa = _mk(rng, (Z, 24, Y * X)) * 0.5
    xb = _mk(rng, (Z, 40, Y * X)) * 0.5
    w = _mk(rng, (3, 3, 3, 64, 8)) * 0.05
    got = conv3d.conv3x3_fused_flat_parts(xa, xb, (Z, Y, X), w)
    want = conv3d.conv3x3_fused_flat(
        jnp.concatenate([xa, xb], axis=1), (Z, Y, X), w
    )
    an, bn = np.asarray(got, np.float32), np.asarray(want, np.float32)
    sc = np.abs(bn).max() + 1e-6
    np.testing.assert_allclose(an / sc, bn / sc, atol=3e-2)


def _upconv_ref(xa, xb_lo, spatial, w, scale=None, shift=None, bias=None,
                relu=True):
    Z, Y, X = spatial
    xb = conv3d._upsample2_flat(xb_lo, (Z // 2, Y // 2, X // 2))
    x = jnp.concatenate([xa, xb], axis=1).reshape(Z, -1, Y, X)
    return conv3d._conv_xla(x, w, scale, shift, bias, relu).reshape(
        Z, -1, Y * X
    )


def test_conv_upconv_matches_upsample_concat(rng, monkeypatch):
    """The fused-upsample parity conv == conv over [skip, nearest_x2(x)]."""
    monkeypatch.setenv("KM_CONV_UPCONV", "1")
    Z, Y, X = 8, 16, 128
    Ca, Cb, Cout = 16, 32, 16
    xa = _mk(rng, (Z, Ca, Y * X)) * 0.5
    xb = _mk(rng, (Z // 2, Cb, (Y // 2) * (X // 2))) * 0.5
    w = _mk(rng, (3, 3, 3, Ca + Cb, Cout)) * 0.05
    scale = _mk(rng, (Ca + Cb,)) * 0.1 + 1.0
    shift = _mk(rng, (Ca + Cb,)) * 0.1
    b = _mk(rng, (Cout,)) * 0.1
    for emit in (False, True):
        got = conv3d.conv3x3_fused_flat_upconv(
            xa, xb, (Z, Y, X), w, scale=scale, shift=shift, bias=b,
            emit_stats=emit,
        )
        if emit:
            got, _ = got
        want = _upconv_ref(xa, xb, (Z, Y, X), w, scale, shift, b)
        an = np.asarray(got, np.float32)
        bn = np.asarray(want, np.float32)
        sc = np.abs(bn).max() + 1e-6
        np.testing.assert_allclose(an / sc, bn / sc, atol=3e-2)


@pytest.mark.parametrize("slide", ["0", "1"])
def test_conv_upconv_z_edges(rng, monkeypatch, slide):
    """Parity taps at the z/y/x volume edges (halo fills) stay exact; also
    multi-group Cin, a non-ZB-multiple low-res Z, and both stack paths."""
    monkeypatch.setenv("KM_CONV_UPCONV", "1")
    if slide == "0":
        monkeypatch.setenv("KM_NO_CONV_SLIDE", "1")
    Z, Y, X = 12, 16, 128
    Ca, Cb, Cout = 64, 128, 8
    xa = _mk(rng, (Z, Ca, Y * X)) * 0.5
    xb = _mk(rng, (Z // 2, Cb, (Y // 2) * (X // 2))) * 0.5
    w = _mk(rng, (3, 3, 3, Ca + Cb, Cout)) * 0.05
    got = conv3d.conv3x3_fused_flat_upconv(xa, xb, (Z, Y, X), w, relu=False)
    want = _upconv_ref(xa, xb, (Z, Y, X), w, relu=False)
    an, bn = np.asarray(got, np.float32), np.asarray(want, np.float32)
    sc = np.abs(bn).max() + 1e-6
    np.testing.assert_allclose(an / sc, bn / sc, atol=3e-2)


def test_conv_upconv_grad(rng, monkeypatch):
    """VJP (XLA reference through upsample+concat) matches differentiating
    the reference formulation directly."""
    monkeypatch.setenv("KM_CONV_UPCONV", "1")
    Z, Y, X = 4, 16, 128
    Ca, Cb, Cout = 16, 16, 8
    xa = _mk(rng, (Z, Ca, Y * X)) * 0.5
    xb = _mk(rng, (Z // 2, Cb, (Y // 2) * (X // 2))) * 0.5
    w = _mk(rng, (3, 3, 3, Ca + Cb, Cout)) * 0.05

    def loss_fused(xa_, xb_, w_):
        o = conv3d.conv3x3_fused_flat_upconv(xa_, xb_, (Z, Y, X), w_)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(xa_, xb_, w_):
        o = _upconv_ref(xa_, xb_, (Z, Y, X), w_)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(xa, xb, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xa, xb, w)
    for a, b in zip(g_fused, g_ref):
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        sc = max(np.abs(bn).max(), 1e-6)
        assert np.abs(an - bn).max() / sc < 3e-2
