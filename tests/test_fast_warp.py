"""Parity tests for the gather-free Pallas warp (ops/pallas/resample3d.py).

The kernel runs in interpret mode on CPU (KM_FORCE_FAST_WARP=1) against the
XLA gather path — which itself is bit-parity-tested against torch
grid_sample in test_resample.py — so these transitively pin the reference
semantics (border padding, align_corners=False)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keymorph_tpu.ops.pallas import resample3d
from keymorph_tpu.ops.planes import grid_sample_planes


@pytest.fixture(autouse=True)
def _force_fast_warp(monkeypatch):
    monkeypatch.setenv("KM_FORCE_FAST_WARP", "1")


def _smooth_planes(rng, out_spatial, amp=0.05):
    axes = [np.linspace(-1, 1, s) for s in out_spatial]
    zz, yy, xx = np.meshgrid(*axes, indexing="ij")
    pz = zz + amp * np.sin(2.5 * yy + 1.0) - amp * 0.5 * np.cos(2.0 * xx)
    py = yy + amp * np.cos(3.0 * zz) + amp * 0.4 * np.sin(2.0 * xx + 0.3)
    px = xx - amp * np.sin(2.0 * zz + 0.7) + amp * 0.6 * np.cos(2.5 * yy)
    return np.stack([pz, py, px]).astype(np.float32)[None]


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_parity_smooth_flow(rng, mode):
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes), mode)
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes), mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_identity_flow_parity(rng):
    """linspace identity planes (not an exact copy under align_corners=False)."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32), amp=0.0)
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_exact_voxel_centers_copy(rng):
    """Planes hitting exact voxel centers reproduce the source exactly."""
    S = 32
    idx = np.arange(S, dtype=np.float32)
    c = (2.0 * idx + 1.0) / S - 1.0  # voxel centers under align_corners=False
    zz, yy, xx = np.meshgrid(c, c, c, indexing="ij")
    planes = np.stack([zz, yy, xx]).astype(np.float32)[None]
    src = rng.random((1, 1, S, S, S), dtype=np.float32)
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), src, atol=2e-5)


def test_border_clamp_far_outside(rng):
    """Flow pointing far outside [-1, 1] must clamp like the XLA path."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    planes = planes * 3.0 - 1.5  # large offsets, many voxels out of range
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fallback_on_high_frequency_flow(rng):
    """Spans exceeding the windows must take the exact XLA fallback branch."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    zz = np.linspace(-1, 1, 32)
    planes[0, 0] += 0.9 * np.sin(40.0 * zz)[None, :, None]  # wild z-flow
    fits = resample3d._tile_spans_fit(
        jnp.asarray(planes[0]), (32, 32, 32), nearest=False
    )
    assert not bool(fits)
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_channels_and_batch(rng):
    src = rng.random((2, 3, 32, 32, 32), dtype=np.float32)
    planes = np.concatenate(
        [_smooth_planes(rng, (32, 32, 32)), _smooth_planes(rng, (32, 32, 32), 0.08)]
    )
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    assert out.shape == (2, 3, 32, 32, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_out_spatial_differs_from_src(rng):
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (16, 16, 64))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    assert out.shape == (1, 1, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ineligible_shapes_fall_back(rng):
    """Non-tile-divisible shapes route to XLA statically (no kernel)."""
    src = rng.random((1, 1, 18, 18, 18), dtype=np.float32)
    planes = _smooth_planes(rng, (18, 18, 18))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_grad_matches_xla_path(rng):
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))

    def loss_fast(im, pe):
        return jnp.sum(resample3d.warp_planes(im, pe) ** 2)

    def loss_xla(im, pe):
        return jnp.sum(grid_sample_planes(im, pe) ** 2)

    g_fast = jax.grad(loss_fast, argnums=(0, 1))(jnp.asarray(src), jnp.asarray(planes))
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(src), jnp.asarray(planes))
    for a, b in zip(g_fast, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def _grad_pair(src, planes, gseed=7):
    """(pallas-path grads, xla-path grads) of a random-cotangent VJP."""
    img = jnp.asarray(src)
    pe = jnp.asarray(planes)
    out, vjp_fast = jax.vjp(lambda p: resample3d.warp_planes(img, p), pe)
    _, vjp_xla = jax.vjp(lambda p: grid_sample_planes(img, p), pe)
    g = jax.random.normal(jax.random.PRNGKey(gseed), out.shape, jnp.float32)
    return vjp_fast(g)[0], vjp_xla(g)[0]


def test_grad_kernel_smooth_flow(rng):
    """The Pallas grad-wrt-planes kernel matches the XLA VJP elementwise."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    gf, gx = _grad_pair(src, planes)
    # hi/lo bf16 stacking carries ~2^-16 relative matmul error; the clip
    # chain scales grads by S/2, so absolute tolerance scales with S
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-4)


@pytest.mark.slow
def test_grad_kernel_integral_coords(rng):
    """Exactly-integral sample coordinates: the corner-difference gradient
    needs floor(v)+1 in the band even where the forward hat there is zero
    (the grad-span prepass) — and interior integral coords have NONZERO
    gradient (img[lo+1] - img[lo]), unlike a naive hat-derivative."""
    S = 32
    idx = np.arange(S, dtype=np.float32)
    c = (2.0 * idx + 1.0) / S - 1.0  # voxel centers: v exactly integral
    zz, yy, xx = np.meshgrid(c, c, c, indexing="ij")
    planes = np.stack([zz, yy, xx]).astype(np.float32)[None]
    src = rng.random((1, 1, S, S, S), dtype=np.float32)
    gf, gx = _grad_pair(src, planes)
    assert float(jnp.max(jnp.abs(gx))) > 0.1  # the case is non-trivial
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-4)


@pytest.mark.slow
def test_grad_kernel_border_ties_and_outside(rng):
    """Far-outside samples (zero grad), exact border ties (0.5x clip factor),
    and clamped-corner collapse at the true top edge all match XLA."""
    S = 32
    src = rng.random((1, 1, S, S, S), dtype=np.float32)
    planes = _smooth_planes(rng, (S, S, S)) * 3.0 - 1.5
    # plant exact ties: v == 0 at p = 1/S - 1, v == S-1 at p = (2S-1)/S - 1
    planes[0, 0, 0, :2, :] = 1.0 / S - 1.0
    planes[0, 1, 1, :, :2] = (2.0 * S - 1.0) / S - 1.0
    gf, gx = _grad_pair(src, planes)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-4)


@pytest.mark.slow
def test_grad_kernel_channels_chunking(rng, monkeypatch):
    """Multi-channel grads sum over channel chunks exactly."""
    monkeypatch.setattr(resample3d, "_BAND_VMEM_BUDGET", 2 * 2**20)
    src = rng.random((1, 5, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    gf, gx = _grad_pair(src, planes)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-3)


@pytest.mark.slow
def test_grad_kernel_wild_flow_falls_back(rng):
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    zz = np.linspace(-1, 1, 32)
    planes[0, 0] += 0.9 * np.sin(40.0 * zz)[None, :, None]
    gf, gx = _grad_pair(src, planes)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-5)


def test_grad_kernel_kill_switch(rng, monkeypatch):
    """KM_NO_WARP_GRAD=1 must route the VJP back to the XLA path."""
    monkeypatch.setenv("KM_NO_WARP_GRAD", "1")
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    assert resample3d._grad_planes_impl(
        jnp.asarray(src), jnp.asarray(planes),
        jnp.zeros((1, 1, 32, 32, 32), jnp.float32), "bilinear",
    ) is None
    gf, gx = _grad_pair(src, planes)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-6)


def test_grad_kernel_nearest_stays_xla(rng):
    """nearest-mode planes gradient (identically zero) keeps the XLA VJP."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    assert resample3d._grad_planes_impl(
        jnp.asarray(src), jnp.asarray(planes),
        jnp.zeros((1, 1, 32, 32, 32), jnp.float32), "nearest",
    ) is None
    out, vjp = jax.vjp(
        lambda p: resample3d.warp_planes(jnp.asarray(src), p, "nearest"),
        jnp.asarray(planes),
    )
    g = vjp(jnp.ones_like(out))[0]
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0.0)


@pytest.mark.slow
def test_warp_grid_contract(rng):
    """xy-ordered grid entrypoint matches ops.resample.grid_sample."""
    from keymorph_tpu.ops.resample import grid_sample

    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    grid = np.flip(np.moveaxis(planes, 1, -1), axis=-1).copy()
    out = resample3d.warp_grid(jnp.asarray(src), jnp.asarray(grid))
    ref = grid_sample(jnp.asarray(src), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_jit_and_cond_compose(rng):
    """The cond(fits) dispatch must trace cleanly under jit."""
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    f = jax.jit(lambda im, pe: resample3d.warp_planes(im, pe))
    out = f(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_channel_chunking_parity(rng, monkeypatch):
    """Many-channel inputs (one-hot segs) are warped in band-budgeted channel
    chunks; results must match the unchunked/gather path exactly."""
    monkeypatch.setattr(resample3d, "_BAND_VMEM_BUDGET", 200_000)
    src = rng.random((1, 5, 16, 16, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (16, 16, 32))
    assert resample3d._shapes_eligible(src.shape, (16, 16, 32))
    assert resample3d._max_band_channels((16, 16, 32)) < 5  # chunking active
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_band_mode_parity(rng, monkeypatch):
    """KM_WARP_BF16=1: bf16 band + weights, fp32 accumulate — opt-in speed
    mode; error bounded by bf16 rounding of values and hat weights."""
    monkeypatch.setenv("KM_WARP_BF16", "1")
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1.5e-2)
    # and the default path stays tight
    monkeypatch.delenv("KM_WARP_BF16")
    out2 = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("mode,atol", [("fatoh", 2e-5)])
def test_ablate_candidate_modes_parity(rng, mode, atol, monkeypatch):
    """KM_WARP_ABLATE modes that compute real results must stay correct:
    fatoh is the pre-round-3 full (R, B) hat build (the separable build is
    now the default; device-measured 6.4 ms faster at the 256^3 small
    rung). mxuoh was dropped — it crashed the tunnel's Mosaic build."""
    monkeypatch.setenv("KM_WARP_ABLATE", mode)
    src = rng.random((1, 1, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    assert resample3d._tile_spans_fit(
        jnp.asarray(planes)[0], (32, 32, 32), nearest=False
    ), "test flow must exercise the kernel, not the fallback"
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_window_ladder_mid_flow(rng):
    """A flow whose spans exceed the small ladder window but fit the default
    must run the big-window kernel rung (not the XLA fallback) and stay
    exact; guards the adaptive-window dispatch."""
    S = (32, 32, 32)
    src = rng.random((1, 1, *S), dtype=np.float32)
    planes = _smooth_planes(rng, S, amp=0.2)
    spans = resample3d._tile_spans(jnp.asarray(planes)[0], S, nearest=False)
    small, big = (resample3d._effective_win(w, S) for w in resample3d._WIN_LADDER)
    assert not bool(jnp.all(spans <= jnp.asarray(small, jnp.float32)))
    assert bool(jnp.all(spans <= jnp.asarray(big, jnp.float32)))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_band_multichannel(rng, monkeypatch):
    """KM_WARP_BF16 with C>1 exercises the channel-stacked single-width
    matmul; parity within bf16 rounding."""
    monkeypatch.setenv("KM_WARP_BF16", "1")
    src = rng.random((1, 3, 32, 32, 32), dtype=np.float32)
    planes = _smooth_planes(rng, (32, 32, 32))
    out = resample3d.warp_planes(jnp.asarray(src), jnp.asarray(planes))
    ref = grid_sample_planes(jnp.asarray(src), jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1.5e-2)


def test_group_dma_branch_parity(rng, monkeypatch):
    """The one-DMA-per-cell group-band path (taken when a kernel cell's
    union span fits _GROUP_WIN — smooth serving flows) must match the XLA
    path exactly, and the kill-switch must reproduce it via the
    per-sub-tile rungs."""
    from keymorph_tpu.tools.warp_tile_sweep import _rot_scale_planes

    src = rng.random((1, 2, 32, 32, 32), dtype=np.float32)
    planes = jnp.asarray(_rot_scale_planes(32, 2, 1.02))
    spans = resample3d._tile_spans(planes[0], (32, 32, 32), nearest=False)
    gspans = resample3d._group_spans(planes[0], (32, 32, 32), nearest=False)
    # the flow must actually select the group branch
    assert bool(jnp.all(spans <= jnp.asarray((8.0, 24.0, 64.0))))
    assert bool(jnp.all(gspans <= jnp.asarray((32.0, 32.0))))
    ref = grid_sample_planes(jnp.asarray(src), planes)
    out = resample3d.warp_planes(jnp.asarray(src), planes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    monkeypatch.setenv("KM_NO_WARP_GROUP", "1")
    out2 = resample3d.warp_planes(jnp.asarray(src), planes)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)
