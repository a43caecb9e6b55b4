"""Parity: the kernel-layout U-Net executor (models/fast_unet.py) vs the
flax backbone apply, and through the KeyMorphNet keypoint contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_fast_conv(monkeypatch):
    # fixture, not import-time env mutation (collection-time leakage)
    monkeypatch.setenv("KM_FORCE_FAST_CONV", "1")

from keymorph_tpu.models import fast_unet
from keymorph_tpu.models.keymorph import KeyMorphNet
from keymorph_tpu.models.unet import TruncatedUNet3D, UNet3D


def _mk_backbone(cls=TruncatedUNet3D, **kw):
    kw.setdefault("out_channels", 8)
    kw.setdefault("f_maps", 4)
    kw.setdefault("num_levels", 3)
    kw.setdefault("dtype", jnp.bfloat16)
    if cls is TruncatedUNet3D:
        kw.setdefault("num_truncated_layers", 1)
    return cls(**kw)


def _rel_close(a, b, tol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    ref = np.abs(b).max() + 1e-6
    np.testing.assert_allclose(a / ref, b / ref, atol=tol)


def _truth_and_noise_floor(backbone, params, x_cl):
    """fp32 ground truth + the flax bf16 path's own deviation from it.

    bf16 U-Net outputs carry real accumulation noise (the CPU backend even
    accumulates bf16 convs in bf16); the meaningful parity statement is
    that the fast path deviates from the fp32 truth NO MORE than the flax
    bf16 path does (same-arithmetic contract), not bit equality.
    """
    f32 = backbone.clone(dtype=jnp.float32)
    truth = np.asarray(
        f32.apply(params, x_cl.astype(jnp.float32)), np.float32
    )
    flax_out = np.asarray(backbone.apply(params, x_cl), np.float32)
    ref = np.abs(truth).max() + 1e-6
    noise = np.abs(flax_out - truth).max() / ref
    return truth, ref, noise


@pytest.mark.slow
@pytest.mark.parametrize("cls", [TruncatedUNet3D, UNet3D])
def test_fast_unet_matches_flax(rng, cls):
    backbone = _mk_backbone(cls)
    assert fast_unet.supports_fast_unet(backbone)
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 16, 16, 128)).astype(np.float32))
    x_cl = jnp.moveaxis(img, 1, -1).astype(jnp.bfloat16)
    params = backbone.init(jax.random.PRNGKey(0), x_cl)
    truth, ref, noise = _truth_and_noise_floor(backbone, params, x_cl)
    got = np.asarray(
        fast_unet.fast_unet_forward(backbone, params["params"], img), np.float32
    )
    assert got.shape == truth.shape
    fast_err = np.abs(got - truth).max() / ref
    assert fast_err <= 2.0 * noise + 1e-3, (fast_err, noise)


@pytest.mark.slow
def test_fast_unet_all_levels_eligible(rng):
    """Every level lane-eligible (X stays >= 128): full kernel path."""
    backbone = _mk_backbone(num_levels=2)
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 8, 16, 256)).astype(np.float32))
    x_cl = jnp.moveaxis(img, 1, -1).astype(jnp.bfloat16)
    params = backbone.init(jax.random.PRNGKey(0), x_cl)
    truth, ref, noise = _truth_and_noise_floor(backbone, params, x_cl)
    got = np.asarray(
        fast_unet.fast_unet_forward(backbone, params["params"], img), np.float32
    )
    fast_err = np.abs(got - truth).max() / ref
    assert fast_err <= 2.0 * noise + 1e-3, (fast_err, noise)


def test_keymorphnet_fast_extract_keypoints(rng):
    """Keypoints through the fast path land within bf16 noise of the flax
    path (the pipeline-level contract)."""
    backbone = _mk_backbone()
    net_fast = KeyMorphNet(
        backbone=backbone, num_keypoints=8, compute_dtype=jnp.bfloat16,
        fast_extract=True,
    )
    net_slow = net_fast.clone(fast_extract=False)
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 16, 16, 128)).astype(np.float32))
    params = net_slow.init(jax.random.PRNGKey(0), img, img)
    p_slow = net_slow.apply(params, img, method=KeyMorphNet.get_keypoints)
    p_fast = net_fast.apply(params, img, method=KeyMorphNet.get_keypoints)
    assert np.all(np.abs(np.asarray(p_fast)) <= 1.0)
    np.testing.assert_allclose(
        np.asarray(p_fast), np.asarray(p_slow), atol=2e-2
    )


def test_fast_extract_skips_fp32_models(rng):
    """fp32 backbones (no AMP) must NOT route through the bf16 kernel."""
    backbone = _mk_backbone(dtype=jnp.float32)
    assert not fast_unet.supports_fast_unet(backbone)


def test_fast_extract_ineligible_volume_routes_channel_last(rng):
    """Small (lane-ineligible) volumes run fully channel-last — regression
    for the layout mixup a leaked KM_FORCE_FAST_CONV exposed."""
    backbone = _mk_backbone()
    net = KeyMorphNet(
        backbone=backbone, num_keypoints=8, compute_dtype=jnp.bfloat16,
        fast_extract=True,
    )
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 8, 8, 8)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, img)
    pts = net.apply(params, img, method=KeyMorphNet.get_keypoints)
    assert np.all(np.isfinite(np.asarray(pts)))


def test_train_extract_net_env_opt_out(monkeypatch):
    """Training factories default to the fused-kernel extraction (it wins
    on device with the Pallas conv backward, tools/train_step_bench.py);
    KM_TRAIN_FAST_EXTRACT=0 opts the train-step forward back to flax."""
    from keymorph_tpu.models.keymorph import train_extract_net

    net = KeyMorphNet(
        backbone=_mk_backbone(), num_keypoints=8, compute_dtype=jnp.bfloat16
    )
    monkeypatch.delenv("KM_TRAIN_FAST_EXTRACT", raising=False)
    assert train_extract_net(net).fast_extract is True
    monkeypatch.setenv("KM_TRAIN_FAST_EXTRACT", "0")
    assert train_extract_net(net).fast_extract is False
    monkeypatch.setenv("KM_TRAIN_FAST_EXTRACT", "1")
    assert train_extract_net(net).fast_extract is True


@pytest.mark.slow
def test_train_step_through_fast_extract(rng, monkeypatch):
    """A train step with the fused-kernel forward (custom-VJP backward)
    yields finite, decreasing loss on an eligible volume."""
    from keymorph_tpu.training.config import Config
    from keymorph_tpu.training.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    monkeypatch.setenv("KM_TRAIN_FAST_EXTRACT", "1")
    net = KeyMorphNet(
        backbone=_mk_backbone(), num_keypoints=8, compute_dtype=jnp.bfloat16
    )
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-3,
        max_random_affine_augment_params=(0.1, 0.1, 0.5, 0.05),
        max_train_keypoints=None,
    )
    img_f = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 16, 16, 128)).astype(np.float32))
    img_m = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 16, 16, 128)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f, img_m)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, m = step(
            state, sub, img_f, img_m, None, None, jnp.float32(0.0)
        )
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    # per-step keyed augmentation makes the short trajectory noisy; require
    # net progress rather than strict last-vs-first decrease
    assert min(losses[-3:]) < losses[0], losses


def test_maxpool_bwd_matches_reshape_formulation(rng):
    """The layout-native max-pool backward (eq-mask x upsampled g/count)
    must equal differentiating the reshape+max formulation exactly,
    including even tie-splitting (the 7-D windowed VJP it replaces was a
    4 GB lane-padded tensor at 256^3 — the round-5 training OOM)."""
    from keymorph_tpu.models.fast_unet import _maxpool2_reshape, _maxpool2_rw

    for window, shape in (((2, 1, 2, 2), (4, 3, 6, 8)), ((2, 2, 2, 1), (4, 6, 8, 3))):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        x = jnp.round(x * 2) / 2  # quantize -> many exact ties
        g = jnp.asarray(
            rng.normal(size=[s // w for s, w in zip(shape, window)]).astype(
                np.float32
            )
        )
        gn = jax.grad(lambda v: jnp.vdot(_maxpool2_rw(v, window), g))(x)
        gr = jax.grad(lambda v: jnp.vdot(_maxpool2_reshape(v, window), g))(x)
        np.testing.assert_array_equal(np.asarray(gn), np.asarray(gr))


def test_fast_unet_remat_param_names(rng):
    """use_checkpoint wraps blocks in nn.remat, renaming the param
    collections (CheckpointDoubleConv_i); the fast path must resolve them
    (256^3 remat training hit this)."""
    import os

    os.environ["KM_FORCE_FAST_CONV"] = "1"
    try:
        from keymorph_tpu.models import TruncatedUNet3D
        from keymorph_tpu.models.fast_unet import fast_unet_forward

        net = TruncatedUNet3D(
            out_channels=8, f_maps=8, num_levels=2, num_truncated_layers=1,
            dtype=jnp.bfloat16, use_checkpoint=True,
        )
        x_cl = jnp.asarray(
            rng.uniform(0, 1, (1, 32, 32, 32, 1)), jnp.bfloat16
        )
        p = net.init(jax.random.PRNGKey(0), x_cl)
        img = jnp.moveaxis(x_cl, -1, 1).astype(jnp.float32)
        out = fast_unet_forward(net, p["params"], img)
        ref = net.apply(p, x_cl)
        d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
        assert d.max() < 0.15
    finally:
        os.environ.pop("KM_FORCE_FAST_CONV", None)
