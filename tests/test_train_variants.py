"""Tests for same-resolution training, keypoint-consistency, profiler flag."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from keymorph_tpu.models import UNet3D
from keymorph_tpu.models.keymorph import KeyMorphNet
from keymorph_tpu.training.config import Config
from keymorph_tpu.training.train import (
    TrainState,
    make_kpconsistency_step,
    make_optimizer,
    make_train_step_sameres,
)


def _net(k=8):
    return KeyMorphNet(
        backbone=UNet3D(out_channels=k, f_maps=4, num_levels=2), num_keypoints=k
    )


def test_sameres_step_runs_at_original_resolution(rng):
    net = _net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        img_size=(8, 8, 8),  # model resolution
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    # original resolution differs from the model resolution
    img_f = jnp.asarray(rng.normal(size=(1, 1, 14, 12, 10)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 14, 12, 10)).astype(np.float32))
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8, 8)), jnp.zeros((1, 1, 8, 8, 8))
    )
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step_sameres(net, config, tx)
    dummy = jnp.zeros((1,), jnp.float32)
    state, metrics = step(state, jax.random.PRNGKey(1), img_f, img_m, dummy, dummy, jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))


def test_kpconsistency_step_converges(rng):
    net = _net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-3,
        kpconsistency_coeff=1.0,
    )
    sub1 = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 10, 10, 10)).astype(np.float32))
    sub2 = sub1 + 0.01  # pretend second modality
    params = net.init(jax.random.PRNGKey(0), sub1, sub1)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_kpconsistency_step(net, config, tx)
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, k = jax.random.split(key)
        state, m = step(state, k, sub1, sub2, jnp.float32(0.2))
        losses.append(float(m["kploss"]))
    assert np.isfinite(losses).all()


def test_run_train_with_kpconsistency(rng, tmp_path):
    """run_train wiring: kp step fires when coeff > 0 and 2 modalities exist."""
    from keymorph_tpu.training.train import make_train_step, run_train

    net = _net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        kpconsistency_coeff=0.5, debug_mode=True,
        save_dir=str(tmp_path),
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    img = rng.normal(size=(1, 10, 10, 10)).astype(np.float32)

    class FakeDS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"img": img}

    batch = ({"img": img[None]}, {"img": img[None]})
    loader = [batch] * 3
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(img[None]), jnp.asarray(img[None]))
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    kp_step = make_kpconsistency_step(net, config, tx)
    state, stats, _ = run_train(
        loader, state, step, config, 1, jax.random.PRNGKey(1),
        kp_step_fn=kp_step, modality_datasets={"T1": FakeDS(), "T2": FakeDS()},
    )
    assert "kploss" in stats
    assert np.isfinite(stats["kploss"])
