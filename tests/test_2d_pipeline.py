"""2D registration pipeline end-to-end (the reference supports dim=2
throughout: CoM2d, UNet2D, 2D aligners, 2D augmentation)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from keymorph_tpu.models import KeyMorph, UNet2D, ConvNet
from keymorph_tpu.ops.resample import align_img
from keymorph_tpu import augment


@pytest.fixture(scope="module")
def km2d():
    km = KeyMorph(
        backbone=UNet2D(out_channels=12, f_maps=4, num_levels=2),
        num_keypoints=12,
        dim=2,
    )
    img = jnp.zeros((1, 1, 24, 24))
    km.init_params(jax.random.PRNGKey(0), img)
    return km


def test_2d_forward_contract(km2d, rng):
    img_f = jnp.asarray(rng.normal(size=(1, 1, 24, 24)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 24, 24)).astype(np.float32))
    res = km2d(img_f, img_m, transform_type=["rigid", "affine", "tps_0.1"],
               return_aligned_points=True)
    for name, r in res.items():
        assert r["grid"].shape == (1, 24, 24, 2)
        assert r["points_f"].shape == (1, 12, 2)
        warped = align_img(r["grid"], img_m)
        assert warped.shape == img_m.shape
        assert np.isfinite(np.asarray(warped)).all()
        if name in ("rigid", "affine"):
            assert r["matrix"].shape == (1, 3, 3)


def test_2d_self_registration(km2d, rng):
    img = jnp.asarray(rng.normal(size=(1, 1, 24, 24)).astype(np.float32))
    res = km2d(img, img, transform_type="affine")
    np.testing.assert_allclose(
        np.asarray(res["affine"]["matrix"])[0], np.eye(3), atol=1e-3
    )


def test_2d_augment_consistency(rng):
    """2D augmentation: impulse follows its keypoint."""
    N = 33
    img = np.zeros((1, 1, N, N), np.float32)
    img[0, 0, 8, 20] = 1.0
    pt = np.array([[[8 / (N - 1) * 2 - 1, 20 / (N - 1) * 2 - 1]]], np.float32)
    params = augment.fixed_affine_params(1, 2, (0.0, 0.1, 0.4, 0.0))
    img_a, pt_a = augment.affine_augment_with_params(
        jnp.asarray(img), params, points=jnp.asarray(pt)
    )
    loc = np.unravel_index(np.argmax(np.asarray(img_a)[0, 0]), (N, N))
    loc_norm = np.asarray(loc) / (N - 1) * 2 - 1
    np.testing.assert_allclose(loc_norm, np.asarray(pt_a)[0, 0], atol=0.15)


def test_2d_convnet_pipeline(rng):
    km = KeyMorph(
        backbone=ConvNet(out_dim=8, dim=2, norm_type="instance"),
        num_keypoints=8,
        dim=2,
    )
    img = jnp.asarray(rng.normal(size=(1, 1, 32, 32)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(1), img)
    pts = np.asarray(km.get_keypoints(img))
    assert pts.shape == (1, 8, 2)
    assert (np.abs(pts) <= 1).all()


def test_2d_train_step(rng):
    from keymorph_tpu.models.keymorph import KeyMorphNet
    from keymorph_tpu.training.config import Config
    from keymorph_tpu.training.train import TrainState, make_optimizer, make_train_step

    net = KeyMorphNet(
        backbone=UNet2D(out_channels=8, f_maps=4, num_levels=2),
        num_keypoints=8,
        dim=2,
    )
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4, dim=2,
        max_random_affine_augment_params=(0.1, 0.1, 0.3, 0.05),
    )
    img = jnp.asarray(rng.normal(size=(2, 1, 16, 16)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    dummy = jnp.zeros((1,), jnp.float32)
    state, metrics = step(state, jax.random.PRNGKey(1), img, img, dummy, dummy, jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
