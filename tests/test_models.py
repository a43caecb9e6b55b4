"""Backbone + pipeline tests: shapes, jit-ability, end-to-end forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from keymorph_tpu.models import ConvNet, UNet3D, UNet2D, TruncatedUNet3D, SimpleUnet
from keymorph_tpu.models.keymorph import (
    KeyMorph,
    KeyMorphNet,
    parse_transform_type,
    is_supported_transform_type,
    sample_tps_lmbda,
)


def test_parse_transform_type():
    assert parse_transform_type("affine") == ("affine", None)
    assert parse_transform_type("rigid") == ("rigid", None)
    assert parse_transform_type("tps_0.1") == ("tps", 0.1)
    assert parse_transform_type("tps_0") == ("tps", 0.0)
    assert parse_transform_type("tps_loguniform") == ("tps", "loguniform")
    assert is_supported_transform_type("tps_10")
    assert not is_supported_transform_type("bspline")


def test_sample_tps_lmbda():
    key = jax.random.PRNGKey(0)
    const = np.asarray(sample_tps_lmbda(key, 4, 0.5))
    np.testing.assert_allclose(const, 0.5)
    uni = np.asarray(sample_tps_lmbda(key, 1000, "uniform", 10.0))
    assert 0 <= uni.min() and uni.max() <= 10.0
    logu = np.asarray(sample_tps_lmbda(key, 1000, "loguniform", 10.0))
    assert 1e-6 <= logu.min() and logu.max() <= 10.0
    # loguniform should produce plenty of tiny values
    assert (logu < 0.01).mean() > 0.3


def test_unet3d_shapes():
    model = UNet3D(out_channels=8, f_maps=4, num_levels=3)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 8)


@pytest.mark.slow
def test_unet2d_shapes():
    model = UNet2D(out_channels=4, f_maps=4, num_levels=3)
    x = jnp.zeros((2, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 32, 32, 4)


def test_truncated_unet3d_reduced_resolution():
    model = TruncatedUNet3D(out_channels=8, f_maps=4, num_levels=3, num_truncated_layers=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    # one decoder dropped -> output at half resolution
    assert y.shape == (1, 8, 8, 8, 8)


def test_convnet_shapes():
    model = ConvNet(out_dim=8, dim=2, norm_type="instance")
    x = jnp.zeros((1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 2, 2, 8)  # 16x downsample


@pytest.mark.slow
def test_simple_unet_shapes():
    model = SimpleUnet(out_channels=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 16, 1)


@pytest.fixture(scope="module")
def small_keymorph():
    backbone = UNet3D(out_channels=16, f_maps=2, num_levels=2)
    km = KeyMorph(backbone=backbone, num_keypoints=16, dim=3)
    img = jnp.zeros((1, 1, 12, 12, 12))
    km.init_params(jax.random.PRNGKey(0), img)
    return km


def test_keymorph_keypoints_in_range(small_keymorph, rng):
    img = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    pts = np.asarray(small_keymorph.get_keypoints(img))
    assert pts.shape == (1, 16, 3)
    assert (pts >= -1).all() and (pts <= 1).all()


def test_keymorph_forward_contract(small_keymorph, rng):
    img_f = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    res = small_keymorph(
        img_f,
        img_m,
        transform_type=["rigid", "affine", "tps_0.1"],
        return_aligned_points=True,
    )
    assert set(res.keys()) == {"rigid", "affine", "tps_0.1"}
    for name, r in res.items():
        assert r["grid"].shape == (1, 12, 12, 12, 3)
        assert r["points_f"].shape == (1, 16, 3)
        assert r["points_a"].shape == (1, 16, 3)
        assert r["time"] >= 0
        if name in ("rigid", "affine"):
            assert r["matrix"].shape == (1, 4, 4)
        if name.startswith("tps"):
            np.testing.assert_allclose(np.asarray(r["tps_lmbda"]), 0.1)


def test_keymorph_self_registration_identity(small_keymorph, rng):
    """Registering an image to itself must give an identity transform."""
    img = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    res = small_keymorph(img, img, transform_type="affine")
    m = np.asarray(res["affine"]["matrix"])[0]
    np.testing.assert_allclose(m, np.eye(4), atol=1e-3)


@pytest.mark.slow
def test_keymorph_weighted_variants(rng):
    backbone = UNet3D(out_channels=8, f_maps=2, num_levels=2)
    for weighting in ("power", "variance"):
        km = KeyMorph(
            backbone=backbone, num_keypoints=8, dim=3, weight_keypoints=weighting
        )
        img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
        km.init_params(jax.random.PRNGKey(1), img)
        res = km(img, img, transform_type="affine")
        w = np.asarray(res["affine"]["points_weights"])
        assert w.shape == (1, 8)
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-4)


def test_keymorph_train_subsampling(rng):
    backbone = UNet3D(out_channels=32, f_maps=2, num_levels=2)
    km = KeyMorph(backbone=backbone, num_keypoints=32, dim=3, max_train_keypoints=8)
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(2), img)
    km.train()
    res = km(img, img, transform_type="tps_0.5")
    assert res["tps_0.5"]["points_f"].shape == (1, 8, 3)


def test_keymorph_groupwise(rng):
    backbone = UNet3D(out_channels=8, f_maps=2, num_levels=2)
    km = KeyMorph(backbone=backbone, num_keypoints=8, dim=3)
    imgs = jnp.asarray(rng.normal(size=(4, 1, 8, 8, 8)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(3), imgs[:1])
    res = km.groupwise_register(imgs, transform_type=["affine"], num_iters=2)
    r = res["affine"]
    assert r["grouppoints_m"].shape == (4, 8, 3)
    assert r["grouppoints_a"].shape == (4, 8, 3)
    assert r["groupgrids"].shape == (4, 8, 8, 8, 3)
    # aligned points should be closer to their mean than the originals
    spread = lambda p: float(np.mean(np.var(np.asarray(p), axis=0)))
    assert spread(r["grouppoints_a"]) <= spread(r["grouppoints_m"]) + 1e-6


@pytest.mark.slow
def test_keymorph_bf16_amp(rng):
    backbone = UNet3D(out_channels=8, f_maps=2, num_levels=2, dtype=jnp.bfloat16)
    km = KeyMorph(backbone=backbone, num_keypoints=8, dim=3, use_amp=True)
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(4), img)
    pts = km.get_keypoints(img)
    # keypoints must come out fp32 (CoM is fp32 regardless of backbone dtype)
    assert pts.dtype == jnp.float32


@pytest.mark.slow
def test_keymorph_residual_backbone_end_to_end(rng):
    """Residual/SE backbones drive the full registration pipeline."""
    from keymorph_tpu.models import ResidualUNetSE3D

    backbone = ResidualUNetSE3D(out_channels=8, f_maps=4, num_levels=2)
    km = KeyMorph(backbone=backbone, num_keypoints=8, dim=3)
    img_f = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(5), img_f)
    res = km(img_f, img_m, transform_type=["affine", "tps_1"])
    for r in res.values():
        assert r["grid"].shape == (1, 12, 12, 12, 3)
        assert np.isfinite(np.asarray(r["grid"])).all()
        assert (np.abs(np.asarray(r["points_f"])) <= 1).all()


def test_align_pair_tps_centers_grid_and_planes(rng):
    """align_pair(tps_centers=S): the grid comes from the S-center
    approximate spline, and the planes serving path agrees with the grid
    path under the same approximation."""
    from keymorph_tpu.models.keymorph import align_pair
    from keymorph_tpu.transforms import solvers
    from keymorph_tpu.ops import coords as C

    pf = jnp.asarray(rng.uniform(-0.6, 0.6, size=(1, 20, 3)).astype(np.float32))
    pm = pf + jnp.asarray(0.07 * rng.normal(size=(1, 20, 3)).astype(np.float32))
    spatial = (8, 8, 8)
    lmbda = jnp.asarray([0.1])
    S = 12
    res = align_pair(
        pf, pm, "tps", spatial, lmbda=lmbda, num_chunks=1,
        compute_aligned_points=True, tps_centers=S,
    )
    theta = solvers.fit_tps_approximate(pf, pm, lmbda, S)
    pts = jnp.broadcast_to(C.flat_norm_grid(spatial), (1, 512, 3))
    moved = solvers.tps_eval(theta, pf[:, :S], pts)
    expect = np.asarray(jnp.flip(moved.reshape(1, *spatial, 3), axis=-1))
    np.testing.assert_allclose(np.asarray(res["grid"]), expect, atol=1e-5)
    assert res["points_a"].shape == (1, 20, 3)

    res_planes = align_pair(
        pf, pm, "tps", spatial, lmbda=lmbda, num_chunks=1,
        compute_grid="planes", tps_centers=S,
    )
    expect_planes = jnp.flip(jnp.moveaxis(res["grid"], -1, 1), axis=1)
    np.testing.assert_allclose(
        np.asarray(res_planes["planes"]), np.asarray(expect_planes), atol=2e-4
    )
    # S >= K must reduce to the exact path
    res_exact = align_pair(pf, pm, "tps", spatial, lmbda=lmbda, num_chunks=1)
    res_full = align_pair(
        pf, pm, "tps", spatial, lmbda=lmbda, num_chunks=1, tps_centers=20
    )
    np.testing.assert_allclose(
        np.asarray(res_full["grid"]), np.asarray(res_exact["grid"]), atol=1e-6
    )


def test_keymorph_num_tps_centers_serving(rng):
    """KeyMorph(num_tps_centers=S) applies the approximate solver at serving
    time only; training keeps the exact fit."""
    backbone = UNet3D(out_channels=16, f_maps=2, num_levels=2)
    km = KeyMorph(
        backbone=backbone, num_keypoints=16, dim=3, num_tps_centers=8,
        max_train_keypoints=None,
    )
    img = jnp.zeros((1, 1, 12, 12, 12))
    km.init_params(jax.random.PRNGKey(0), img)
    img_f = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))

    res = km(img_f, img_m, transform_type="tps_0.1")["tps_0.1"]
    assert res["grid"].shape == (1, 12, 12, 12, 3)

    # the serving grid equals the approximate composition on its keypoints
    from keymorph_tpu.models.keymorph import align_pair

    expect = align_pair(
        res["points_f"], res["points_m"], "tps", (12, 12, 12),
        lmbda=jnp.asarray([0.1]), num_chunks=km.num_subgrids, tps_centers=8,
    )["grid"]
    np.testing.assert_allclose(
        np.asarray(res["grid"]), np.asarray(expect), atol=5e-4
    )

    # training mode: exact solver (different grid unless S-center spline
    # happens to coincide — it must match the EXACT composition instead)
    km.train()
    res_t = km(img_f, img_m, transform_type="tps_0.1")["tps_0.1"]
    expect_t = align_pair(
        res_t["points_f"], res_t["points_m"], "tps", (12, 12, 12),
        lmbda=jnp.asarray([0.1]), num_chunks=1,
    )["grid"]
    np.testing.assert_allclose(
        np.asarray(res_t["grid"]), np.asarray(expect_t), atol=5e-4
    )
    km.eval()
