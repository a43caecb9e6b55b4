"""Center-of-mass layer tests — ports of reference test/test.py:13-253
(impulse and Gaussian-blurred impulse at odd sizes, batching, ij/xy)."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from keymorph_tpu.models.layers import center_of_mass


def _expected_coord(idx, size):
    # reference convention: linspace(0,1,N)[idx] * 2 - 1
    return (idx / (size - 1)) * 2 - 1


def _com2d(img_bchw, indexing="ij"):
    """Adapter: channel-first (B, C, H, W) like the reference layer."""
    vol = jnp.moveaxis(jnp.asarray(img_bchw), 1, -1)
    return np.asarray(center_of_mass(vol, indexing=indexing))


def _com3d(img_bcdhw, indexing="ij"):
    vol = jnp.moveaxis(jnp.asarray(img_bcdhw), 1, -1)
    return np.asarray(center_of_mass(vol, indexing=indexing))


def test_com2d_impulse_center():
    img = np.zeros((1, 1, 3, 3), np.float32)
    img[0, 0, 1, 1] = 1
    np.testing.assert_allclose(_com2d(img)[0, 0], [0, 0], atol=1e-6)


def test_com2d_impulse_corner_odd():
    img = np.zeros((1, 1, 101, 101), np.float32)
    img[0, 0, 0, 0] = 1
    np.testing.assert_allclose(_com2d(img)[0, 0], [-1, -1], atol=1e-6)
    img = np.zeros((1, 1, 101, 101), np.float32)
    img[0, 0, 100, 100] = 1
    np.testing.assert_allclose(_com2d(img)[0, 0], [1, 1], atol=1e-6)


def test_com2d_rect_nonsquare():
    img = np.zeros((1, 1, 513, 257), np.float32)
    img[0, 0, 170, 200] = 1
    expect = [_expected_coord(170, 513), _expected_coord(200, 257)]
    np.testing.assert_allclose(_com2d(img)[0, 0], expect, atol=1e-5)


def test_com2d_gaussian_blur():
    img = np.zeros((1, 1, 101, 101), np.float32)
    img[0, 0, 30, 60] = 1
    img[0, 0] = gaussian_filter(img[0, 0], sigma=3)
    expect = [_expected_coord(30, 101), _expected_coord(60, 101)]
    np.testing.assert_allclose(_com2d(img)[0, 0], expect, atol=1e-4)


def test_com2d_xy_indexing():
    img = np.zeros((1, 1, 11, 21), np.float32)
    img[0, 0, 2, 15] = 1
    ij = _com2d(img, "ij")[0, 0]
    xy = _com2d(img, "xy")[0, 0]
    np.testing.assert_allclose(ij, xy[::-1], atol=1e-6)
    np.testing.assert_allclose(
        ij, [_expected_coord(2, 11), _expected_coord(15, 21)], atol=1e-5
    )


def test_com3d_impulse():
    img = np.zeros((1, 1, 3, 3, 3), np.float32)
    img[0, 0, 1, 1, 1] = 1
    np.testing.assert_allclose(_com3d(img)[0, 0], [0, 0, 0], atol=1e-6)


def test_com3d_batched_channels():
    img = np.zeros((2, 3, 9, 11, 13), np.float32)
    locs = {}
    rng = np.random.default_rng(3)
    for b in range(2):
        for c in range(3):
            loc = tuple(rng.integers(0, s) for s in (9, 11, 13))
            img[b, c][loc] = 1
            locs[(b, c)] = loc
    out = _com3d(img)
    for (b, c), loc in locs.items():
        expect = [_expected_coord(loc[k], s) for k, s in enumerate((9, 11, 13))]
        np.testing.assert_allclose(out[b, c], expect, atol=1e-5)


def test_com3d_gaussian():
    img = np.zeros((1, 1, 41, 41, 41), np.float32)
    img[0, 0, 10, 20, 30] = 1
    img[0, 0] = gaussian_filter(img[0, 0], sigma=2)
    expect = [_expected_coord(i, 41) for i in (10, 20, 30)]
    np.testing.assert_allclose(_com3d(img)[0, 0], expect, atol=1e-4)


def test_com3d_negative_values_ignored():
    """ReLU clamps negative heatmap mass (reference layers.py:97)."""
    img = np.full((1, 1, 7, 7, 7), -5.0, np.float32)
    img[0, 0, 2, 3, 4] = 1
    expect = [_expected_coord(i, 7) for i in (2, 3, 4)]
    np.testing.assert_allclose(_com3d(img)[0, 0], expect, atol=1e-5)


def test_com3d_grad_flows():
    import jax

    def loss(v):
        return jnp.sum(center_of_mass(v) ** 2)

    v = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 5, 5, 2)).astype(np.float32))
    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
