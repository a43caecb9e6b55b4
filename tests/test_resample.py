"""Resampler parity vs torch.nn.functional.grid_sample (the oracle).

SURVEY §7 names exact grid_sample semantics (border padding,
align_corners=False, xy ordering) the parity killer; these tests pin them
with impulse responses and randomized grids in 2D and 3D, bilinear and
nearest.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from keymorph_tpu.ops.resample import grid_sample, align_img


def _torch_gs(img, grid, mode):
    out = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode="border",
        align_corners=False,
    )
    return out.numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_3d_random(rng, mode):
    img = rng.normal(size=(2, 3, 5, 6, 7)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 4, 5, 6, 3)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode))
    ref = _torch_gs(img, grid, mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_2d_random(rng, mode):
    img = rng.normal(size=(3, 2, 9, 11)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(3, 7, 8, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), mode=mode))
    ref = _torch_gs(img, grid, mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_grid_sample_identity_3d(rng):
    """linspace(-1,1) identity-style grid must reproduce torch exactly
    (this grid is NOT the align_corners=False identity — parity quirk)."""
    img = rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32)
    axes = [np.linspace(-1, 1, 8, dtype=np.float32)] * 3
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)[None]
    grid = g[..., ::-1].copy()  # ij -> xy
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_gs(img, grid, "bilinear")
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_grid_sample_border_extrapolation():
    img = np.arange(8, dtype=np.float32).reshape(1, 1, 2, 4)
    grid = np.array([[[[-3.0, -3.0], [3.0, 3.0]]]], dtype=np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_gs(img, grid, "bilinear")
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours[0, 0, 0], [0.0, 7.0])


def test_align_img_matches_reference_signature(rng):
    img = rng.normal(size=(1, 1, 4, 4, 4)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(1, 4, 4, 4, 3)).astype(np.float32)
    a = align_img(jnp.asarray(grid), jnp.asarray(img))
    b = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(a, b)


def test_impulse_center():
    """Impulse at a known voxel must move exactly under a pure translation grid."""
    img = np.zeros((1, 1, 9, 9, 9), dtype=np.float32)
    img[0, 0, 4, 4, 4] = 1.0
    # identity grid with align_corners=False convention: voxel centers
    axes = [(np.arange(9) + 0.5) / 9 * 2 - 1]
    g = np.stack(np.meshgrid(*(axes * 3), indexing="ij"), axis=-1)[None]
    grid = g[..., ::-1].astype(np.float32).copy()
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-6)
    # shift by exactly one voxel along the first axis
    shift = grid.copy()
    shift[..., 2] += 2.0 / 9.0
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(shift)))
    assert out[0, 0, 3, 4, 4] == pytest.approx(1.0, abs=1e-5)
