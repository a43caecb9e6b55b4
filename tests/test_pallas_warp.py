"""Pallas fused-flow kernels vs the XLA reference path (CPU interpret mode
via the jax CPU lowering of pallas)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from keymorph_tpu.ops.pallas import warp as pw
from keymorph_tpu.ops import coords as C
from keymorph_tpu.ops.resample import grid_sample
from keymorph_tpu.transforms import solvers
from keymorph_tpu.transforms.affine import affine_flow


@pytest.fixture(scope="module")
def tps_setup():
    rng = np.random.default_rng(0)
    ctrl = rng.uniform(-0.7, 0.7, size=(1, 12, 3)).astype(np.float32)
    dst = (ctrl + 0.1 * rng.normal(size=(1, 12, 3))).astype(np.float32)
    theta = solvers.fit_tps(jnp.asarray(ctrl), jnp.asarray(dst), jnp.full((1,), 0.3))
    return jnp.asarray(ctrl), jnp.asarray(dst), theta


def _xla_tps_planes(theta, ctrl, spatial):
    grid_flat = C.flat_norm_grid(spatial)
    moved = solvers.tps_eval(theta, ctrl, grid_flat)  # (1, N, 3) ij
    return jnp.moveaxis(moved.reshape(1, *spatial, 3), -1, 1)


def test_tps_flow_planes_matches_xla(tps_setup):
    ctrl, dst, theta = tps_setup
    spatial = (6, 7, 8)
    ours = np.asarray(pw.tps_flow_planes(theta[0], ctrl[0], spatial, tile=128))
    ref = np.asarray(_xla_tps_planes(theta, ctrl, spatial))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tps_flow_planes_nondivisible_n(tps_setup):
    """N = 5*7*9 = 315, not a multiple of the tile — padded tail must not
    corrupt the live region."""
    ctrl, dst, theta = tps_setup
    spatial = (5, 7, 9)
    ours = np.asarray(pw.tps_flow_planes(theta[0], ctrl[0], spatial, tile=128))
    ref = np.asarray(_xla_tps_planes(theta, ctrl, spatial))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tps_flow_planes_nonpadded_T(tps_setup):
    """T=12 pads to 16 rows; padded control points must not contribute."""
    rng = np.random.default_rng(1)
    ctrl = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 16, 3)).astype(np.float32))
    dst = ctrl + 0.05
    theta = solvers.fit_tps(ctrl, dst, jnp.zeros(1))
    spatial = (4, 4, 8)
    ours = np.asarray(pw.tps_flow_planes(theta[0], ctrl[0], spatial, tile=128))
    ref = np.asarray(_xla_tps_planes(theta, ctrl, spatial))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_tps_flow_planes_pre_matrix(tps_setup):
    """pre_matrix must be equivalent to transforming the query grid before
    spline evaluation (the real-world-coordinate mode's norm->real step)."""
    ctrl, dst, theta = tps_setup
    spatial = (4, 6, 8)
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = np.diag([1.5, 0.8, 1.2])
    M[:3, 3] = [0.1, -0.2, 0.3]
    ours = np.asarray(
        pw.tps_flow_planes(theta[0], ctrl[0], spatial, tile=128, pre_matrix=jnp.asarray(M))
    )
    grid_flat = C.flat_norm_grid(spatial)
    q = C.apply_matrix(jnp.asarray(M)[None], grid_flat)
    moved = solvers.tps_eval(theta, ctrl, q)
    ref = np.asarray(jnp.moveaxis(moved.reshape(1, *spatial, 3), -1, 1))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_affine_flow_planes_matches_reference(rng):
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] += 0.1 * rng.normal(size=(3, 3)).astype(np.float32)
    M[:3, 3] = 0.1 * rng.normal(size=3).astype(np.float32)
    spatial = (5, 6, 7)
    planes = np.asarray(pw.affine_flow_planes(jnp.asarray(M), spatial))
    # xy grid from the standard path, converted to planes
    grid = np.asarray(affine_flow(jnp.asarray(M)[None], spatial))[0]  # (*S, 3) xy
    expect = np.moveaxis(grid[..., ::-1], -1, 0)
    np.testing.assert_allclose(planes, expect, atol=1e-5)


def test_grid_sample_planes_matches_grid_sample(rng):
    img = rng.normal(size=(2, 3, 6, 7, 8)).astype(np.float32)
    planes = rng.uniform(-1.2, 1.2, size=(2, 3, 5, 5, 5)).astype(np.float32)
    ours = np.asarray(pw.grid_sample_planes(jnp.asarray(img), jnp.asarray(planes)))
    # equivalent xy grid
    grid = np.moveaxis(planes, 1, -1)[..., ::-1].copy()
    ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tps_register_warp_end_to_end(tps_setup, rng):
    """Fused path == standard path (grid build + align_img)."""
    ctrl, dst, theta = tps_setup
    img = jnp.asarray(rng.normal(size=(1, 1, 6, 7, 8)).astype(np.float32))
    warped, planes = pw.tps_register_warp(theta, ctrl, img, tile=128)
    # standard path
    grid = np.asarray(pw.planes_to_grid(planes))
    from keymorph_tpu.ops.resample import align_img

    ref = np.asarray(align_img(jnp.asarray(grid), img))
    np.testing.assert_allclose(np.asarray(warped), ref, atol=1e-5)
    # and the planes themselves match the XLA spline evaluation
    ref_planes = np.asarray(_xla_tps_planes(theta, ctrl, (6, 7, 8)))
    np.testing.assert_allclose(np.asarray(planes), ref_planes, atol=1e-4)


def test_affine_register_warp_end_to_end(rng):
    M = np.eye(4, dtype=np.float32)
    M[:3, 3] = [0.1, -0.05, 0.2]
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
    warped, planes = pw.affine_register_warp(jnp.asarray(M)[None], img)
    grid = pw.planes_to_grid(planes)
    from keymorph_tpu.ops.resample import align_img

    ref = np.asarray(align_img(grid, img))
    np.testing.assert_allclose(np.asarray(warped), ref, atol=1e-5)
