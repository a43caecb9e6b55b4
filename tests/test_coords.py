"""Coordinate-conversion parity tests.

Ports the analytic conventions of reference test/test.py:550-719
(TestRealWorldCoordinates): the align_corners=False pin (-1 <-> -0.5 voxel),
round-trips through voxel and real-world space, and flow normalization.
"""

import numpy as np
import jax.numpy as jnp

from keymorph_tpu.ops import coords as C


def test_norm2voxel_endpoints():
    # -1 -> -0.5, +1 -> N-0.5 (align_corners=False), center 0 -> (N-1)/2... no:
    # 0 -> N/2 - 0.5
    sizes = (8, 16, 32)
    pts = jnp.array([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]])
    vox = C.convert_points_norm2voxel(pts, sizes)
    np.testing.assert_allclose(vox[0, 0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(vox[0, 1], [7.5, 15.5, 31.5])
    np.testing.assert_allclose(vox[0, 2], [3.5, 7.5, 15.5])


def test_norm_voxel_roundtrip(rng):
    sizes = (9, 17, 33)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(2, 50, 3)).astype(np.float32))
    back = C.convert_points_voxel2norm(C.convert_points_norm2voxel(pts, sizes), sizes)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_voxel_real_roundtrip(rng):
    aff = np.eye(4, dtype=np.float32)
    aff[:3, :3] = rng.normal(size=(3, 3)) + np.eye(3) * 3
    aff[:3, 3] = rng.normal(size=3) * 10
    aff = jnp.asarray(aff)[None]
    pts = jnp.asarray(rng.uniform(0, 30, size=(1, 40, 3)).astype(np.float32))
    real = C.convert_points_voxel2real(pts, aff)
    back = C.convert_points_real2voxel(real, aff)
    np.testing.assert_allclose(back, pts, atol=1e-3)
    # against plain numpy homogeneous transform
    homog = np.concatenate([np.asarray(pts)[0], np.ones((40, 1))], axis=-1)
    expect = (np.asarray(aff)[0] @ homog.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(real)[0], expect, rtol=1e-4, atol=1e-3)


def test_norm_real_roundtrip(rng):
    sizes = (12, 14, 16)
    aff = np.eye(4, dtype=np.float32)
    aff[:3, :3] = np.diag([1.25, 1.25, 10.0])
    aff[:3, 3] = [-80, -100, 50]
    aff = jnp.asarray(aff)[None]
    pts = jnp.asarray(rng.uniform(-1, 1, size=(1, 25, 3)).astype(np.float32))
    real = C.convert_points_norm2real(pts, aff, sizes)
    back = C.convert_points_real2norm(real, aff, sizes)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_flow_voxel2norm_matches_pointwise():
    sizes = (4, 6, 8)
    flow = jnp.asarray(
        np.random.default_rng(1).uniform(0, 4, size=(1, 4, 6, 8, 3)).astype(np.float32)
    )
    out = C.convert_flow_voxel2norm(flow, sizes)
    expect = 2 * (np.asarray(flow) + 0.5) / np.asarray(sizes) - 1
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-7)


def test_uniform_norm_grid_endpoints():
    g = C.uniform_norm_grid((3, 5))
    assert g.shape == (3, 5, 2)
    np.testing.assert_allclose(g[0, 0], [-1, -1])
    np.testing.assert_allclose(g[-1, -1], [1, 1])
    np.testing.assert_allclose(g[1, 2], [0, 0])


def test_apply_matrix_identity(rng):
    pts = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    m = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    np.testing.assert_allclose(C.apply_matrix(m, pts), pts, atol=1e-6)
