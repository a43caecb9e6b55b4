"""Coordinate-plane flow helpers (ops/planes.py) vs the standard grid path.

(The Pallas TPS flow kernel these once accompanied was removed in round 2:
device traces showed XLA's fused chunk path beats it — see PERF.md.)
"""

import numpy as np
import jax.numpy as jnp

from keymorph_tpu.ops import planes as pw
from keymorph_tpu.ops.resample import grid_sample, align_img
from keymorph_tpu.transforms.affine import affine_flow


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


def test_affine_register_warp_end_to_end(rng):
    M = np.eye(4, dtype=np.float32)
    M[:3, 3] = [0.1, -0.05, 0.2]
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
    warped, planes = pw.affine_register_warp(jnp.asarray(M)[None], img)
    grid = pw.planes_to_grid(planes)
    ref = np.asarray(align_img(grid, img))
    np.testing.assert_allclose(np.asarray(warped), ref, atol=1e-5)
