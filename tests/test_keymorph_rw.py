"""Real-world-coordinate registration through the compiled forward path,
compared against the eager aligner wrappers (and transitively the torch
reference, which the wrappers are parity-tested against)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from keymorph_tpu.models import KeyMorph, UNet3D
from keymorph_tpu.transforms.aligners import AffineKeypointAligner, TPS


@pytest.fixture(scope="module")
def rw_setup():
    rng = np.random.default_rng(5)
    backbone = UNet3D(out_channels=12, f_maps=2, num_levels=2)
    km = KeyMorph(
        backbone=backbone, num_keypoints=12, dim=3,
        align_keypoints_in_real_world_coords=True,
    )
    img_f = jnp.asarray(rng.normal(size=(1, 1, 10, 12, 14)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 10, 12, 14)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(0), img_f)
    aff_f = np.eye(4, dtype=np.float32)
    aff_f[:3, :3] = np.diag([1.0, 1.25, 2.0])
    aff_f[:3, 3] = [-40, -50, 30]
    aff_m = np.eye(4, dtype=np.float32)
    aff_m[:3, :3] = np.diag([1.1, 1.2, 1.9])
    aff_m[:3, 3] = [-42, -48, 28]
    return km, img_f, img_m, jnp.asarray(aff_f[None]), jnp.asarray(aff_m[None])


def test_rw_affine_matches_wrapper(rw_setup):
    km, img_f, img_m, aff_f, aff_m = rw_setup
    res = km(
        img_f, img_m, transform_type="affine",
        return_aligned_points=True, aff_f=aff_f, aff_m=aff_m,
    )["affine"]
    # wrapper path on the same keypoints
    alg = AffineKeypointAligner(
        points_m=res["points_m"], points_f=res["points_f"],
        align_in_real_world_coords=True,
        aff_f=aff_f, aff_m=aff_m,
        shape_f=img_f.shape[2:], shape_m=img_m.shape[2:],
    )
    grid_ref = np.asarray(alg.get_flow_field(img_f.shape))
    np.testing.assert_allclose(np.asarray(res["grid"]), grid_ref, atol=1e-4)
    pts_ref = np.asarray(alg.get_forward_transformed_points(res["points_m"]))
    np.testing.assert_allclose(np.asarray(res["points_a"]), pts_ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res["matrix"]), np.asarray(alg.transform_matrix), atol=1e-3
    )


def test_rw_tps_matches_wrapper(rw_setup):
    km, img_f, img_m, aff_f, aff_m = rw_setup
    res = km(
        img_f, img_m, transform_type="tps_0.5",
        return_aligned_points=True, aff_f=aff_f, aff_m=aff_m,
    )["tps_0.5"]
    alg = TPS(
        points_m=res["points_m"], points_f=res["points_f"],
        lmbda=res["tps_lmbda"],
        align_in_real_world_coords=True,
        aff_f=aff_f, aff_m=aff_m,
        shape_f=img_f.shape[2:], shape_m=img_m.shape[2:],
    )
    grid_ref = np.asarray(alg.get_flow_field(img_f.shape, compute_on_subgrids=True))
    np.testing.assert_allclose(np.asarray(res["grid"]), grid_ref, atol=1e-3)
    pts_ref = np.asarray(alg.get_forward_transformed_points(res["points_m"]))
    np.testing.assert_allclose(np.asarray(res["points_a"]), pts_ref, atol=1e-3)


def test_rw_translation_affines_match_plain(rw_setup):
    """With identical PURE-TRANSLATION affines on both sides (and a cubic
    volume so norm<->voxel scaling is isotropic), the LS fit is exactly
    frame-covariant, so the real-world compiled program must reduce to the
    plain one. Driven directly with well-spread synthetic keypoints (noise-
    image CoM keypoints are degenerate and make the fit meaningless)."""
    km = rw_setup[0]
    rng = np.random.default_rng(11)
    pf = jnp.asarray(rng.uniform(-0.7, 0.7, size=(1, 12, 3)).astype(np.float32))
    pm = pf + jnp.asarray(
        0.1 * rng.normal(size=(1, 12, 3)).astype(np.float32)
    )
    aff_t = np.eye(4, dtype=np.float32)
    aff_t[:3, 3] = [-40, -50, 30]
    aff = jnp.asarray(aff_t[None])
    spatial = (10, 10, 10)
    rw_fn = km._get_align_fn("affine", spatial, spatial, True, 1, True)
    plain_fn = km._get_align_fn("affine", spatial, spatial, False, 1, True)
    res_rw = rw_fn(pf, pm, None, None, aff, aff)
    res_plain = plain_fn(pf, pm, None, None, None, None)
    np.testing.assert_allclose(
        np.asarray(res_rw["grid"]), np.asarray(res_plain["grid"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_rw["points_a"]), np.asarray(res_plain["points_a"]), atol=1e-3
    )


def test_rw_tps_planes_path_matches_grid_path():
    """Regression (round-4 VERDICT #7): the planes-native serving variant on
    a NON-axis-aligned real-world TPS case must agree with the grid path.
    The hot non-rw TPS path short-circuits to the fused flow kernel
    (models/keymorph.py align_pair); the rw branch converts grid->planes
    generically — as the rw planes path evolves, this pins the contract
    planes == flip(moveaxis(grid, -1, 1), 1)."""
    from keymorph_tpu.models.keymorph import align_pair

    rng = np.random.default_rng(3)
    pf = jnp.asarray(rng.uniform(-0.6, 0.6, size=(1, 10, 3)).astype(np.float32))
    pm = pf + jnp.asarray(0.08 * rng.normal(size=(1, 10, 3)).astype(np.float32))
    # non-axis-aligned anisotropic affine: rotation + shear + offset
    th = 0.3
    aff = np.array(
        [
            [1.2 * np.cos(th), -np.sin(th), 0.05, -40.0],
            [np.sin(th), 0.9 * np.cos(th), 0.0, -55.0],
            [0.02, 0.0, 2.5, 20.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    aff_f = jnp.asarray(aff[None])
    aff_m = jnp.asarray((aff @ np.diag([1.0, 1.05, 0.95, 1.0]).astype(np.float32))[None])
    spatial = (12, 12, 12)
    kw = dict(lmbda=jnp.asarray([0.1]), num_chunks=1, aff_f=aff_f, aff_m=aff_m)
    res_planes = align_pair(pf, pm, "tps", spatial, compute_grid="planes", **kw)
    res_grid = align_pair(pf, pm, "tps", spatial, compute_grid=True, **kw)
    assert "planes" in res_planes and "grid" in res_grid
    expect = jnp.flip(jnp.moveaxis(res_grid["grid"], -1, 1), axis=1)
    np.testing.assert_allclose(
        np.asarray(res_planes["planes"]), np.asarray(expect), atol=1e-5
    )
