"""Solver tests: analytic recovery (ports of reference test/test.py:256-480)
plus TPS oracle tests the reference lacks (SURVEY §4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from keymorph_tpu.transforms import solvers
from keymorph_tpu.transforms.aligners import (
    AffineKeypointAligner,
    RigidKeypointAligner,
    TPS,
)


def _rot3(ax, ay, az):
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


# -- rigid (test.py:256-413 analogs) ----------------------------------------


def test_rigid_translation_recovery(rng):
    p1 = rng.uniform(-1, 1, size=(1, 20, 3)).astype(np.float32)
    t = np.array([0.2, -0.1, 0.05], np.float32)
    p2 = p1 + t
    m = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(m[0, :, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(m[0, :, 3], t, atol=1e-5)


def test_rigid_rotation_recovery(rng):
    R = _rot3(0.3, -0.2, 0.5).astype(np.float32)
    p1 = rng.uniform(-1, 1, size=(1, 30, 3)).astype(np.float32)
    p2 = p1 @ R.T
    m = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(m[0, :, :3], R, atol=1e-4)
    np.testing.assert_allclose(m[0, :, 3], 0, atol=1e-5)


def test_rigid_scale_invariance(rng):
    """Rigid fit of scaled points must still return a pure rotation
    (det R = +1, R^T R = I) — test.py:364-387."""
    R = _rot3(0.1, 0.7, -0.4).astype(np.float32)
    p1 = rng.uniform(-1, 1, size=(1, 25, 3)).astype(np.float32)
    p2 = 2.5 * (p1 @ R.T)
    m = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2)))
    Rf = m[0, :, :3]
    np.testing.assert_allclose(Rf @ Rf.T, np.eye(3), atol=1e-4)
    assert np.linalg.det(Rf) == pytest.approx(1.0, abs=1e-4)


def test_rigid_trivial_weights_equivalence(rng):
    """Uniform weights = unweighted (test.py:389-413)."""
    p1 = rng.uniform(-1, 1, size=(2, 16, 3)).astype(np.float32)
    p2 = rng.uniform(-1, 1, size=(2, 16, 3)).astype(np.float32)
    w = np.full((2, 16), 1 / 16, np.float32)
    a = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2)))
    b = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(w)))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_rigid_reflection_case():
    """Near-planar point sets can produce det(VU^T) = -1; the fix must
    return a proper rotation. (The reference's known-failing commented test,
    test.py:301-320.)"""
    p1 = np.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0.5, 0.5, 0.01]]],
        np.float32,
    )
    R = _rot3(0.0, 0.0, np.pi / 2).astype(np.float32)
    p2 = p1 @ R.T
    # perturb the out-of-plane point so H is near-singular
    p2[0, -1, 2] = -0.01
    m = np.asarray(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2)))
    Rf = m[0, :, :3]
    assert np.linalg.det(Rf) == pytest.approx(1.0, abs=1e-3)


def test_rigid_forward_inverse_consistency(rng):
    """Swapping the argument order produces (approximately) the inverse
    transform (test.py:279-299)."""
    R = _rot3(0.2, 0.1, -0.3).astype(np.float32)
    t = np.array([0.1, 0.2, -0.1], np.float32)
    p1 = rng.uniform(-1, 1, size=(1, 40, 3)).astype(np.float32)
    p2 = p1 @ R.T + t
    fwd = np.asarray(solvers.square_matrix(solvers.fit_rigid(jnp.asarray(p1), jnp.asarray(p2))))
    bwd = np.asarray(solvers.square_matrix(solvers.fit_rigid(jnp.asarray(p2), jnp.asarray(p1))))
    np.testing.assert_allclose(fwd[0] @ bwd[0], np.eye(4), atol=1e-4)


# -- affine (test.py:416-480 analogs) ---------------------------------------


def test_affine_exact_recovery_3d(rng):
    A = (np.eye(3) + 0.2 * rng.normal(size=(3, 3))).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32) * 0.3
    p1 = rng.uniform(-1, 1, size=(1, 20, 3)).astype(np.float32)
    p2 = p1 @ A.T + t
    m = np.asarray(solvers.fit_affine(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(m[0, :, :3], A, atol=1e-4)
    np.testing.assert_allclose(m[0, :, 3], t, atol=1e-4)


def test_affine_exact_recovery_2d(rng):
    A = _rot3(0, 0, 0.9)[:2, :2].astype(np.float32) * 1.3
    p1 = rng.uniform(-1, 1, size=(1, 10, 2)).astype(np.float32)
    p2 = p1 @ A.T
    m = np.asarray(solvers.fit_affine(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(m[0, :, :2], A, atol=1e-4)


def test_affine_weighted_matches_torch_oracle(rng):
    """Weighted LS against a torch implementation of the same normal equations."""
    import torch

    p1 = rng.uniform(-1, 1, size=(2, 12, 3)).astype(np.float32)
    p2 = rng.uniform(-1, 1, size=(2, 12, 3)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=(2, 12)).astype(np.float32)
    ours = np.asarray(solvers.fit_affine(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(w)))

    x = torch.from_numpy(p1).permute(0, 2, 1)
    y = torch.from_numpy(p2).permute(0, 2, 1)
    W = torch.diag_embed(torch.from_numpy(w))
    one = torch.ones(x.shape[0], 1, x.shape[2])
    xh = torch.cat([x, one], 1)
    gram = xh @ W @ xh.transpose(-2, -1)
    ref = (y @ (W @ xh.transpose(-2, -1) @ torch.inverse(gram))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_affine_batched(rng):
    """B > 1 must solve each batch element independently (the reference's
    _square breaks here; ours must not)."""
    p1 = rng.uniform(-1, 1, size=(3, 15, 3)).astype(np.float32)
    A = np.stack([np.eye(3) + 0.1 * rng.normal(size=(3, 3)) for _ in range(3)]).astype(
        np.float32
    )
    p2 = np.einsum("bij,bnj->bni", A, p1)
    m = np.asarray(solvers.fit_affine(jnp.asarray(p1), jnp.asarray(p2)))
    np.testing.assert_allclose(m[:, :, :3], A, atol=1e-3)


# -- TPS (no reference tests existed; oracle = torch impl of same system) ---


def _torch_tps_fit(c_src, c_dst, lmbda, dim=3):
    import torch

    c_src = torch.from_numpy(c_src).float()
    c_dst = torch.from_numpy(c_dst).float()
    lmbda = torch.from_numpy(lmbda).float()
    bs, T = c_src.shape[0], c_src.shape[1]
    thetas = []
    for k in range(dim):
        tgt = c_dst[..., k]
        r = torch.sqrt(
            ((c_src[:, :, None, :] - c_src[:, None, :, :]) ** 2).sum(-1) + 1e-6
        )
        U = r**2 * torch.log(r + 1e-6)
        K = U + torch.eye(T).repeat(bs, 1, 1) * lmbda.view(bs, 1, 1)
        P = torch.ones((bs, T, dim + 1))
        P[:, :, 1:] = c_src
        v = torch.zeros(bs, T + dim + 1)
        v[:, :T] = tgt
        A = torch.zeros((bs, T + dim + 1, T + dim + 1))
        A[:, :T, :T] = K
        A[:, :T, -(dim + 1):] = P
        A[:, -(dim + 1):, :T] = P.transpose(1, 2)
        thetas.append(torch.linalg.solve(A, v))
    return torch.stack(thetas, -1).numpy()


def test_tps_fit_matches_torch_oracle(rng):
    c_src = rng.uniform(-1, 1, size=(2, 12, 3)).astype(np.float32)
    c_dst = (c_src + 0.1 * rng.normal(size=(2, 12, 3))).astype(np.float32)
    lmbda = np.array([0.1, 1.0], np.float32)
    ours = np.asarray(solvers.fit_tps(jnp.asarray(c_src), jnp.asarray(c_dst), jnp.asarray(lmbda)))
    ref = _torch_tps_fit(c_src, c_dst, lmbda)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_tps_zero_lambda_interpolates(rng):
    """lambda=0 TPS must interpolate the control points exactly."""
    c_src = rng.uniform(-1, 1, size=(1, 10, 3)).astype(np.float32)
    c_dst = (c_src + 0.2 * rng.normal(size=(1, 10, 3))).astype(np.float32)
    theta = solvers.fit_tps(jnp.asarray(c_src), jnp.asarray(c_dst), jnp.zeros(1))
    out = np.asarray(solvers.tps_eval(theta, jnp.asarray(c_src), jnp.asarray(c_src)))
    np.testing.assert_allclose(out, c_dst, atol=1e-3)


def test_tps_affine_limit(rng):
    """A large lambda drives the spline toward the affine fit of the points."""
    A = (np.eye(3) + 0.1 * rng.normal(size=(3, 3))).astype(np.float32)
    c_src = rng.uniform(-1, 1, size=(1, 30, 3)).astype(np.float32)
    c_dst = c_src @ A.T
    theta = solvers.fit_tps(jnp.asarray(c_src), jnp.asarray(c_dst), jnp.full((1,), 1e4))
    q = rng.uniform(-1, 1, size=(1, 17, 3)).astype(np.float32)
    out = np.asarray(solvers.tps_eval(theta, jnp.asarray(c_src), jnp.asarray(q)))
    np.testing.assert_allclose(out, q @ A.T, atol=2e-2)


def test_tps_approximate_full_subset_matches_exact(rng):
    """S == T reduces approximate TPS to the exact fit (the square system
    solved by least squares)."""
    c_src = rng.uniform(-1, 1, size=(1, 10, 3)).astype(np.float32)
    c_dst = (c_src + 0.1 * rng.normal(size=(1, 10, 3))).astype(np.float32)
    lmbda = np.full((1,), 0.5, np.float32)
    exact = solvers.fit_tps(jnp.asarray(c_src), jnp.asarray(c_dst), jnp.asarray(lmbda))
    approx = solvers.fit_tps_approximate(
        jnp.asarray(c_src), jnp.asarray(c_dst), jnp.asarray(lmbda), 10
    )
    q = jnp.asarray(rng.uniform(-1, 1, size=(1, 20, 3)).astype(np.float32))
    out_e = np.asarray(solvers.tps_eval(exact, jnp.asarray(c_src), q))
    out_a = np.asarray(solvers.tps_eval(approx, jnp.asarray(c_src), q))
    np.testing.assert_allclose(out_a, out_e, atol=1e-3)


def test_tps_approximate_subset_close(rng):
    """A generous subset approximates the full spline on smooth warps."""
    c_src = rng.uniform(-1, 1, size=(1, 40, 3)).astype(np.float32)
    A = (np.eye(3) + 0.05 * rng.normal(size=(3, 3))).astype(np.float32)
    c_dst = c_src @ A.T
    lmbda = np.full((1,), 0.1, np.float32)
    approx = solvers.fit_tps_approximate(
        jnp.asarray(c_src), jnp.asarray(c_dst), jnp.asarray(lmbda), 24
    )
    q = jnp.asarray(rng.uniform(-0.8, 0.8, size=(1, 30, 3)).astype(np.float32))
    out = np.asarray(
        solvers.tps_eval(approx, jnp.asarray(c_src[:, :24]), q)
    )
    np.testing.assert_allclose(out, np.asarray(q) @ A.T, atol=2e-2)


def test_tps_chunked_equals_dense(rng):
    c_src = rng.uniform(-1, 1, size=(2, 8, 3)).astype(np.float32)
    c_dst = rng.uniform(-1, 1, size=(2, 8, 3)).astype(np.float32)
    theta = solvers.fit_tps(jnp.asarray(c_src), jnp.asarray(c_dst), jnp.full((2,), 0.5))
    q = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    dense = np.asarray(solvers.tps_eval(theta, jnp.asarray(c_src), jnp.asarray(q)))
    chunked = np.asarray(
        solvers.tps_eval_chunked(theta, jnp.asarray(c_src), jnp.asarray(q), num_chunks=4)
    )
    np.testing.assert_allclose(chunked, dense, atol=1e-5)


# -- aligner wrappers -------------------------------------------------------


def test_affine_aligner_flow_matches_torch_pipeline(rng):
    """End-to-end: fit on keypoints, build flow, warp — vs torch oracle using
    the same matrices."""
    import torch
    import torch.nn.functional as F

    p_m = rng.uniform(-0.5, 0.5, size=(1, 12, 3)).astype(np.float32)
    A = (np.eye(3) + 0.1 * rng.normal(size=(3, 3))).astype(np.float32)
    t = 0.05 * rng.normal(size=3).astype(np.float32)
    p_f = p_m @ A.T + t

    alg = AffineKeypointAligner(points_m=jnp.asarray(p_m), points_f=jnp.asarray(p_f))
    grid = np.asarray(alg.get_flow_field((1, 1, 6, 7, 8)))
    assert grid.shape == (1, 6, 7, 8, 3)

    # forward points p_m -> p_f
    fwd = np.asarray(alg.get_forward_transformed_points(jnp.asarray(p_m)))
    np.testing.assert_allclose(fwd, p_f, atol=1e-3)

    # grid equals inverse transform of linspace grid, flipped
    axes = [np.linspace(-1, 1, s, dtype=np.float32) for s in (6, 7, 8)]
    base = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    inv = np.asarray(alg.inverse_transform_matrix)[0]
    expect = (inv[:3, :3] @ base.T).T + inv[:3, 3]
    expect = expect.reshape(6, 7, 8, 3)[..., ::-1]
    np.testing.assert_allclose(grid[0], expect, atol=1e-4)

    # warping an image with this grid matches torch grid_sample
    img = rng.normal(size=(1, 1, 6, 7, 8)).astype(np.float32)
    from keymorph_tpu.ops.resample import align_img

    ours = np.asarray(align_img(jnp.asarray(grid), jnp.asarray(img)))
    ref = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid.copy()),
        mode="bilinear",
        padding_mode="border",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rigid_aligner_forward_inverse(rng):
    R = _rot3(0.1, 0.2, 0.3).astype(np.float32)
    t = np.array([0.1, -0.05, 0.2], np.float32)
    p_m = rng.uniform(-0.6, 0.6, size=(1, 20, 3)).astype(np.float32)
    p_f = p_m @ R.T + t
    alg = RigidKeypointAligner(points_m=jnp.asarray(p_m), points_f=jnp.asarray(p_f))
    fwd = np.asarray(alg.get_forward_transformed_points(jnp.asarray(p_m)))
    np.testing.assert_allclose(fwd, p_f, atol=1e-4)
    back = np.asarray(alg.get_inverse_transformed_points(jnp.asarray(p_f)))
    np.testing.assert_allclose(back, p_m, atol=1e-4)


def test_tps_aligner_flow_shape_and_subgrids(rng):
    p_m = rng.uniform(-0.5, 0.5, size=(1, 9, 3)).astype(np.float32)
    p_f = (p_m + 0.05 * rng.normal(size=(1, 9, 3))).astype(np.float32)
    alg = TPS(points_m=jnp.asarray(p_m), points_f=jnp.asarray(p_f), lmbda=jnp.full((1,), 0.1))
    g1 = np.asarray(alg.get_flow_field((1, 1, 4, 4, 4), compute_on_subgrids=False))
    g2 = np.asarray(alg.get_flow_field((1, 1, 4, 4, 4), compute_on_subgrids=True))
    assert g1.shape == (1, 4, 4, 4, 3)
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_real_world_affine_aligner_roundtrip(rng):
    """real-world mode: with identical affines/shapes results must match the
    plain mode (scanner frame == a consistent relabeling)."""
    p_m = rng.uniform(-0.5, 0.5, size=(1, 15, 3)).astype(np.float32)
    p_f = (p_m + 0.1 * rng.normal(size=(1, 15, 3))).astype(np.float32)
    aff = np.eye(4, dtype=np.float32)
    aff[:3, :3] = np.diag([1.25, 1.25, 10.0])
    aff[:3, 3] = [-80, -100, 50]
    aff = aff[None]
    shape = (12, 14, 16)
    plain = AffineKeypointAligner(points_m=jnp.asarray(p_m), points_f=jnp.asarray(p_f))
    rw = AffineKeypointAligner(
        points_m=jnp.asarray(p_m),
        points_f=jnp.asarray(p_f),
        align_in_real_world_coords=True,
        aff_m=jnp.asarray(aff),
        aff_f=jnp.asarray(aff),
        shape_m=shape,
        shape_f=shape,
    )
    q = rng.uniform(-1, 1, size=(1, 10, 3)).astype(np.float32)
    a = np.asarray(plain.get_forward_transformed_points(jnp.asarray(q)))
    b = np.asarray(rw.get_forward_transformed_points(jnp.asarray(q)))
    np.testing.assert_allclose(a, b, atol=1e-2)


# -- approximate-TPS serving mode (reference's commented ApproximateTPS,
#    keypoint_aligners.py:468-590; ours is a working least-squares solver) --


def test_tps_aligner_num_centers_transport(rng):
    """TPS(num_centers=S) must evaluate the spline with the S-center theta in
    BOTH transport directions (the forward fit lazily re-fits with the same
    approximate solver — regression for the partial/positional-arg wiring)."""
    p_m = rng.uniform(-0.6, 0.6, size=(1, 24, 3)).astype(np.float32)
    A = (np.eye(3) + 0.05 * rng.normal(size=(3, 3))).astype(np.float32)
    p_f = (p_m @ A.T).astype(np.float32)
    S = 16
    alg = TPS(
        points_m=jnp.asarray(p_m),
        points_f=jnp.asarray(p_f),
        lmbda=jnp.full((1,), 0.05),
        num_centers=S,
    )
    assert alg.inverse_theta.shape == (1, S + 4, 3)
    q = rng.uniform(-0.7, 0.7, size=(1, 12, 3)).astype(np.float32)
    fwd = np.asarray(alg.get_forward_transformed_points(jnp.asarray(q)))
    np.testing.assert_allclose(fwd, q @ A.T, atol=3e-2)
    back = np.asarray(alg.get_inverse_transformed_points(jnp.asarray(q @ A.T)))
    np.testing.assert_allclose(back, q, atol=3e-2)
    # S >= K degrades to the exact solver
    exact = TPS(
        points_m=jnp.asarray(p_m),
        points_f=jnp.asarray(p_f),
        lmbda=jnp.full((1,), 0.05),
        num_centers=24,
    )
    assert exact.num_centers is None
    assert exact.inverse_theta.shape == (1, 24 + 4, 3)


def test_tps_aligner_num_centers_flow_matches_solver(rng):
    """The aligner's dense flow with num_centers=S equals the direct
    fit_tps_approximate + tps_eval composition on the S-center subset."""
    p_m = rng.uniform(-0.5, 0.5, size=(1, 20, 3)).astype(np.float32)
    p_f = (p_m + 0.06 * rng.normal(size=(1, 20, 3))).astype(np.float32)
    lmbda = jnp.full((1,), 0.1)
    S = 12
    alg = TPS(
        points_m=jnp.asarray(p_m),
        points_f=jnp.asarray(p_f),
        lmbda=lmbda,
        num_centers=S,
    )
    grid = np.asarray(alg.get_flow_field((1, 1, 5, 6, 7), compute_on_subgrids=False))
    assert grid.shape == (1, 5, 6, 7, 3)

    from keymorph_tpu.ops import coords as C

    theta = solvers.fit_tps_approximate(
        jnp.asarray(p_f), jnp.asarray(p_m), lmbda, S
    )
    pts = jnp.broadcast_to(C.flat_norm_grid((5, 6, 7)), (1, 5 * 6 * 7, 3))
    moved = solvers.tps_eval(theta, jnp.asarray(p_f[:, :S]), pts)
    expect = np.asarray(jnp.flip(moved.reshape(1, 5, 6, 7, 3), axis=-1))
    np.testing.assert_allclose(grid, expect, atol=1e-5)


def test_tps_lmbda0_duplicate_keypoints_finite():
    """tps_0 (exact interpolation) with coincident control points: the
    system is singular and XLA's solve would return NaN; the 1e-6 ridge
    floor keeps it finite and interpolating (protocol align tps_0 on
    same-subject pairs hits this with trained CoM keypoints)."""
    import numpy as np

    from keymorph_tpu.transforms.solvers import fit_tps, tps_eval

    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.7, 0.7, (1, 32, 3)).astype(np.float32)
    pts[0, 1] = pts[0, 0]  # exact duplicate
    src = jnp.asarray(pts)
    dst = src + 0.03
    theta = fit_tps(src, dst, jnp.zeros((1,)))
    out = tps_eval(theta, src, src)
    assert np.isfinite(np.asarray(theta)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(dst), atol=1e-4)
