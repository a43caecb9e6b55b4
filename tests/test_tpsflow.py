"""Parity tests for the fused Pallas TPS dense-flow kernel
(ops/pallas/tpsflow.py) against the XLA `solvers.tps_eval` formulation.

Runs the kernel in interpret mode on the CPU backend (same mechanism as the
warp/conv kernel tests). Parity target: reference
`TPS.transform_points`/`compute_on_subgrids` (keypoint_aligners.py:365-433),
already pinned to `tps_eval` by tests/test_solvers.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keymorph_tpu.ops.pallas import tpsflow
from keymorph_tpu.transforms import solvers


def _fit(rng, B=1, T=16, lmbda=0.1):
    src = jnp.asarray(rng.uniform(-0.8, 0.8, (B, T, 3)).astype(np.float32))
    dst = src + jnp.asarray(rng.normal(0, 0.08, (B, T, 3)).astype(np.float32))
    theta = solvers.fit_tps(src, dst, jnp.full((B,), lmbda, jnp.float32))
    return theta, src


def _points(rng, B, N):
    return jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))


@pytest.mark.parametrize("B,T", [(1, 16), (2, 40), (1, 130)])
def test_tps_flow_matches_xla(rng, B, T):
    theta, ctrl = _fit(rng, B=B, T=T)
    pts = _points(rng, B, tpsflow._NT * 2)
    got = np.asarray(tpsflow.tps_flow(theta, ctrl, pts))
    want = np.asarray(solvers.tps_eval(theta, ctrl, pts))
    np.testing.assert_allclose(got, want, atol=2e-4)  # hi/lo bf16 split: ~16-bit mantissa (0.03 voxel at 256^3)


def test_tps_eval_chunked_dispatches_to_kernel(rng, monkeypatch):
    theta, ctrl = _fit(rng)
    pts = _points(rng, 1, tpsflow._NT * 4)
    want = np.asarray(solvers.tps_eval(theta, ctrl, pts))

    got = np.asarray(solvers.tps_eval_chunked(theta, ctrl, pts, num_chunks=4))
    np.testing.assert_allclose(got, want, atol=2e-4)  # hi/lo bf16 split: ~16-bit mantissa (0.03 voxel at 256^3)

    # opt-out returns the chunked XLA path (exact match to tps_eval)
    monkeypatch.setenv("KM_NO_FAST_TPS", "1")
    off = np.asarray(solvers.tps_eval_chunked(theta, ctrl, pts, num_chunks=4))
    np.testing.assert_allclose(off, want, atol=1e-6)


def test_ineligible_shapes_fall_back(rng):
    theta, ctrl = _fit(rng)
    pts = _points(rng, 1, 1000)  # not a multiple of the tile width
    assert not tpsflow.tps_flow_eligible(pts)
    got = np.asarray(solvers.tps_eval_chunked(theta, ctrl, pts, num_chunks=4))
    want = np.asarray(solvers.tps_eval(theta, ctrl, pts))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_training_path_keeps_native_autodiff(rng):
    # num_chunks=1 (the training marker) must not route through the kernel
    theta, ctrl = _fit(rng)
    pts = _points(rng, 1, tpsflow._NT)

    def loss_kernel(th):
        return jnp.sum(solvers.tps_eval_chunked(th, ctrl, pts, num_chunks=1) ** 2)

    def loss_xla(th):
        return jnp.sum(solvers.tps_eval(theta=th, ctrl=ctrl, points=pts) ** 2)

    g1 = jax.grad(loss_kernel)(theta)
    g2 = jax.grad(loss_xla)(theta)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_kernel_vjp_matches_xla_grad(rng):
    theta, ctrl = _fit(rng)
    pts = _points(rng, 1, tpsflow._NT)

    g1 = jax.grad(lambda th: jnp.sum(tpsflow.tps_flow(th, ctrl, pts) ** 2))(theta)
    g2 = jax.grad(lambda th: jnp.sum(solvers.tps_eval(th, ctrl, pts) ** 2))(theta)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4, rtol=1e-4)


def test_tps_planes_matches_grid_path(rng):
    """tps_planes (in-kernel identity grid, plane-major output) equals the
    grid-path planes flip(moveaxis(grid)) — the planes-native serving
    contract of align_pair(compute_grid='planes')."""
    from keymorph_tpu.ops import coords

    theta, ctrl = _fit(rng, B=2, T=24)
    spatial = (16, 16, 32)  # N = 8192 (kernel-eligible)
    n = int(np.prod(spatial))
    planes = tpsflow.tps_planes(theta, ctrl, spatial)
    pts = jnp.broadcast_to(coords.flat_norm_grid(spatial), (2, n, 3))
    moved = solvers.tps_eval(theta, ctrl, pts)
    ref = jnp.moveaxis(moved, -1, 1).reshape(2, 3, *spatial)
    np.testing.assert_allclose(np.asarray(planes), np.asarray(ref), atol=2e-4)
    # ineligible N falls back to the XLA formulation, same contract
    sp2 = (6, 10, 14)
    p2 = tpsflow.tps_planes(theta, ctrl, sp2)
    n2 = int(np.prod(sp2))
    pts2 = jnp.broadcast_to(coords.flat_norm_grid(sp2), (2, n2, 3))
    ref2 = jnp.moveaxis(solvers.tps_eval(theta, ctrl, pts2), -1, 1).reshape(2, 3, *sp2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(ref2), atol=1e-5)


def test_align_pair_planes_end_to_end(rng):
    """align_pair(compute_grid='planes') + align_planes == grid + align_img
    for tps, affine, and rigid."""
    from keymorph_tpu.models.keymorph import align_pair
    from keymorph_tpu.ops.resample import align_img, align_planes

    B, T, spatial = 2, 24, (16, 16, 32)
    pf = jnp.asarray(rng.uniform(-0.7, 0.7, (B, T, 3)).astype(np.float32))
    pm = pf + jnp.asarray(rng.normal(0, 0.04, (B, T, 3)).astype(np.float32))
    img = jnp.asarray(rng.random((B, 1, *spatial), dtype=np.float32))
    for at in ("tps", "affine", "rigid"):
        kw = dict(lmbda=jnp.full((B,), 1.0)) if at == "tps" else {}
        og = align_pair(pf, pm, at, spatial, num_chunks=4, compute_grid=True, **kw)
        op = align_pair(pf, pm, at, spatial, num_chunks=4,
                        compute_grid="planes", **kw)
        a = np.asarray(align_img(og["grid"], img))
        b = np.asarray(align_planes(op["planes"], img))
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_tps_planes_pallas_bwd_matches_xla_grad(rng):
    """The Pallas planes backward (VMEM-recomputed RBF block; the 256^3
    training enabler, VERDICT r4 #3) must match the XLA VJP for BOTH theta
    and ctrl cotangents, on an eligible shape (interpret mode on CPU)."""
    theta, ctrl = _fit(rng, B=2, T=24)
    spatial = (16, 16, 32)  # N = 8192, kernel-eligible
    cot = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (2, 3, *spatial)).astype(np.float32)
    )

    def run(fn):
        out, vjp = jax.vjp(fn, theta, ctrl)
        return out, vjp(cot)

    out_k, (gt_k, gc_k) = run(lambda th, c: tpsflow.tps_planes(th, c, spatial))
    out_x, (gt_x, gc_x) = run(lambda th, c: tpsflow._xla_planes(th, c, spatial))

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=2e-4)
    scale_t = np.maximum(np.abs(np.asarray(gt_x)).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(gt_k) / scale_t, np.asarray(gt_x) / scale_t, atol=5e-5
    )
    scale_c = np.maximum(np.abs(np.asarray(gc_x)).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(gc_k) / scale_c, np.asarray(gc_x) / scale_c, atol=5e-5
    )


def test_train_step_planes_path_matches_grid_path(rng):
    """make_train_step's TPS planes-native path (fused flow + planes warp)
    computes the same loss/gradients as the explicit grid formulation."""
    from keymorph_tpu.models import UNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet, align_pair
    from keymorph_tpu.ops.resample import align_img
    from keymorph_tpu.training.config import Config
    from keymorph_tpu.training.train import (
        TrainState, make_optimizer, make_train_step,
    )
    from keymorph_tpu.losses import mse_loss

    net = KeyMorphNet(
        backbone=UNet3D(out_channels=8, f_maps=4, num_levels=2), num_keypoints=8
    )
    config = Config(
        num_keypoints=8, transform_type="tps_1.0", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    size = (16, 16, 8)  # N = 2048: the planes kernel path is eligible
    img_f = jnp.asarray(rng.normal(size=(2, 1, *size)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(2, 1, *size)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f[:1], img_f[:1])
    tx = make_optimizer(config)
    dummy = jnp.zeros((1,), jnp.float32)

    step = make_train_step(net, config, tx)
    s1, m1 = step(
        TrainState.create(params, tx), jax.random.PRNGKey(5), img_f, img_m,
        dummy, dummy, jnp.float32(1.0),
    )
    assert np.isfinite(float(m1["loss"]))

    # explicit grid-path loss at the same params/keys for comparison
    key = jax.random.PRNGKey(5)
    k_aug, k_lmbda, k_sub = jax.random.split(key, 3)
    from keymorph_tpu.models.keymorph import sample_tps_lmbda

    pf, pm, _ = net.apply(params, img_f, img_m)
    lmbda = sample_tps_lmbda(k_lmbda, 2, 1.0, 10.0)
    grid = align_pair(
        pf, pm, "tps", size, lmbda=lmbda, num_chunks=1, compute_grid=True
    )["grid"]
    ref_loss = float(mse_loss(img_f, align_img(grid, img_m)))
    assert float(m1["loss"]) == pytest.approx(ref_loss, rel=1e-4)
