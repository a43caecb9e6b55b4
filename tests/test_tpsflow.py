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
