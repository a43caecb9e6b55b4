"""Closed-form keypoint-alignment solvers as pure batched JAX functions.

Everything here is jit/vmap/grad-safe and runs in fp32 regardless of input
dtype (the reference also upcasts inside ``fit``; keypoint_aligners.py:92-93,
164-165). Solvers return transform *parameters* (matrices / TPS theta) as
plain arrays, so they compose freely under ``jax.jit`` and ``shard_map`` —
unlike the reference's fit-in-__init__ aligner objects
(keypoint_aligners.py:67-74), which do not trace.

Parity anchors into /root/reference:
  * affine  — keypoint_aligners.py:76-114 (weighted least squares)
  * rigid   — keypoint_aligners.py:150-213 (Arun SVD)
  * TPS     — keypoint_aligners.py:216-465 (regularized dense system)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST  # fp32 accumulate: geometry must not run in bf16

_EPS_DIST = 1e-6
_EPS_LOG = 1e-6


def square_matrix(m):
    """(..., d, d+1) -> homogeneous (..., d+1, d+1) with bottom row [0..0 1].

    Parity: reference transformations.py:32-35 (batched correctly here).
    """
    d = m.shape[-2]
    bottom = jnp.zeros((*m.shape[:-2], 1, d + 1), dtype=m.dtype)
    bottom = bottom.at[..., 0, d].set(1.0)
    return jnp.concatenate([m, bottom], axis=-2)


def fit_affine(x, y, w=None):
    """Weighted least-squares affine: argmin_A ||A x~ - y||, x~ homogeneous.

    Closed form A = y W x~^T (x~ W x~^T)^{-1}.

    Args:
        x: (B, N, d) source points.
        y: (B, N, d) target points.
        w: optional (B, N) per-point weights.
    Returns:
        (B, d, d+1) affine matrix mapping x -> y.
    Parity: reference keypoint_aligners.py:76-114.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    B, N, d = x.shape
    xh = jnp.concatenate([x, jnp.ones((B, N, 1), jnp.float32)], axis=-1)  # (B,N,d+1)
    if w is not None:
        w = w.astype(jnp.float32)[..., None]  # (B,N,1)
        gram = jnp.einsum("bni,bnj->bij", xh * w, xh, precision=_PREC)  # x W x^T
        xw = xh * w
    else:
        gram = jnp.einsum("bni,bnj->bij", xh, xh, precision=_PREC)
        xw = xh
    # A^T = (x W x^T)^{-1} x W y  — one solve instead of an explicit inverse
    rhs = jnp.einsum("bni,bnk->bik", xw, y, precision=_PREC)  # (B, d+1, d)
    at = jnp.linalg.solve(gram, rhs)  # (B, d+1, d)
    return jnp.swapaxes(at, -1, -2)  # (B, d, d+1)


def fit_rigid(p1, p2, w=None):
    """Arun/SVD rigid fit: argmin_{R,T} sum_i || p2_i - (R p1_i + T) ||.

    Args:
        p1: (B, N, d) source points.
        p2: (B, N, d) target points.
        w: optional (B, N) weights. As in the reference
           (keypoint_aligners.py:168-183), weights are expected to sum to 1
           per batch; both centered point sets are scaled by w before the
           covariance, matching the reference's weighted variant exactly.
    Returns:
        (B, d, d+1) rigid matrix [R | T] mapping p1 -> p2.

    Note: the reflection fix flips the sign of the LAST COLUMN of V
    (V <- V diag(1..1, sign det)), the standard Arun/Umeyama correction.
    The reference scales the last *row* instead (keypoint_aligners.py:199-203),
    which is a latent bug that only differs in the (rare) reflection case and
    is hardwired to d=3; we implement the correct, dim-generic form.
    """
    p1 = p1.astype(jnp.float32)
    p2 = p2.astype(jnp.float32)
    d = p1.shape[-1]
    if w is not None:
        w = w.astype(jnp.float32)[..., None]  # (B,N,1)
        c1 = jnp.sum(p1 * w, axis=1, keepdims=True)
        c2 = jnp.sum(p2 * w, axis=1, keepdims=True)
        q1 = (p1 - c1) * w
        q2 = (p2 - c2) * w
    else:
        c1 = jnp.mean(p1, axis=1, keepdims=True)
        c2 = jnp.mean(p2, axis=1, keepdims=True)
        q1 = p1 - c1
        q2 = p2 - c2
    # H = sum_i q1_i q2_i^T, the d x d covariance (keypoint_aligners.py:186)
    H = jnp.einsum("bni,bnj->bij", q1, q2, precision=_PREC)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R0 = jnp.einsum("bij,bkj->bik", V, U, precision=_PREC)  # V U^T
    det = jnp.linalg.det(R0)
    sign = jnp.sign(det)
    # flip last column of V where det < 0
    scale = jnp.concatenate(
        [jnp.ones((*sign.shape, d - 1)), sign[..., None]], axis=-1
    )  # (B, d)
    Vc = V * scale[..., None, :]
    R = jnp.einsum("bij,bkj->bik", Vc, U, precision=_PREC)
    T = jnp.swapaxes(c2, 1, 2) - jnp.einsum("bij,bnj->bin", R, c1, precision=_PREC)  # (B,d,1)
    return jnp.concatenate([R, T], axis=-1)


# ---------------------------------------------------------------------------
# Thin-plate splines
# ---------------------------------------------------------------------------


def tps_pairwise_dist(a, b):
    """sqrt(||a_i - b_j||^2 + 1e-6): (B, Na, d), (B, Nb, d) -> (B, Na, Nb).

    Difference form (like the reference, keypoint_aligners.py:322-334): the
    |a|^2+|b|^2-2ab MXU expansion cancels catastrophically when coordinates
    are large (real-world/scanner frames reach O(100): sq errors ~4e-4
    swamp near-zero distances). XLA fuses the elementwise square/reduce, so
    the (Na, Nb, d) intermediate is never materialized.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    diff = a[..., :, None, :] - b[..., None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.sqrt(sq + _EPS_DIST)


def tps_rbf(r):
    """U(r) = r^2 log(r + 1e-6) (reference keypoint_aligners.py:336-339)."""
    return r * r * jnp.log(r + _EPS_LOG)


def fit_tps(c_src, c_dst, lmbda, w=None):
    """Solve the TPS interpolation system for all output dims at once.

        [K + lmbda*I   P] [w]   [v]
        [       P^T    0] [a] = [0]

    with K = U(d(ctrl, ctrl)), P = [1 | ctrl].  The weighted variant uses
    lmbda/diag(w) in place of lmbda*I (reference docstring,
    keypoint_aligners.py:282-287; we apply the reciprocal on the diagonal
    only — the reference's ``torch.reciprocal(diag_embed(w)+1e-6)`` fills
    off-diagonals with lmbda*1e6, an evident bug we do not replicate).

    Args:
        c_src: (B, T, d) control points.
        c_dst: (B, T, d) target points.
        lmbda: (B,) per-batch regularization.
        w: optional (B, T) weights.
    Returns:
        theta: (B, T+d+1, d) spline parameters per output dim.
    Parity: reference keypoint_aligners.py:276-363 (fit_dim/fit). The
    reference solves d separate (T+d+1) systems with identical left-hand
    sides; we factor once and solve all right-hand sides together.
    """
    c_src = c_src.astype(jnp.float32)
    c_dst = c_dst.astype(jnp.float32)
    B, T, d = c_src.shape
    lmbda = jnp.asarray(lmbda, jnp.float32).reshape(B, 1)

    K = tps_rbf(tps_pairwise_dist(c_src, c_src))  # (B, T, T)
    if w is not None:
        reg = lmbda / (w.astype(jnp.float32) + 1e-6)  # (B, T)
    else:
        reg = jnp.broadcast_to(lmbda, (B, T))
    # numerical floor: at lmbda=0 ("exact interpolation", protocol align
    # tps_0) two near-coincident CoM keypoints make K exactly singular —
    # torch raises/returns garbage there, XLA's solve returns NaN and
    # silently poisons the grid. A 1e-6 ridge is ~1e3 x below the solve's
    # fp32 noise floor for distinct points and keeps duplicates graceful.
    reg = jnp.maximum(reg, 1e-6)
    K = K + jax.vmap(jnp.diag)(reg)

    P = jnp.concatenate([jnp.ones((B, T, 1), jnp.float32), c_src], axis=-1)
    zeros = jnp.zeros((B, d + 1, d + 1), jnp.float32)
    A = jnp.concatenate(
        [
            jnp.concatenate([K, P], axis=-1),
            jnp.concatenate([jnp.swapaxes(P, -1, -2), zeros], axis=-1),
        ],
        axis=-2,
    )  # (B, T+d+1, T+d+1)
    v = jnp.concatenate([c_dst, jnp.zeros((B, d + 1, d), jnp.float32)], axis=-2)
    return jnp.linalg.solve(A, v)  # (B, T+d+1, d)


def tps_eval(theta, ctrl, points):
    """Evaluate a fitted TPS at arbitrary points.

        f(p) = a0 + a . p + sum_t w_t U(||p - ctrl_t||)

    Args:
        theta: (B, T+d+1, d) from :func:`fit_tps`.
        ctrl: (B, T, d) control points the spline was fitted with.
        points: (B, N, d) query points.
    Returns:
        (B, N, d) transformed points.
    Parity: reference keypoint_aligners.py:399-433 (transform_points).
    """
    d = points.shape[-1]
    wgt, affine = theta[:, : -(d + 1), :], theta[:, -(d + 1) :, :]
    U = tps_rbf(tps_pairwise_dist(ctrl, points))  # (B, T, N)
    b = jnp.einsum("btn,btd->bnd", U, wgt, precision=_PREC)
    P = jnp.concatenate(
        [jnp.ones((*points.shape[:-1], 1), jnp.float32), points.astype(jnp.float32)],
        axis=-1,
    )
    z = jnp.einsum("bnk,bkd->bnd", P, affine, precision=_PREC)
    return z + b


def fit_tps_approximate(c_src, c_dst, lmbda, num_subsample, w=None):
    """Approximate TPS ("Approximate TPS Mappings", Donato & Belongie,
    method 2): use only the first `num_subsample` control points as RBF
    centers, solving the resulting overdetermined (T+d+1) x (S+d+1) system
    by least squares. Cuts spline-evaluation cost from O(T) to O(S) per
    query point for large keypoint counts.

    The reference carries this as a commented-out experiment
    (keypoint_aligners.py:468-590); here it is a working, jit-safe solver.
    Callers choose the subset by permuting points beforehand (static shapes:
    the subset is points[:, :num_subsample]).

    Returns:
        theta: (B, S+d+1, d) — evaluate with tps_eval(theta,
        c_src[:, :num_subsample], points).
    """
    c_src = c_src.astype(jnp.float32)
    c_dst = c_dst.astype(jnp.float32)
    B, T, d = c_src.shape
    S = int(num_subsample)
    assert S <= T
    lmbda = jnp.asarray(lmbda, jnp.float32).reshape(B, 1)
    sub = c_src[:, :S]

    K = tps_rbf(tps_pairwise_dist(c_src, sub))  # (B, T, S)
    eye_ts = jnp.eye(T, S, dtype=jnp.float32)[None]
    if w is not None:
        reg = (lmbda / (w.astype(jnp.float32) + 1e-6))[..., None] * eye_ts
    else:
        reg = lmbda[..., None] * eye_ts
    K = K + reg

    P = jnp.concatenate([jnp.ones((B, T, 1), jnp.float32), c_src], axis=-1)
    P_sub = jnp.concatenate([jnp.ones((B, S, 1), jnp.float32), sub], axis=-1)
    A = jnp.concatenate(
        [
            jnp.concatenate([K, P], axis=-1),  # (B, T, S+d+1)
            jnp.concatenate(
                [jnp.swapaxes(P_sub, -1, -2), jnp.zeros((B, d + 1, d + 1))], axis=-1
            ),
        ],
        axis=-2,
    )  # (B, T+d+1, S+d+1)
    v = jnp.concatenate([c_dst, jnp.zeros((B, d + 1, d), jnp.float32)], axis=-2)
    # Least squares via batched QR. Normal equations square the condition
    # number: near-duplicate CoM keypoints reach cond(A^T A) ~ 4e5, where the
    # f32 solve loses most of the mantissa (measured 6e-3 grid error between
    # two XLA fusions of the SAME system). The ridge rides as sqrt(mu)*I rows
    # appended to A (equivalent regularization, un-squared conditioning).
    n = A.shape[-1]
    ridge = jnp.float32(1e-4) * jnp.eye(n, dtype=jnp.float32)  # mu = 1e-8
    A_aug = jnp.concatenate(
        [A, jnp.broadcast_to(ridge, (B, n, n))], axis=-2
    )
    v_aug = jnp.concatenate([v, jnp.zeros((B, n, d), jnp.float32)], axis=-2)
    Q, R = jnp.linalg.qr(A_aug)  # reduced: Q (B, M, n), R (B, n, n)
    rhs = jnp.einsum("bmi,bmd->bid", Q, v_aug, precision=_PREC)
    return jax.scipy.linalg.solve_triangular(R, rhs, lower=False)


def tps_eval_chunked(theta, ctrl, points, num_chunks=4, allow_pallas=True):
    """Memory-bounded TPS evaluation: process `points` in sequential chunks.

    The TPU analog of the reference's ``compute_on_subgrids``
    (keypoint_aligners.py:365-397): instead of a Python loop, a
    ``lax.map`` over equal chunks so the whole thing stays inside jit and the
    (T x chunk) RBF matrix never exceeds the chunk budget.

    N must be divisible by num_chunks (dense grids are; pad otherwise).

    Dense 3D grids route through the fused Pallas kernel
    (`ops.pallas.tpsflow`): it keeps the (T, chunk) RBF matrix in VMEM
    instead of XLA's 1.07 GB HBM round-trip at 256^3, so no chunking is
    needed at all. Ineligible shapes (or `KM_NO_FAST_TPS=1`) fall back to
    the chunked XLA formulation below.

    ``allow_pallas=False`` forces the XLA formulation — required inside
    GSPMD-partitioned programs, where the kernel's tpu_custom_call has no
    partitioning rule (same rule as ops/resample.py::grid_sample); callers
    that want the kernel on sharded data must shard_map it instead.
    """
    from keymorph_tpu.ops.pallas import tpsflow

    B, N, d = points.shape
    if allow_pallas and num_chunks > 1 and tpsflow.tps_flow_eligible(points):
        # num_chunks > 1 marks the inference flow (training evaluates
        # unchunked and wants native autodiff, keymorph.py ~:269)
        return tpsflow.tps_flow(theta, ctrl, points)
    if num_chunks <= 1 or N % num_chunks != 0:
        return tps_eval(theta, ctrl, points)
    chunk = N // num_chunks
    pts = points.reshape(B, num_chunks, chunk, d).swapaxes(0, 1)

    def body(p):
        return tps_eval(theta, ctrl, p)

    out = jax.lax.map(body, pts)  # (num_chunks, B, chunk, d)
    return out.swapaxes(0, 1).reshape(B, N, d)
