"""On-device affine augmentation.

The reference's augmentation (keymorph/augmentation.py) runs torch ops with
implicit RNG on whatever device the tensors are on. Here the entire augment —
parameter sampling, matrix composition, flow generation, warp — is pure JAX
with explicit keys, so it jits INTO the train step (SURVEY §7 step 7's
"north-star requirement": no host round-trip per step).

Matrix composition parity (augmentation.py:12-58, 85-158):
    M = Shear @ Scale @ Translate @ Rotation,  Rotation = R3 @ R2 @ R1.
Images are warped through the INVERSE matrix flow (augmentation.py:160-163);
points are pushed through the forward matrix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from keymorph_tpu.ops.resample import align_img
from keymorph_tpu.transforms.affine import affine_flow

_PREC = jax.lax.Precision.HIGHEST


def build_affine_matrix_2d(scale, offset, theta, shear):
    """(B,2),(B,2),(B,1),(B,2) -> (B,3,3). Parity: augmentation.py:12-58."""
    B = scale.shape[0]
    o = jnp.ones((B,), jnp.float32)
    z = jnp.zeros((B,), jnp.float32)
    c, s = jnp.cos(theta[:, 0]), jnp.sin(theta[:, 0])

    Ms = _mat3(scale[:, 0], z, z, z, scale[:, 1], z, z, z, o)
    Mt = _mat3(o, z, offset[:, 0], z, o, offset[:, 1], z, z, o)
    Mr = _mat3(c, -s, z, s, c, z, z, z, o)
    Mz = _mat3(o, shear[:, 0], z, shear[:, 1], o, z, z, z, o)
    return _mm(Mz, _mm(Ms, _mm(Mt, Mr)))


def build_affine_matrix_3d(scale, offset, theta, shear):
    """(B,3),(B,3),(B,3),(B,6) -> (B,4,4). Parity: augmentation.py:85-158."""
    B = scale.shape[0]
    o = jnp.ones((B,), jnp.float32)
    z = jnp.zeros((B,), jnp.float32)

    Ms = jnp.zeros((B, 4, 4)).at[:, 0, 0].set(scale[:, 0]).at[:, 1, 1].set(
        scale[:, 1]
    ).at[:, 2, 2].set(scale[:, 2]).at[:, 3, 3].set(o)

    Mt = jnp.eye(4)[None].repeat(B, 0)
    Mt = Mt.at[:, 0, 3].set(offset[:, 0]).at[:, 1, 3].set(offset[:, 1]).at[
        :, 2, 3
    ].set(offset[:, 2])

    def rot(i):
        c, s = jnp.cos(theta[:, i]), jnp.sin(theta[:, i])
        m = jnp.eye(4)[None].repeat(B, 0)
        ax = [(1, 2), (0, 2), (0, 1)][i]
        a, b = ax
        m = m.at[:, a, a].set(c).at[:, b, b].set(c)
        if i == 1:
            m = m.at[:, a, b].set(s).at[:, b, a].set(-s)
        else:
            m = m.at[:, a, b].set(-s).at[:, b, a].set(s)
        return m

    Mr = _mm(rot(2), _mm(rot(1), rot(0)))

    Mz = jnp.eye(4)[None].repeat(B, 0)
    Mz = (
        Mz.at[:, 0, 1].set(shear[:, 0]).at[:, 0, 2].set(shear[:, 1])
        .at[:, 1, 0].set(shear[:, 2]).at[:, 1, 2].set(shear[:, 3])
        .at[:, 2, 0].set(shear[:, 4]).at[:, 2, 1].set(shear[:, 5])
    )
    return _mm(Mz, _mm(Ms, _mm(Mt, Mr)))


def _mat3(*vals):
    B = vals[0].shape[0]
    return jnp.stack([jnp.stack(vals[i * 3 : (i + 1) * 3], -1) for i in range(3)], 1).reshape(
        B, 3, 3
    )


def _mm(a, b):
    return jnp.einsum("bij,bjk->bik", a, b, precision=_PREC)


def sample_affine_params(
    key,
    batch_size: int,
    dim: int,
    max_random_params: Tuple[float, float, float, float] = (0.2, 0.2, 3.1416, 0.1),
    scale_params: float = 1.0,
):
    """Random (scale, offset, theta, shear) with the reference's ranges
    (augmentation.py:176-208); scale_params implements the affine_slope ramp."""
    s, o, a, z = (p * scale_params for p in max_random_params)
    ks = jax.random.split(key, 4)
    if dim == 2:
        shapes = ((batch_size, 2), (batch_size, 2), (batch_size, 1), (batch_size, 2))
    else:
        shapes = ((batch_size, 3), (batch_size, 3), (batch_size, 3), (batch_size, 6))
    scale = jax.random.uniform(ks[0], shapes[0], minval=1 - s, maxval=1 + s)
    offset = jax.random.uniform(ks[1], shapes[1], minval=-o, maxval=o)
    theta = jax.random.uniform(ks[2], shapes[2], minval=-a, maxval=a)
    shear = jax.random.uniform(ks[3], shapes[3], minval=-z, maxval=z)
    return scale, offset, theta, shear


def fixed_affine_params(batch_size: int, dim: int, fixed_params):
    """Deterministic params (rot0/rot45/... eval augs; augmentation.py:223-244).
    Note the reference fills scale with 1+s."""
    s, o, a, z = fixed_params
    if dim == 2:
        return (
            jnp.full((batch_size, 2), 1.0 + s),
            jnp.full((batch_size, 2), o),
            jnp.full((batch_size, 1), a),
            jnp.full((batch_size, 2), z),
        )
    return (
        jnp.full((batch_size, 3), 1.0 + s),
        jnp.full((batch_size, 3), o),
        jnp.full((batch_size, 3), a),
        jnp.full((batch_size, 6), z),
    )


def build_affine_matrix(params, dim: int):
    return (build_affine_matrix_2d if dim == 2 else build_affine_matrix_3d)(*params)


def deform_img(img, matrix, interp_mode="bilinear"):
    """Warp channel-first image by the affine `matrix` (through its inverse
    flow, like augmentation.py:160-163)."""
    spatial = img.shape[2:]
    flow = affine_flow(jnp.linalg.inv(matrix), spatial)
    return align_img(flow, img, mode=interp_mode)


def deform_points(points, matrix):
    from keymorph_tpu.ops.coords import apply_matrix

    return apply_matrix(matrix, points)


def affine_augment_with_params(
    img, params, seg=None, points=None, return_affine_matrix: bool = False
):
    """Apply one parameter set to image (+seg nearest, +points forward)."""
    dim = img.ndim - 2
    M = build_affine_matrix(params, dim)
    res = (deform_img(img, M, "bilinear"),)
    if seg is not None:
        res += (deform_img(seg, M, "nearest"),)
    if points is not None:
        res += (deform_points(points, M),)
    if return_affine_matrix:
        res += (M,)
    return res[0] if len(res) == 1 else res


def random_affine_augment(
    key,
    img,
    seg=None,
    points=None,
    max_random_params=(0.2, 0.2, 3.1416, 0.1),
    scale_params: float = 1.0,
    return_affine_matrix: bool = False,
):
    """Random augmentation; jit-safe given a key (augmentation.py:176-220)."""
    dim = img.ndim - 2
    params = sample_affine_params(
        key, img.shape[0], dim, max_random_params, scale_params
    )
    return affine_augment_with_params(
        img, params, seg=seg, points=points, return_affine_matrix=return_affine_matrix
    )


def affine_augment(img, fixed_params, seg=None, points=None):
    """Deterministic augmentation (augmentation.py:223-254)."""
    dim = img.ndim - 2
    params = fixed_affine_params(img.shape[0], dim, fixed_params)
    return affine_augment_with_params(img, params, seg=seg, points=points)


def random_affine_augment_pair(
    key, img1, img2, max_random_params=(0.2, 0.2, 3.1416, 0.1), scale_params: float = 1.0
):
    """Same random transform applied to both images (augmentation.py:257-282)."""
    dim = img1.ndim - 2
    params = sample_affine_params(
        key, img1.shape[0], dim, max_random_params, scale_params
    )
    M = build_affine_matrix(params, dim)
    return deform_img(img1, M), deform_img(img2, M)
