"""Coordinate-space conversions and grid builders (pure JAX, fp32).

Spaces:
  * norm  — [-1, 1] per axis, `ij` ordering (first axis of the volume first).
            The -1 <-> -0.5-voxel / +1 <-> (N-0.5)-voxel convention matches
            PyTorch's ``align_corners=False`` (reference keymorph/utils.py:243-277).
  * voxel — continuous voxel indices in [-0.5, N-0.5].
  * real  — scanner/world coordinates, via a NIfTI-style (d+1)x(d+1) affine.

All functions are shape-polymorphic over leading batch dims and jit/vmap safe.
Parity anchors: reference keymorph/utils.py:243-398.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST  # fp32 accumulate: geometry must not run in bf16


def convert_points_norm2voxel(points, grid_sizes):
    """[-1, 1] normalized points -> continuous voxel coordinates.

    Args:
        points: (..., num_points, dim) points in [-1, 1].
        grid_sizes: (dim,) or broadcastable — size of each axis.

    Returns:
        (..., num_points, dim) voxel coordinates, -1 maps to -0.5 and
        +1 maps to N-0.5 (align_corners=False; reference utils.py:243-259).
    """
    grid_sizes = jnp.asarray(grid_sizes, dtype=points.dtype)
    return (points + 1.0) * grid_sizes / 2.0 - 0.5


def convert_points_voxel2norm(points, grid_sizes):
    """Continuous voxel coordinates -> [-1, 1] (reference utils.py:262-277)."""
    grid_sizes = jnp.asarray(grid_sizes, dtype=points.dtype)
    return 2.0 * (points + 0.5) / grid_sizes - 1.0


def convert_points_voxel2real(points, affine):
    """Voxel coordinates -> real-world via homogeneous affine.

    Args:
        points: (B, N, dim)
        affine: (B, dim+1, dim+1)
    Parity: reference utils.py:280-297.
    """
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    homog = jnp.concatenate([points, ones], axis=-1)
    out = jnp.einsum(
        "...ij,...nj->...ni", affine.astype(points.dtype), homog, precision=_PREC
    )
    return out[..., :-1]


def convert_points_real2voxel(points, affine):
    """Real-world -> voxel coordinates via inverse affine (utils.py:300-322)."""
    inv = jnp.linalg.inv(affine.astype(points.dtype))
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    homog = jnp.concatenate([points, ones], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", inv, homog, precision=_PREC)
    return out[..., :-1]


def convert_points_norm2real(points, affine, grid_sizes):
    """Composite norm -> voxel -> real (reference utils.py:325-338)."""
    return convert_points_voxel2real(
        convert_points_norm2voxel(points, grid_sizes), affine
    )


def convert_points_real2norm(points, affine, grid_sizes):
    """Composite real -> voxel -> norm (reference utils.py:341-354)."""
    return convert_points_voxel2norm(
        convert_points_real2voxel(points, affine), grid_sizes
    )


def convert_flow_voxel2norm(flow, dim_sizes):
    """Dense flow in voxel units -> [-1, 1] along the last axis.

    Args:
        flow: (..., dim) field; ``flow[..., i]`` indexes axis with ``dim_sizes[i]``.
        dim_sizes: sequence of axis sizes matching the last-axis ordering of flow.
    Parity: reference utils.py:357-370.
    """
    sizes = jnp.asarray(dim_sizes, dtype=flow.dtype)
    return 2.0 * (flow + 0.5) / sizes - 1.0


def uniform_voxel_grid(spatial_shape):
    """Integer meshgrid over the volume in `ij` ordering.

    Args:
        spatial_shape: (D0,) / (D0, D1) / (D0, D1, D2) spatial sizes.
    Returns:
        (*spatial_shape, dim) float32 grid of voxel indices.
    Parity: reference utils.py:373-384.
    """
    axes = [jnp.arange(s, dtype=jnp.float32) for s in spatial_shape]
    grid = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grid, axis=-1)


def uniform_norm_grid(spatial_shape, dtype=jnp.float32):
    """Meshgrid of `ij`-ordered points with each axis linspace(-1, 1, N).

    NOTE: endpoints are inclusive (linspace), which is the reference's
    convention for flow-field evaluation (utils.py:387-398) even though the
    resampler itself is align_corners=False. This asymmetry is replicated
    deliberately for parity.

    Returns: (*spatial_shape, dim)
    """
    axes = [jnp.linspace(-1.0, 1.0, s, dtype=dtype) for s in spatial_shape]
    grid = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grid, axis=-1)


def flat_norm_grid(spatial_shape, dtype=jnp.float32):
    """`uniform_norm_grid` flattened to (1, prod(shape), dim)."""
    dim = len(spatial_shape)
    return uniform_norm_grid(spatial_shape, dtype=dtype).reshape(1, -1, dim)


def homogeneous(points):
    """Append a trailing 1 to points: (..., N, d) -> (..., N, d+1)."""
    ones = jnp.ones((*points.shape[:-1], 1), dtype=points.dtype)
    return jnp.concatenate([points, ones], axis=-1)


def apply_matrix(matrix, points):
    """Apply a (d)x(d+1) or (d+1)x(d+1) affine matrix to points.

    Args:
        matrix: (..., d or d+1, d+1)
        points: (..., N, d)
    Returns:
        (..., N, d) transformed points.
    Parity: reference transformations.py:81-114.
    """
    d = points.shape[-1]
    m = matrix[..., :d, :]
    return jnp.einsum(
        "...ij,...nj->...ni", m.astype(points.dtype), homogeneous(points), precision=_PREC
    )
