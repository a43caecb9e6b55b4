"""Affine transform primitive: matrix container + dense flow-field generation.

Functional core (`affine_flow`, `apply_matrix`) plus a thin `AffineTransform`
class for API parity with the reference (transformations.py:7-114). Unlike the
reference, everything is batched correctly for B > 1 and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from keymorph_tpu.ops import coords as C


def affine_flow(inverse_matrix, spatial_shape):
    """Dense `xy`-ordered sampling grid for an affine registration.

    Evaluates the fixed->moving (inverse) transform at every point of the
    `ij` linspace(-1,1) meshgrid, then flips the last axis to `xy` order for
    the resampler — the reference's affine_grid + flip
    (transformations.py:37-79).

    Args:
        inverse_matrix: (B, d+1, d+1) fixed->moving matrix.
        spatial_shape: output spatial sizes, length d.
    Returns:
        (B, *spatial_shape, d) grid in [-1, 1], `xy`-ordered.
    """
    d = len(spatial_shape)
    B = inverse_matrix.shape[0]
    grid_flat = C.flat_norm_grid(spatial_shape)  # (1, N, d)
    grid_flat = jnp.broadcast_to(grid_flat, (B, *grid_flat.shape[1:]))
    moved = C.apply_matrix(inverse_matrix, grid_flat)  # (B, N, d)
    return jnp.flip(moved.reshape(B, *spatial_shape, d), axis=-1)


class AffineTransform:
    """Matrix container keeping forward and inverse consistent.

    Parity: reference transformations.py:7-114. `matrix` maps moving->fixed
    points; `inverse_matrix` is used to build sampling grids.
    """

    def __init__(self, matrix=None, inverse_matrix=None, dim=3):
        self.dim = dim
        if matrix is not None and inverse_matrix is None:
            self.transform_matrix = jnp.asarray(matrix)
            self.inverse_transform_matrix = jnp.linalg.inv(self.transform_matrix)
        elif matrix is None and inverse_matrix is not None:
            self.inverse_transform_matrix = jnp.asarray(inverse_matrix)
            self.transform_matrix = jnp.linalg.inv(self.inverse_transform_matrix)
        else:
            raise ValueError("Provide exactly one of matrix or inverse_matrix")

    def affine_grid(self, grid_shape):
        """`ij`-ordered transformed grid; grid_shape is a full (B, C, *S) shape."""
        spatial = tuple(grid_shape[2:])
        moved = affine_flow(self.inverse_transform_matrix, spatial)
        return jnp.flip(moved, axis=-1)  # back to ij

    def get_flow_field(self, grid_shape, **kwargs):
        """`xy`-ordered sampling grid for `align_img` (transformations.py:60-79)."""
        spatial = tuple(grid_shape[2:])
        return affine_flow(self.inverse_transform_matrix, spatial)

    def get_forward_transformed_points(self, points):
        """p_f = A p_m (transformations.py:81-96)."""
        return C.apply_matrix(self.transform_matrix, points)

    def get_inverse_transformed_points(self, points):
        """p_m = A^{-1} p_f (transformations.py:98-114)."""
        return C.apply_matrix(self.inverse_transform_matrix, points)
