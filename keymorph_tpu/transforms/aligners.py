"""Keypoint aligner wrappers mirroring the reference's public API.

Thin object layer over the pure solvers in :mod:`keymorph_tpu.transforms.solvers`
so code written against the reference (keypoint_aligners.py) ports directly:

    aligner = AffineKeypointAligner(points_m=..., points_f=...)
    grid = aligner.get_flow_field(img_f.shape, compute_on_subgrids=True)
    pts = aligner.get_forward_transformed_points(points)

All keypoints are `ij`-indexed and in [-1, 1] unless
``align_in_real_world_coords`` is set, in which case they are converted to
scanner coordinates through each image's NIfTI affine first
(reference keypoint_aligners.py:53-66, 116-147).

The jitted hot paths (training/eval steps) bypass these wrappers and call the
solver functions directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from keymorph_tpu.ops import coords as C
from keymorph_tpu.transforms import solvers
from keymorph_tpu.transforms.affine import AffineTransform, affine_flow


def _real_world_points(points, aff, shape):
    return C.convert_points_norm2real(points, aff, shape)


class AffineKeypointAligner(AffineTransform):
    """Closed-form (weighted) least-squares affine alignment.

    Parity: reference keypoint_aligners.py:14-147. Fits fixed->moving (the
    inverse transform, used for resampling) and derives the forward by matrix
    inverse.
    """

    solver = staticmethod(solvers.fit_affine)

    def __init__(
        self,
        points_m,
        points_f,
        w=None,
        dim=3,
        align_in_real_world_coords=False,
        aff_m=None,
        aff_f=None,
        shape_m=None,
        shape_f=None,
    ):
        self.dim = dim
        self.align_in_real_world_coords = align_in_real_world_coords
        self.points_f = jnp.asarray(points_f)
        self.points_m = jnp.asarray(points_m)
        self.shape_f = shape_f
        self.shape_m = shape_m
        if align_in_real_world_coords:
            for name, v in (("aff_f", aff_f), ("aff_m", aff_m),
                            ("shape_f", shape_f), ("shape_m", shape_m)):
                assert v is not None, f"Need {name} for real-world coords"
            self.aff_f = jnp.asarray(aff_f)
            self.aff_m = jnp.asarray(aff_m)
            self.points_m = _real_world_points(self.points_m, self.aff_m, shape_m)
            self.points_f = _real_world_points(self.points_f, self.aff_f, shape_f)
        # fit fixed -> moving (the inverse map), as the reference does
        inv = solvers.square_matrix(self.fit(self.points_f, self.points_m, w=w))
        super().__init__(inverse_matrix=inv, dim=dim)

    def fit(self, x, y, w=None):
        return type(self).solver(x, y, w)

    def get_forward_transformed_points(self, points):
        if self.align_in_real_world_coords:
            points = _real_world_points(points, self.aff_m, self.shape_m)
        points = super().get_forward_transformed_points(points)
        if self.align_in_real_world_coords:
            points = C.convert_points_real2norm(points, self.aff_f, self.shape_f)
        return points

    def get_inverse_transformed_points(self, points):
        if self.align_in_real_world_coords:
            points = _real_world_points(points, self.aff_f, self.shape_f)
        points = super().get_inverse_transformed_points(points)
        if self.align_in_real_world_coords:
            points = C.convert_points_real2norm(points, self.aff_m, self.shape_m)
        return points

    def get_flow_field(self, grid_shape, **kwargs):
        """`xy`-ordered sampling grid over the fixed image's shape.

        In real-world mode the flow composes
        norm_f -> real_f -> (fitted real affine) -> real_m -> norm_m
        (reference transformations.py:60-79 + aligner conversions).
        """
        spatial = tuple(grid_shape[2:])
        if not self.align_in_real_world_coords:
            return affine_flow(self.inverse_transform_matrix, spatial)
        grid_flat = C.flat_norm_grid(spatial)
        B = self.inverse_transform_matrix.shape[0]
        grid_flat = jnp.broadcast_to(grid_flat, (B, *grid_flat.shape[1:]))
        moved = self.get_inverse_transformed_points(grid_flat)
        return jnp.flip(moved.reshape(B, *spatial, self.dim), axis=-1)


class RigidKeypointAligner(AffineKeypointAligner):
    """SVD/Arun rigid alignment (reference keypoint_aligners.py:150-213)."""

    solver = staticmethod(solvers.fit_rigid)


class TPS:
    """Thin-plate-spline alignment with per-batch regularization lambda.

    Parity: reference keypoint_aligners.py:216-465. The inverse spline
    (fixed->moving) drives the sampling grid; the forward spline is fitted
    lazily for point transport.
    """

    def __init__(
        self,
        points_m,
        points_f,
        lmbda,
        w=None,
        dim=3,
        num_subgrids=4,
        use_checkpoint=False,
        align_in_real_world_coords=False,
        aff_m=None,
        aff_f=None,
        shape_m=None,
        shape_f=None,
        num_centers=None,
    ):
        """``num_centers=S`` selects the approximate-TPS solver
        (solvers.fit_tps_approximate — the reference's ApproximateTPS
        intent, keypoint_aligners.py:468-590): the spline carries only the
        first S keypoints as RBF centers, so flow/point evaluation is O(S)
        per query instead of O(K). Permute the keypoints beforehand to
        choose the subset."""
        self.dim = dim
        self.num_subgrids = num_subgrids
        self.use_checkpoint = use_checkpoint
        self.lmbda = jnp.asarray(lmbda, jnp.float32)
        self.weights = w
        self.align_in_real_world_coords = align_in_real_world_coords
        self.points_f = jnp.asarray(points_f)
        self.points_m = jnp.asarray(points_m)
        self.shape_f = shape_f
        self.shape_m = shape_m
        if align_in_real_world_coords:
            for name, v in (("aff_f", aff_f), ("aff_m", aff_m),
                            ("shape_f", shape_f), ("shape_m", shape_m)):
                assert v is not None, f"Need {name} for real-world coords"
            self.aff_f = jnp.asarray(aff_f)
            self.aff_m = jnp.asarray(aff_m)
            self.points_m = _real_world_points(self.points_m, self.aff_m, shape_m)
            self.points_f = _real_world_points(self.points_f, self.aff_f, shape_f)

        K = self.points_f.shape[1]
        self.num_centers = (
            int(num_centers) if num_centers is not None and int(num_centers) < K
            else None
        )
        if self.num_centers is not None:
            import functools

            fit = functools.partial(
                solvers.fit_tps_approximate, num_subsample=self.num_centers
            )
        else:
            fit = solvers.fit_tps
        if use_checkpoint:
            import jax

            fit = jax.checkpoint(fit)
        self._fit = fit
        S = self.num_centers
        self.ctrl_f = self.points_f[:, :S] if S is not None else self.points_f
        self.ctrl_m = self.points_m[:, :S] if S is not None else self.points_m
        self.inverse_theta = fit(self.points_f, self.points_m, self.lmbda, w=w)
        self.theta = None  # forward spline fitted on demand

    # -- point transport ----------------------------------------------------
    def get_inverse_transformed_points(self, points):
        if self.align_in_real_world_coords:
            points = _real_world_points(points, self.aff_f, self.shape_f)
        points = solvers.tps_eval(self.inverse_theta, self.ctrl_f, points)
        if self.align_in_real_world_coords:
            points = C.convert_points_real2norm(points, self.aff_m, self.shape_m)
        return points

    def get_forward_transformed_points(self, points):
        if self.theta is None:
            self.theta = self._fit(
                self.points_m, self.points_f, self.lmbda, w=self.weights
            )
        if self.align_in_real_world_coords:
            points = _real_world_points(points, self.aff_m, self.shape_m)
        points = solvers.tps_eval(self.theta, self.ctrl_m, points)
        if self.align_in_real_world_coords:
            points = C.convert_points_real2norm(points, self.aff_f, self.shape_f)
        return points

    # -- dense flow ---------------------------------------------------------
    def get_flow_field(self, grid_shape, compute_on_subgrids=False):
        """`xy`-ordered sampling grid (reference keypoint_aligners.py:365-397).

        ``compute_on_subgrids`` bounds peak memory by evaluating the spline
        over sequential grid chunks inside jit (lax.map), the TPU equivalent
        of the reference's Python subgrid loop.
        """
        spatial = tuple(grid_shape[2:])
        B = self.inverse_theta.shape[0]
        grid_flat = jnp.broadcast_to(
            C.flat_norm_grid(spatial), (B, int(jnp.prod(jnp.asarray(spatial))), self.dim)
        )
        num_chunks = self.num_subgrids if compute_on_subgrids else 1
        if self.align_in_real_world_coords:
            # conversions are cheap; chunking only matters for the spline
            pts = _real_world_points(grid_flat, self.aff_f, self.shape_f)
            moved = solvers.tps_eval_chunked(
                self.inverse_theta, self.ctrl_f, pts, num_chunks
            )
            moved = C.convert_points_real2norm(moved, self.aff_m, self.shape_m)
        else:
            moved = solvers.tps_eval_chunked(
                self.inverse_theta, self.ctrl_f, grid_flat, num_chunks
            )
        return jnp.flip(moved.reshape(B, *spatial, self.dim), axis=-1)
