"""The KeyMorph registration pipeline.

Two layers:

1. **Functional core** (`extract_keypoints`, `align_pair`) — pure, jit/vmap/
   grad-safe functions used by the training step, the bench, and the sharded
   multi-chip paths.
2. **`KeyMorph` orchestrator** — mirrors the reference's ``nn.Module`` API
   (keymorph/model.py:22-530): ``model(img_f, img_m, transform_type=[...],
   return_aligned_points=True)`` returning the same result-dict contract
   ``{align_type_str: {grid, points_f, points_m, points_weights, tps_lmbda,
   time_keypoint_extract, time_align, time, [matrix], [points_a]}}``
   (model.py:274-288), plus ``groupwise_register`` (model.py:295-530).

Keypoints are `ij`-indexed, in [-1, 1]. Images are channel-first
(B, 1, *spatial) at this boundary; channel-last conversion happens inside.
"""

from __future__ import annotations

import math
import os
import re
import time
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from keymorph_tpu.ops import coords as Coords
from keymorph_tpu.transforms import solvers
from keymorph_tpu.models.layers import center_of_mass, LinearRegressor

RegistrationResult = Dict[str, Dict[str, Any]]

_TPS_RE = re.compile(r"^tps_(.+)$")


def train_extract_net(net: "KeyMorphNet") -> "KeyMorphNet":
    """Extraction-path policy for the jitted train/pretrain steps.

    Default is the fused-kernel extraction: with the Pallas-backed conv
    backward (ops/pallas/conv3d.py::_conv_bwd) it measures 405.9 vs 414.6
    ms/step against the flax channel-last path on the canonical 128^3
    config (tools/train_step_bench.py, round 4; before the Pallas backward
    it LOST 444.5 vs 420.0). ``KM_TRAIN_FAST_EXTRACT=0`` opts back out.
    """
    fast = os.environ.get("KM_TRAIN_FAST_EXTRACT", "1") != "0"
    return net.clone(fast_extract=fast)


def is_supported_transform_type(s: str) -> bool:
    """Parity: reference model.py:134-140."""
    return s in ("affine", "rigid") or bool(_TPS_RE.match(s))


def parse_transform_type(s: str) -> Tuple[str, Optional[Union[float, str]]]:
    """'tps_0.1' -> ('tps', 0.1); 'tps_loguniform' -> ('tps', 'loguniform')."""
    m = _TPS_RE.match(s)
    if m:
        v = m.group(1)
        try:
            return "tps", float(v)
        except ValueError:
            return "tps", v
    assert s in ("affine", "rigid"), f"Invalid transform_type {s}"
    return s, None


def sample_tps_lmbda(key, num_samples, spec, max_rand_tps_lmbda=10.0):
    """Per-batch lambda values: constant, 'uniform', or 'loguniform'.

    Parity: reference model.py:119-132 (torch.rand / scipy loguniform.rvs),
    with explicit jax.random keys.
    """
    if spec == "uniform":
        return jax.random.uniform(key, (num_samples,)) * max_rand_tps_lmbda
    if spec == "loguniform":
        a, b = 1e-6, max_rand_tps_lmbda
        u = jax.random.uniform(key, (num_samples,))
        return jnp.exp(u * (math.log(b) - math.log(a)) + math.log(a))
    return jnp.full((num_samples,), float(spec), jnp.float32)


class KeyMorphNet(nn.Module):
    """Backbone + keypoint head + optional variance-weighting parameters.

    The trainable part of the pipeline (what checkpoints carry). Parity:
    reference KeyMorph.__init__/get_keypoints/weight_by_* (model.py:22-117).
    """

    backbone: nn.Module
    num_keypoints: int
    dim: int = 3
    keypoint_layer: str = "com"  # "com" | "linear"
    weight_keypoints: Optional[str] = None  # None | "variance" | "power"
    compute_dtype: jnp.dtype = jnp.float32  # bf16 == the reference's AMP mode
    # route extraction through the fused Pallas conv executor when the
    # backbone supports it (models/fast_unet.py). Training factories clone
    # with False: the kernel's VJP falls back to XLA convs whose backward
    # layout is untuned, so the flax path stays the training default.
    fast_extract: bool = True

    def setup(self):
        if self.weight_keypoints == "variance":
            self.scales = self.param(
                "scales", lambda k: jnp.ones((self.num_keypoints,))
            )
            self.biases = self.param(
                "biases", lambda k: jnp.zeros((self.num_keypoints,))
            )
        if self.keypoint_layer == "linear":
            self.regressor = LinearRegressor(self.num_keypoints, self.dim)

    def features(self, img):
        """img (B, 1, *spatial) channel-first -> heatmaps (B, *spatial', K)."""
        if self.fast_extract and not self.is_initializing():
            from keymorph_tpu.models.fast_unet import (
                fast_unet_forward,
                supports_fast_unet,
            )
            from keymorph_tpu.ops.pallas.conv3d import fast_conv_enabled

            if supports_fast_unet(self.backbone) and fast_conv_enabled():
                fp = self.variables["params"]["backbone"]
                return fast_unet_forward(self.backbone, fp, img)
        x = jnp.moveaxis(img, 1, -1).astype(self.compute_dtype)
        return self.backbone(x)

    def keypoints_from_features(self, feat):
        if self.keypoint_layer == "com":
            return center_of_mass(feat, indexing="ij")
        return self.regressor(feat)

    def get_keypoints(self, img, return_feat=False):
        feat = self.features(img)
        points = self.keypoints_from_features(feat)
        if return_feat:
            return points, feat
        return points

    def weight_by_variance(self, feat1, feat2):
        """Inverse-variance keypoint confidence (model.py:75-93). Normalized
        per batch row (the reference's un-normalized-broadcast bug fixed)."""
        spatial_axes = tuple(range(1, feat1.ndim - 1))
        f1 = jax.nn.relu(feat1.astype(jnp.float32))
        f2 = jax.nn.relu(feat2.astype(jnp.float32))
        var1 = jnp.var(f1, axis=spatial_axes)  # (B, K)
        var2 = jnp.var(f2, axis=spatial_axes)
        # eps guards all-negative heatmap channels (var=0 -> inf/NaN at init;
        # the reference NaNs identically before biases are learned)
        eps = 1e-8
        w1 = 1.0 / (self.scales * var1 + self.biases + eps)
        w2 = 1.0 / (self.scales * var2 + self.biases + eps)
        w = w1 * w2
        return w / jnp.sum(w, axis=-1, keepdims=True)

    def weight_by_power(self, feat1, feat2):
        """Heatmap-mass keypoint confidence (model.py:95-109)."""
        spatial_axes = tuple(range(1, feat1.ndim - 1))
        p1 = jnp.sum(jax.nn.relu(feat1.astype(jnp.float32)), axis=spatial_axes)
        p2 = jnp.sum(jax.nn.relu(feat2.astype(jnp.float32)), axis=spatial_axes)
        w = p1 * p2
        return w / jnp.sum(w, axis=-1, keepdims=True)

    def __call__(self, img_f, img_m):
        """Extract keypoints (and weights) for a pair. Returns
        (points_f, points_m, weights-or-None).

        Fixed and moving deliberately run as two separate backbone passes:
        co-extracting them as one (2B, ...) batch was measured SLOWER on the
        v5e (10.75 vs 14.24 reg/s at 128^3 — batched 3D convs schedule
        sub-linearly on this chip) and doubles peak activation memory
        (OOMs the 256^3 compile at 17.0 of 15.75 GB HBM).
        """
        points_f, feat_f = self.get_keypoints(img_f, return_feat=True)
        points_m, feat_m = self.get_keypoints(img_m, return_feat=True)
        if self.weight_keypoints == "variance":
            weights = self.weight_by_variance(feat_f, feat_m)
        elif self.weight_keypoints == "power":
            weights = self.weight_by_power(feat_f, feat_m)
        else:
            weights = None
        return points_f, points_m, weights

    def pair_ranked_by_mass(self, img_f, img_m):
        """Pair extraction with keypoints permuted by DESCENDING joint
        heatmap mass (the weight_by_power statistic, un-normalized).

        Serving aid for approximate TPS: ``solvers.fit_tps_approximate``
        takes the FIRST S keypoints as RBF centers, so channel order is the
        center-selection policy. The reference experiment subsamples centers
        by choice (keypoint_aligners.py:495-499); arbitrary channel order
        (round-4 state) wastes that choice — high-mass channels are the
        confident, well-localized keypoints.
        """
        points_f, feat_f = self.get_keypoints(img_f, return_feat=True)
        points_m, feat_m = self.get_keypoints(img_m, return_feat=True)
        if self.weight_keypoints == "variance":
            weights = self.weight_by_variance(feat_f, feat_m)
        elif self.weight_keypoints == "power":
            weights = self.weight_by_power(feat_f, feat_m)
        else:
            weights = None
        axes = tuple(range(1, feat_f.ndim - 1))
        mass = jnp.sum(jax.nn.relu(feat_f.astype(jnp.float32)), axis=axes) * jnp.sum(
            jax.nn.relu(feat_m.astype(jnp.float32)), axis=axes
        )  # (B, K)
        order = jnp.argsort(-mass, axis=1)
        points_f = jnp.take_along_axis(points_f, order[..., None], axis=1)
        points_m = jnp.take_along_axis(points_m, order[..., None], axis=1)
        if weights is not None:
            weights = jnp.take_along_axis(weights, order, axis=1)
        return points_f, points_m, weights


# ---------------------------------------------------------------------------
# Functional alignment core
# ---------------------------------------------------------------------------


def align_pair(
    points_f,
    points_m,
    align_type: str,
    grid_shape: Sequence[int],
    lmbda=None,
    weights=None,
    num_chunks: int = 1,
    compute_grid: bool = True,
    compute_aligned_points: bool = False,
    aff_f=None,
    aff_m=None,
    moving_shape: Optional[Sequence[int]] = None,
    tps_centers: Optional[int] = None,
    allow_pallas: bool = True,
):
    """Fit the requested transform and produce flow grid / matrices / points.

    Pure function of arrays + static config — the jitted heart of both
    pairwise registration and the training step.

    When ``aff_f``/``aff_m`` ((B, d+1, d+1) NIfTI voxel->world affines) are
    given, keypoints are converted to REAL-WORLD coordinates before the fit
    and the flow grid maps back through the moving image's affine — the
    reference's ``align_keypoints_in_real_world_coords`` mode
    (model.py:179-199, 231-263). ``moving_shape`` is the moving image's
    spatial shape (defaults to ``grid_shape``).

    Returns a dict with keys among {"grid", "matrix", "points_a"}.
    `grid` is `xy`-ordered, shaped (B, *grid_shape, dim) — the reference's
    result contract (model.py:264-288).

    ``tps_centers=S`` (TPS only) switches to the approximate-TPS serving
    solver: least-squares fit against the first S keypoints as RBF centers,
    making every downstream flow/point evaluation O(S) instead of O(K) —
    for large keypoint counts (K >= 256). Composes with both the planes
    path and the chunked grid path.

    ``compute_grid="planes"`` is the planes-native serving variant: instead
    of ``out["grid"]`` it produces ``out["planes"]`` — `ij`-ordered (B, 3,
    *grid_shape) coordinate planes, exactly ``flip(moveaxis(grid, -1, 1),
    1)`` — for :func:`keymorph_tpu.ops.resample.align_planes`. On the
    non-real-world TPS path the planes come straight from the fused flow
    kernel (identity grid generated in-kernel, plane-major output): no
    (N, 3) points tensor and no minor-dim-3 transpose ever touch HBM.

    ``allow_pallas=False`` keeps every Pallas kernel (fused TPS flow /
    planes) out of the traced program — REQUIRED when this function is
    traced inside a GSPMD-partitioned jit (sharded inputs without
    shard_map): the tpu_custom_call has no partitioning rule, so GSPMD
    either fails to partition it or replicates the flow per chip. Same
    rule as ops/resample.py::grid_sample. shard_map'd callers
    (parallel/sharded.py) keep the kernels.
    """
    out: Dict[str, Any] = {}
    want_planes = compute_grid == "planes"
    spatial = tuple(grid_shape)
    spatial_m = tuple(moving_shape) if moving_shape is not None else spatial
    rw = aff_f is not None
    pf, pm = points_f, points_m
    if rw:
        assert aff_m is not None
        pf = Coords.convert_points_norm2real(pf, aff_f, spatial)
        pm = Coords.convert_points_norm2real(pm, aff_m, spatial_m)

    def _grid_flat():
        B, d = points_f.shape[0], points_f.shape[-1]
        n = int(np.prod(spatial))
        g = jnp.broadcast_to(Coords.flat_norm_grid(spatial), (B, n, d))
        return Coords.convert_points_norm2real(g, aff_f, spatial) if rw else g

    def _finish_grid(moved):
        B, d = points_f.shape[0], points_f.shape[-1]
        if rw:
            moved = Coords.convert_points_real2norm(moved, aff_m, spatial_m)
        return jnp.flip(moved.reshape(B, *spatial, d), axis=-1)

    def _store_grid(grid):
        if want_planes:
            # generic planes conversion (affine / rigid / rw / fallback
            # paths); the hot non-rw TPS path below never builds the grid
            out["planes"] = jnp.flip(jnp.moveaxis(grid, -1, 1), axis=1)
        else:
            out["grid"] = grid

    if align_type in ("affine", "rigid"):
        fit = solvers.fit_affine if align_type == "affine" else solvers.fit_rigid
        inverse = solvers.square_matrix(fit(pf, pm, weights))
        matrix = jnp.linalg.inv(inverse)
        out["matrix"] = matrix
        if compute_grid:
            if rw:
                _store_grid(_finish_grid(Coords.apply_matrix(inverse, _grid_flat())))
            else:
                from keymorph_tpu.transforms.affine import affine_flow

                _store_grid(affine_flow(inverse, spatial))
        if compute_aligned_points:
            pa = Coords.apply_matrix(matrix, pm)
            if rw:
                pa = Coords.convert_points_real2norm(pa, aff_f, spatial)
            out["points_a"] = pa
    elif align_type == "tps":
        assert lmbda is not None
        # approximate-TPS serving mode (reference's ApproximateTPS intent,
        # keypoint_aligners.py:468-590 — carried there as a commented-out
        # experiment): fit against only the first `tps_centers` RBF centers
        # by least squares, so the dense-flow contraction scales O(S) per
        # voxel instead of O(K) — the lever for K >= 256 keypoint serving.
        # Callers pick the subset by permuting keypoints beforehand.
        approx = tps_centers is not None and int(tps_centers) < pf.shape[1]
        if approx:
            S = int(tps_centers)
            inv_theta = solvers.fit_tps_approximate(pf, pm, lmbda, S, weights)
            ctrl = pf[:, :S]
        else:
            inv_theta = solvers.fit_tps(pf, pm, lmbda, weights)
            ctrl = pf
        if compute_grid and want_planes and not rw and allow_pallas:
            from keymorph_tpu.ops.pallas import tpsflow

            out["planes"] = tpsflow.tps_planes(inv_theta, ctrl, spatial)
        elif compute_grid:
            # chunked evaluation marks the inference path (training uses
            # num_chunks=1 and needs native autodiff); num_chunks > 1
            # dispatches the fused Pallas flow kernel where eligible
            # (solvers.tps_eval_chunked). allow_pallas=False (GSPMD
            # callers) takes the chunked XLA formulation; want_planes then
            # falls through to _store_grid's generic planes conversion.
            moved = solvers.tps_eval_chunked(
                inv_theta, ctrl, _grid_flat(), num_chunks,
                allow_pallas=allow_pallas,
            )
            _store_grid(_finish_grid(moved))
        if compute_aligned_points:
            if approx:
                theta = solvers.fit_tps_approximate(pm, pf, lmbda, S, weights)
                pa = solvers.tps_eval(theta, pm[:, :S], pm)
            else:
                theta = solvers.fit_tps(pm, pf, lmbda, weights)
                pa = solvers.tps_eval(theta, pm, pm)
            if rw:
                pa = Coords.convert_points_real2norm(pa, aff_f, spatial)
            out["points_a"] = pa
    else:
        raise ValueError(f"Unknown align_type {align_type}")
    return out


@partial(jax.jit, static_argnames=("align_type", "num_iters"))
def _groupwise_iterate(points, lmbda, weights, *, align_type, num_iters):
    """num_iters rounds of register-to-the-mean as ONE device program
    (reference model.py:331-394; round 1 ran it eagerly — every op a
    dispatch). Returns (final aligned points, the mean the grids target:
    the mean over the input of the final iteration)."""
    lm = (
        jnp.broadcast_to(lmbda, (points.shape[0],)) if lmbda is not None else None
    )

    def body(curr, _):
        mean_points = jnp.mean(curr, axis=0, keepdims=True)
        aligned = align_pair(
            jnp.broadcast_to(mean_points, curr.shape),
            curr,
            align_type,
            (),
            lmbda=lm,
            weights=weights,
            compute_grid=False,
            compute_aligned_points=True,
        )["points_a"]
        return aligned, mean_points

    curr, means = jax.lax.scan(body, points, None, length=num_iters)
    return curr, means[-1]


@partial(
    jax.jit,
    static_argnames=("align_type", "spatial", "num_chunks", "allow_pallas"),
)
def _groupwise_grids(mean_points, pts, lmbda, weights, *, align_type, spatial,
                     num_chunks, allow_pallas=True):
    """Dense grids for a chunk of subjects, original points -> group mean,
    in one dispatch (reference model.py:453-510). Mesh callers pass
    ``allow_pallas=False``: `pts` arrives GSPMD-sharded over 'data' and the
    fused TPS-flow tpu_custom_call has no partitioning rule."""
    return align_pair(
        jnp.broadcast_to(mean_points, pts.shape),
        pts,
        align_type,
        spatial,
        lmbda=lmbda,
        weights=weights,
        num_chunks=num_chunks,
        compute_grid=True,
        allow_pallas=allow_pallas,
    )["grid"]


def subsample_keypoints(key, points_f, points_m, weights, max_keypoints):
    """Random keypoint mini-batch for TPS training (model.py:209-222)."""
    K = points_f.shape[1]
    idx = jax.random.permutation(key, K)[:max_keypoints]
    points_f = points_f[:, idx]
    points_m = points_m[:, idx]
    if weights is not None:
        weights = weights[:, idx]
    return points_f, points_m, weights


# ---------------------------------------------------------------------------
# Orchestrator with reference API parity
# ---------------------------------------------------------------------------


class KeyMorph:
    """High-level pipeline mirroring the reference ``KeyMorph`` module.

    Holds a :class:`KeyMorphNet` definition + its params and exposes:
      * ``get_keypoints(img)``
      * ``__call__(img_f, img_m, transform_type=..., return_aligned_points=...)``
      * ``groupwise_register(inputs, transform_type=[...], **kwargs)``

    Unlike the torch reference, the heavy work runs through cached jitted
    callables; wall-clock timing fields in the result dict measure actual
    device time via ``block_until_ready``.
    """

    def __init__(
        self,
        backbone: nn.Module,
        num_keypoints: int,
        dim: int = 3,
        keypoint_layer: str = "com",
        max_train_keypoints: Optional[int] = None,
        use_amp: bool = False,
        use_checkpoint: bool = False,
        weight_keypoints: Optional[str] = None,
        align_keypoints_in_real_world_coords: bool = False,
        max_rand_tps_lmbda: float = 10.0,
        num_subgrids: int = 4,
        num_tps_centers: Optional[int] = None,
    ):
        assert weight_keypoints in (None, "variance", "power")
        self.net = KeyMorphNet(
            backbone=backbone,
            num_keypoints=num_keypoints,
            dim=dim,
            keypoint_layer=keypoint_layer,
            weight_keypoints=weight_keypoints,
            compute_dtype=jnp.bfloat16 if use_amp else jnp.float32,
        )
        self.num_keypoints = num_keypoints
        self.dim = dim
        self.max_train_keypoints = max_train_keypoints
        self.use_amp = use_amp
        self.use_checkpoint = use_checkpoint
        self.weight_keypoints = weight_keypoints
        self.align_keypoints_in_real_world_coords = align_keypoints_in_real_world_coords
        self.max_rand_tps_lmbda = max_rand_tps_lmbda
        self.num_subgrids = num_subgrids
        # serving-only approximate-TPS: evaluate the spline with only the
        # first `num_tps_centers` RBF centers (solvers.fit_tps_approximate —
        # the reference's ApproximateTPS intent, keypoint_aligners.py:468-590).
        # The lever for K >= 256 keypoints; training always uses the exact
        # solver (it already bounds cost via max_train_keypoints).
        self.num_tps_centers = num_tps_centers
        self.params = None
        self.training = False
        # GSPMD rule (ops/resample.py::grid_sample): Pallas tpu_custom_calls
        # (fused conv extraction, fused TPS flow) have no partitioning rule.
        # Callers that feed this model GSPMD-sharded inputs (eval mesh
        # fan-out, groupwise mesh=...) set allow_pallas=False so every
        # jitted program traced here stays partitionable; shard_map'd
        # callers (parallel/sharded.py) keep the kernels.
        self.allow_pallas = True
        self._extract_jit = None
        self._get_keypoints_jit = None
        self._align_cache = {}
        self._rng = jax.random.PRNGKey(0)

    def set_allow_pallas(self, flag: bool):
        """Toggle Pallas-kernel eligibility for all jitted programs this
        model builds (see __init__ comment); clears the extraction jit
        caches so the next call traces the right path."""
        flag = bool(flag)
        if flag != self.allow_pallas:
            self.allow_pallas = flag
            self._extract_jit = None
            self._get_keypoints_jit = None
        return self

    # -- param management ---------------------------------------------------
    def init_params(self, rng, example_img):
        """Initialize network parameters from an example (B, 1, *S) image."""
        self.params = self.net.init(
            rng, jnp.asarray(example_img), jnp.asarray(example_img)
        )
        return self.params

    def train(self, mode=True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    def seed_rng(self, seed: int):
        self._rng = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    # -- keypoint extraction --------------------------------------------------
    def _extract_net(self):
        """The net the jitted extraction programs trace: with allow_pallas
        off, extraction must not reach the fused Pallas conv executor
        (fast_unet) — its tpu_custom_call cannot be GSPMD-partitioned."""
        return self.net if self.allow_pallas else self.net.clone(fast_extract=False)

    def _ensure_extract_jit(self):
        if self._extract_jit is None:
            net = self._extract_net()
            if self.num_tps_centers:
                # approx-TPS serving: emit keypoints mass-ranked so the
                # first-S RBF centers are the highest-confidence channels
                # (see KeyMorphNet.pair_ranked_by_mass)
                self._extract_jit = jax.jit(
                    lambda p, f, m: net.apply(
                        p, f, m, method=KeyMorphNet.pair_ranked_by_mass
                    )
                )
            else:
                self._extract_jit = jax.jit(lambda p, f, m: net.apply(p, f, m))
        return self._extract_jit

    def get_keypoints(self, img, return_feat=False):
        """Parity: reference model.py:111-117."""
        assert self.params is not None, "call init_params first"
        if self._get_keypoints_jit is None:
            self._get_keypoints_jit = jax.jit(
                partial(self._extract_net().apply, method=KeyMorphNet.get_keypoints),
                static_argnames=("return_feat",),
            )
        return self._get_keypoints_jit(
            self.params, jnp.asarray(img), return_feat=return_feat
        )

    def _convert_tps_lmbda(self, num_samples, tps_lmbda):
        """Parity: reference model.py:119-132."""
        return sample_tps_lmbda(
            self._next_key(), num_samples, tps_lmbda, self.max_rand_tps_lmbda
        )

    is_supported_transform_type = staticmethod(is_supported_transform_type)

    def _get_align_fn(
        self, align_type, spatial_f, spatial_m, rw, num_chunks, ret_pts,
        tps_centers=None,
    ):
        """Cached jitted alignment program: fit + grid (+ matrix, + points_a)
        in ONE device dispatch. Replaces the eager aligner-object path for
        the forward contract; wrappers remain the public aligner API."""
        allow_pallas = self.allow_pallas
        key = (align_type, spatial_f, spatial_m, rw, num_chunks, ret_pts,
               tps_centers, allow_pallas)
        if key in self._align_cache:
            return self._align_cache[key]

        def fn(points_f, points_m, weights, lmbda, aff_f, aff_m):
            return align_pair(
                points_f,
                points_m,
                align_type,
                spatial_f,
                lmbda=lmbda,
                weights=weights,
                num_chunks=num_chunks,
                allow_pallas=allow_pallas,
                compute_grid=True,
                compute_aligned_points=ret_pts,
                aff_f=aff_f if rw else None,
                aff_m=aff_m if rw else None,
                moving_shape=spatial_m,
                tps_centers=tps_centers,
            )

        jitted = jax.jit(fn)
        self._align_cache[key] = jitted
        return jitted

    # -- pairwise forward -----------------------------------------------------
    def __call__(self, img_f, img_m, transform_type="affine", **kwargs):
        return self.forward(img_f, img_m, transform_type, **kwargs)

    def forward(
        self, img_f, img_m, transform_type="affine", **kwargs
    ) -> RegistrationResult:
        """One forward pass; many transform types per keypoint extraction.

        Parity: reference model.py:142-289 (same result-dict contract).
        kwargs: return_aligned_points (default False), aff_f/aff_m for
        real-world alignment mode.
        """
        return_aligned_points = kwargs.get("return_aligned_points", False)
        if not isinstance(transform_type, (list, tuple)):
            transform_type = [transform_type]
        if self.training:
            assert len(transform_type) == 1, "Only one alignment type in training"
        assert all(is_supported_transform_type(s) for s in transform_type)

        img_f = jnp.asarray(img_f)
        img_m = jnp.asarray(img_m)
        assert img_f.shape[1] == 1 and img_m.shape[1] == 1, "Image channel must be 1"

        rw = self.align_keypoints_in_real_world_coords
        if rw:
            aff_f, aff_m = jnp.asarray(kwargs["aff_f"]), jnp.asarray(kwargs["aff_m"])
            shape_f, shape_m = img_f.shape[2:], img_m.shape[2:]
        else:
            aff_f = aff_m = None
            shape_f = shape_m = None

        t0 = time.time()
        extract = self._ensure_extract_jit()
        points_f, points_m, weights = extract(self.params, img_f, img_m)
        jax.block_until_ready(points_f)
        keypoint_extract_time = time.time() - t0

        result: RegistrationResult = {}
        for align_type_str in transform_type:
            t0 = time.time()
            align_type, lmbda_spec = parse_transform_type(align_type_str)
            tps_lmbda = (
                self._convert_tps_lmbda(len(img_f), lmbda_spec)
                if align_type == "tps"
                else None
            )

            p_f, p_m, w = points_f, points_m, weights
            if (
                self.training
                and align_type == "tps"
                and self.max_train_keypoints
                and self.num_keypoints > self.max_train_keypoints
            ):
                p_f, p_m, w = subsample_keypoints(
                    self._next_key(), p_f, p_m, w, self.max_train_keypoints
                )

            num_chunks = 1 if self.training else self.num_subgrids
            tps_centers = (
                self.num_tps_centers
                if align_type == "tps" and not self.training
                else None
            )
            align_fn = self._get_align_fn(
                align_type,
                tuple(img_f.shape[2:]),
                tuple(img_m.shape[2:]),
                rw,
                num_chunks,
                return_aligned_points,
                tps_centers,
            )
            aligned = align_fn(p_f, p_m, w, tps_lmbda, aff_f, aff_m)
            jax.block_until_ready(aligned["grid"])
            align_time = time.time() - t0

            res = {
                "grid": aligned["grid"],
                "points_f": p_f,
                "points_m": p_m,
                "points_weights": w,
                "tps_lmbda": tps_lmbda,
                "time_keypoint_extract": keypoint_extract_time,
                "time_align": align_time,
                "time": keypoint_extract_time + align_time,
            }
            if align_type in ("rigid", "affine"):
                res["matrix"] = aligned["matrix"]
            if return_aligned_points:
                res["points_a"] = aligned["points_a"]
            result[align_type_str] = res
        return result

    def pairwise_register(self, *args, **kwargs):
        """Alias for forward() (the reference's alias is broken; model.py:291-293)."""
        return self.forward(*args, **kwargs)

    # -- groupwise ------------------------------------------------------------
    def groupwise_register(
        self, inputs, transform_type="affine", **kwargs
    ) -> RegistrationResult:
        """Iterative mean-keypoint groupwise registration.

        Parity: reference model.py:295-530 — but the per-subject Python loop
        becomes one batched solve over the subject axis (all subjects register
        to the mean simultaneously), and grids are produced by a scan.

        inputs: directory of ``img_*.npz`` files, list of paths, or an
        (N, 1, *spatial) stacked array.
        kwargs: num_iters (default 5, the reference's groupwise_register_eval
        setting), device/save_dir/save_results_to_disk/log_to_console
        (optional, mirroring the reference model.py:295-330).
        """
        num_iters = int(kwargs.get("num_iters", 5))
        if kwargs.get("mesh") is not None:
            # sharded subject fan-out runs GSPMD-partitioned programs:
            # extraction and dense grids must avoid Pallas custom calls
            # (see set_allow_pallas). Sticky for this model instance —
            # mesh users stay mesh users.
            self.set_allow_pallas(False)
        log = kwargs.get("log_to_console", False)
        save_results_to_disk = kwargs.get("save_results_to_disk", False)
        save_dir = kwargs.get("save_dir")

        if not isinstance(transform_type, (list, tuple)):
            transform_type = [transform_type]

        # Stream subjects; keep only keypoints on device (model.py:396-419).
        if isinstance(inputs, str):
            files = sorted(
                os.path.join(inputs, f)
                for f in os.listdir(inputs)
                if f.endswith(".npz")
            )
            if not files:
                raise ValueError(f"No .npz files found in {inputs}")
            loader = (np.load(f)["img"] for f in files)
            num_subjects = len(files)
        elif isinstance(inputs, (list, tuple)):
            loader = (
                np.load(f)["img"] if isinstance(f, str) else np.asarray(f)
                for f in inputs
            )
            num_subjects = len(inputs)
        else:
            arr = np.asarray(inputs)
            loader = (arr[i : i + 1] for i in range(len(arr)))
            num_subjects = len(arr)

        # Batched keypoint extraction: subjects are streamed from disk in
        # chunks of `kp_batch` and extracted in ONE device dispatch per chunk
        # (the reference — and round 1 — dispatched one subject at a time,
        # model.py:396-419). The final partial chunk is padded to the chunk
        # size so only one program is compiled. With a `mesh`, chunks shard
        # over the 'data' axis — subject fan-out across chips (SURVEY §2.5's
        # groupwise DP; the mean-keypoint collective lives in the sharded
        # factories, parallel/sharded.py).
        mesh = kwargs.get("mesh")
        batch_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_n = int(mesh.shape["data"])
            batch_sh = NamedSharding(mesh, P("data"))
            kp_batch = int(kwargs.get("kp_batch", data_n))
            assert kp_batch % data_n == 0, (
                f"kp_batch={kp_batch} must be a multiple of the mesh 'data' "
                f"axis ({data_n})"
            )
        else:
            kp_batch = int(kwargs.get("kp_batch", min(4, num_subjects)))
        group_points = []
        group_weights = [] if self.weight_keypoints else None
        spatial = None
        chunk: list = []

        def _flush(chunk_imgs):
            n_valid = len(chunk_imgs)
            while len(chunk_imgs) < kp_batch:  # pad to a stable jit signature
                chunk_imgs = chunk_imgs + [chunk_imgs[-1]]
            # chunks stay host-side numpy until here so the sharded put goes
            # host -> each chip directly (staging the concatenated chunk on
            # device 0 first would double-transfer and spike its HBM)
            arr = np.concatenate(chunk_imgs, axis=0)
            if batch_sh is not None:
                imgs = jax.device_put(arr, batch_sh)
            else:
                imgs = jnp.asarray(arr)
            if self.weight_keypoints:
                # per-subject keypoint confidences — weighted groupwise
                # registration, the reference's open TODO (model.py:296,
                # :408-414): "power" = normalized heatmap mass, "variance" =
                # learned inverse-variance, each per subject
                points, feat = self.get_keypoints(imgs, return_feat=True)
                axes = tuple(range(1, feat.ndim - 1))
                if self.weight_keypoints == "power":
                    w = jnp.sum(jax.nn.relu(feat.astype(jnp.float32)), axis=axes)
                else:  # variance
                    var = jnp.var(jax.nn.relu(feat.astype(jnp.float32)), axis=axes)
                    scales = self.params["params"]["scales"]
                    biases = self.params["params"]["biases"]
                    w = 1.0 / (scales * var + biases + 1e-8)
                w = w / jnp.sum(w, axis=-1, keepdims=True)
                group_weights.append(np.asarray(w[:n_valid]))
            else:
                points = self.get_keypoints(imgs)
            group_points.append(np.asarray(points[:n_valid]))

        for i, img in enumerate(loader):
            img = np.asarray(img, np.float32)
            if img.ndim == self.dim + 1:
                img = img[None]
            spatial = img.shape
            chunk.append(img)
            if len(chunk) == kp_batch:
                _flush(chunk)
                chunk = []
                if log:
                    print(f"-> Extracted keypoints through subject {i+1}/{num_subjects}")
        if chunk:
            _flush(chunk)
        group_points = jnp.concatenate([jnp.asarray(p) for p in group_points], axis=0)
        if group_weights is not None:
            group_weights = jnp.concatenate(
                [jnp.asarray(w) for w in group_weights], axis=0
            )

        result: RegistrationResult = {}
        for align_type_str in transform_type:
            t0 = time.time()
            align_type, lmbda_spec = parse_transform_type(align_type_str)
            if align_type == "tps" and not isinstance(lmbda_spec, (int, float)):
                raise ValueError(
                    f"groupwise registration needs a numeric TPS lambda (got "
                    f"tps_{lmbda_spec}); distributional lambdas are a "
                    "training-time feature — pass e.g. transform_type='tps_1'"
                )
            tps_lmbda = (
                self._convert_tps_lmbda(1, lmbda_spec) if align_type == "tps" else None
            )

            curr, mean_points = _groupwise_iterate(
                group_points,
                tps_lmbda,
                group_weights,
                align_type=align_type,
                num_iters=num_iters,
            )
            jax.block_until_ready(curr)

            register_time = time.time() - t0
            res = {
                "time": register_time,
                "grouppoints_m": group_points,
                "grouppoints_a": curr,
            }
            if group_weights is not None:
                res["grouppoints_weights"] = group_weights

            # grids: original points -> final mean points (model.py:453-510).
            # Batched: `grid_batch` subjects' dense grids per device dispatch
            # (round 1 looped one subject per dispatch); the last chunk is
            # padded so one program serves all chunks. Memory: a chunk holds
            # grid_batch × prod(spatial) × d fp32 — default 4 is ~100 MB at
            # 128³; if HBM-tight at 256³ pass grid_batch=1 (single device)
            # or grid_batch=data_n, the mesh-path minimum (one grid/device).
            grid_spatial = spatial[2:]
            if mesh is not None:
                grid_batch = int(kwargs.get("grid_batch", data_n))
                assert grid_batch % data_n == 0, (
                    f"grid_batch={grid_batch} must be a multiple of the mesh "
                    f"'data' axis ({data_n})"
                )
            else:
                grid_batch = int(kwargs.get("grid_batch", min(4, num_subjects)))
            grids = []
            for s in range(0, num_subjects, grid_batch):
                idx = list(range(s, min(s + grid_batch, num_subjects)))
                n_valid = len(idx)
                idx_pad = idx + [idx[-1]] * (grid_batch - n_valid)
                pts = group_points[jnp.asarray(idx_pad)]
                if batch_sh is not None:
                    pts = jax.device_put(pts, batch_sh)
                lm = (
                    jnp.broadcast_to(tps_lmbda, (grid_batch,))
                    if tps_lmbda is not None
                    else None
                )
                g = _groupwise_grids(
                    mean_points,
                    pts,
                    lm,
                    (
                        group_weights[jnp.asarray(idx_pad)]
                        if group_weights is not None
                        else None
                    ),
                    align_type=align_type,
                    spatial=tuple(int(s) for s in grid_spatial),
                    num_chunks=self.num_subgrids,
                    allow_pallas=self.allow_pallas,
                )[:n_valid]
                if save_results_to_disk and save_dir:
                    g_host = np.asarray(g)
                    for j, i in enumerate(idx):
                        path = os.path.join(
                            save_dir, f"{align_type_str}_grid_{i:03}.npy"
                        )
                        np.save(path, g_host[j : j + 1])
                        if log:
                            print(f"-> Saved grid {i+1}/{num_subjects} to {path}")
                else:
                    grids.append(g)
            if grids:
                res["groupgrids"] = jnp.concatenate(grids, axis=0)
            result[align_type_str] = res
        if log:
            print("Groupwise registration complete!")
        return result
