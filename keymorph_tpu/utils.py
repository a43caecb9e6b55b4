"""General utilities: one-hot encodings, intensity rescaling, keypoint
sampling. Parity anchors: reference keymorph/utils.py:7-240."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def str_or_float(x):
    """Parity: reference utils.py:7-11."""
    try:
        return float(x)
    except ValueError:
        return x


def parse_test_mod(mod):
    """'T1_T2' -> ('T1', 'T2') (reference script_utils.py:15-21 /
    dataset/utils.py:75-80). Canonical home for the helper shared by the
    data layer and the CLI."""
    if isinstance(mod, str):
        mod1, mod2 = mod.split("_")
    else:
        mod1, mod2 = mod
    return mod1, mod2


def aggregate_dicts(dicts):
    """Mean over a list of metric dicts, averaging over the union of keys
    (reference script_utils.py:42-47). Canonical home for the helper shared
    by training and the CLI."""
    from collections import defaultdict

    result = defaultdict(list)
    for d in dicts:
        for k, v in d.items():
            result[k].append(float(v))
    return {k: sum(v) / len(v) for k, v in result.items()}


def one_hot(seg, num_classes: Optional[int] = None):
    """Segmentation labels -> one-hot channels.

    Args:
        seg: (B, 1, *spatial) integer labels.
        num_classes: static channel count (required under jit; defaults to
            max+1 like the reference's F.one_hot, utils.py:200-205).
    Returns:
        (B, C, *spatial) float one-hot.
    """
    seg = jnp.asarray(seg)
    if num_classes is None:
        num_classes = int(jnp.max(seg)) + 1
    oh = jax.nn.one_hot(seg[:, 0].astype(jnp.int32), num_classes, dtype=jnp.float32)
    return jnp.moveaxis(oh, -1, 1)


def one_hot_subsampled_pair(seg1, seg2, subsample_num: int = 14, seed=None):
    """One-hot both segmentations over a random subset of their SHARED labels.

    Host-side (label sets are data-dependent); the result has a fixed channel
    count so downstream Dice jits with a static shape. A FRESH random subset
    is drawn per call (like the reference's global-RNG np.random.choice,
    utils.py:218) unless `seed` pins one for tests.
    Parity: reference utils.py:208-240.
    """
    s1 = np.asarray(seg1)
    s2 = np.asarray(seg2)
    shared = np.intersect1d(np.unique(s1), np.unique(s2), assume_unique=False)
    if len(shared) > subsample_num:
        rng = np.random.default_rng(seed)  # seed=None -> fresh entropy
        selected = rng.choice(shared, subsample_num, replace=False)
    else:
        selected = shared
        subsample_num = len(shared)

    def apply(seg):
        out = np.zeros((seg.shape[0], subsample_num, *seg.shape[2:]), np.float32)
        for i, val in enumerate(selected):
            out[:, i] = (seg[:, 0] == val).astype(np.float32)
        return jnp.asarray(out)

    return apply(s1), apply(s2)


SYNTHSEG_REGION_PAIRS = (
    (0, 24),   # Background and CSF
    (13, 52),  # Pallidum
    (18, 54),  # Amygdala
    (11, 50),  # Caudate
    (3, 42),   # Cerebral Cortex
    (17, 53),  # Hippocampus
    (10, 49),  # Thalamus
    (12, 51),  # Putamen
    (2, 41),   # Cerebral WM
    (8, 47),   # Cerebellum Cortex
    (4, 43),   # Lateral Ventricle
    (7, 46),   # Cerebellum WM
    (16, 16),  # Brain-Stem
)


def one_hot_eval_synthseg(asegs):
    """14-region one-hot of a SynthSeg label volume, merging left/right pairs
    and adding a non-ROI channel. Parity: reference utils.py:164-197."""
    asegs = jnp.asarray(asegs)
    chans = [
        ((asegs[:, 0] == a) | (asegs[:, 0] == b)).astype(jnp.float32)
        for a, b in SYNTHSEG_REGION_PAIRS
    ]
    oh = jnp.stack(chans, axis=1)  # (B, 13, ...)
    non_roi = 1.0 - jnp.sum(oh, axis=1, keepdims=True)
    return jnp.concatenate([oh, non_roi], axis=1)


def rescale_intensity(array, out_range=(0, 1), percentiles=(0, 100)):
    """Percentile-clip + min-max rescale. Parity: reference utils.py:78-94."""
    x = jnp.asarray(array, jnp.float32)
    if tuple(percentiles) != (0, 100):
        lo = jnp.percentile(x, percentiles[0])
        hi = jnp.percentile(x, percentiles[1])
        x = jnp.clip(x, lo, hi)
    in_min = jnp.min(x)
    in_range = jnp.max(x) - in_min
    scale = (out_range[1] - out_range[0]) / jnp.where(in_range == 0, 1.0, in_range)
    return (x - in_min) * scale + out_range[0]


def sample_valid_coordinates(
    x, num_points: int, dim: int, point_space: str = "norm", indexing: str = "xy", seed: int = 0
):
    """Rejection-sample `num_points` coordinates inside the support of `x`.

    Host-side (used once per pretraining run to pick reference keypoints;
    reference utils.py:97-161). Returns coords in [0, 1] ('norm') or voxel
    units, (1, num_points, dim); note the [0,1] range and xy default match
    the reference exactly.
    """
    x = np.asarray(x)
    eps = 0 if dim == 2 else 1e-1
    mask = x > eps
    rng = np.random.default_rng(seed)
    spatial = x.shape[2:]
    idx = np.argwhere(mask[0, 0])  # (M, dim) valid voxels
    if len(idx) == 0:
        raise ValueError("mask has no valid voxels")
    sel = idx[rng.integers(0, len(idx), size=num_points)]
    # reference lists coords reversed (dim3/dim2/dim1 order == xy)
    coords = sel[:, ::-1].astype(np.float64)
    if point_space == "norm":
        coords = coords / np.asarray(spatial[::-1])
    pts = coords.reshape(1, num_points, dim)
    if indexing == "ij":
        pts = pts[..., ::-1]
    return jnp.asarray(pts, jnp.float32)
