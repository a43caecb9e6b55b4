"""keymorph_tpu — a TPU-native keypoint-based medical image registration framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the KeyMorph
reference (alanqrwang/keymorph): CNN keypoint extraction with a differentiable
center-of-mass layer, closed-form rigid/affine/thin-plate-spline keypoint
alignment, dense flow-field generation, trilinear warping, pairwise and
groupwise registration, self-supervised pretraining, and a full evaluation
harness — all designed for XLA compilation and TPU meshes rather than
translated from the reference's PyTorch implementation.

Conventions (matching the reference, see /root/reference SURVEY):
  * keypoints are `ij`-indexed, normalized to [-1, 1] per axis
    (reference: keymorph/layers.py:78-134, keypoint_aligners.py:17-20)
  * sampling grids handed to `align_img` are `xy`-ordered, in [-1, 1],
    with PyTorch's align_corners=False voxel mapping (-1 <-> -0.5 voxel)
    (reference: keymorph/transformations.py:60-79, keymorph/utils.py:14-21)
  * images are channel-first: (B, C, H, W) in 2D, (B, C, D, H, W) in 3D
"""

__version__ = "0.1.0"

from keymorph_tpu.ops import coords, resample  # noqa: F401
from keymorph_tpu.transforms import solvers  # noqa: F401

__all__ = ["coords", "resample", "solvers", "__version__"]
