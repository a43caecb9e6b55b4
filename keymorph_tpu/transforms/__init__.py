from keymorph_tpu.transforms import solvers  # noqa: F401
from keymorph_tpu.transforms.aligners import (  # noqa: F401
    AffineKeypointAligner,
    RigidKeypointAligner,
    TPS,
)
from keymorph_tpu.transforms.affine import AffineTransform  # noqa: F401
