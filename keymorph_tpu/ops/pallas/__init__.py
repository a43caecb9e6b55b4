from keymorph_tpu.ops.pallas.warp import (  # noqa: F401
    tps_flow_planes,
    affine_flow_planes,
    grid_sample_planes,
    tps_register_warp,
    affine_register_warp,
    planes_to_grid,
)
from keymorph_tpu.ops.pallas.resample3d import (  # noqa: F401
    warp_grid,
    warp_planes,
)
