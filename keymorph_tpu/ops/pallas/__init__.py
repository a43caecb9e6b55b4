from keymorph_tpu.ops.pallas.resample3d import (  # noqa: F401
    fast_warp_enabled,
    warp_grid,
    warp_planes,
)
