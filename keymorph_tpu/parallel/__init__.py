from keymorph_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from keymorph_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    make_sharded_register_fn,
    make_sharded_groupwise_fn,
    make_spatial_register_fn,
)
