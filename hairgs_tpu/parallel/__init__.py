from hairgs_tpu.parallel.mesh import (
    make_mesh,
    shard_view_batch,
    replicate,
    make_sharded_gaussian_step,
)
