from nbss_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "replicate", "shard_batch"]
