from lungmask_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from lungmask_tpu.parallel.sharded import (
    ShardedUNetRunner,
    make_sharded_argmax,
    make_sharded_postprocess,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "ShardedUNetRunner",
    "make_sharded_argmax",
    "make_sharded_postprocess",
]
