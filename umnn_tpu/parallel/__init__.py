from umnn_tpu.parallel.mesh import (
    batch_sharded,
    data_mesh,
    host_local_batch_to_global,
    initialize_distributed,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharded",
    "data_mesh",
    "host_local_batch_to_global",
    "initialize_distributed",
    "replicated",
    "shard_batch",
]
