from .mesh import (
    initialize_distributed,
    get_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)

__all__ = ["initialize_distributed", "get_mesh", "shard_batch", "replicate", "data_sharding",
           "replicated_sharding"]
