from .mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)

__all__ = ["get_mesh", "shard_batch", "replicate", "data_sharding",
           "replicated_sharding"]
