from .mesh import (
    initialize_distributed,
    get_mesh,
    get_mesh_2d,
    shard_batch,
    shard_params,
    loader_shard_kwargs,
    pad_to_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)

__all__ = ["initialize_distributed", "get_mesh", "get_mesh_2d",
           "shard_batch", "shard_params", "loader_shard_kwargs",
           "pad_to_batch", "replicate", "data_sharding",
           "replicated_sharding"]
