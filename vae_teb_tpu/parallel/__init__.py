"""Device mesh construction and sharding policy."""

from .mesh import (batch_sharding, data_parallel_mesh, hybrid_mesh,
                   replicated_sharding, shard_batch, stacked_batch_sharding,
                   tensor_parallel_rule)

__all__ = ["data_parallel_mesh", "hybrid_mesh", "batch_sharding",
           "replicated_sharding", "shard_batch", "stacked_batch_sharding",
           "tensor_parallel_rule"]
