from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch_size, train_state_sharding)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch_size", "train_state_sharding"]
