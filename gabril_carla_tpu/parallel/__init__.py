from .distributed import maybe_init_distributed
from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "maybe_init_distributed"]
