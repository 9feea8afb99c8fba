from .mesh import make_mesh, shard_batch, replicate, data_sharding, replicated_sharding
from .distributed import initialize_distributed, process_shard

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "replicated_sharding", "initialize_distributed", "process_shard"]
