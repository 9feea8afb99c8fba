from .mesh import (make_mesh, shard_batch, replicate, data_sharding,
                   replicated_sharding, host_local_rows, allgather_rows)
from .distributed import initialize_distributed, is_primary, process_shard

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "replicated_sharding", "host_local_rows", "allgather_rows",
           "initialize_distributed", "is_primary", "process_shard"]
