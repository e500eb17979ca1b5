from .mesh import (batch_sharding, make_mesh, replicate, replicated,
                   shard_batch, shard_params_tensor_parallel)
from .multihost import host_seed, host_shard, make_global_batch

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch", "shard_params_tensor_parallel", "host_seed",
           "host_shard", "make_global_batch"]
