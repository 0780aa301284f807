from .mesh import make_mesh, local_batch_size, shard_batch, replicate
from .distributed import init_distributed_mode

__all__ = ["make_mesh", "local_batch_size", "shard_batch", "replicate",
           "init_distributed_mode"]
