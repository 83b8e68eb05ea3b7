from .mesh import make_mesh, data_sharding, replicate_sharding, shard_pytree
from .prefetch import prefetch_to_device

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate_sharding",
    "shard_pytree",
    "prefetch_to_device",
]
