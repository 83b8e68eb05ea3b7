from .mesh import make_mesh, data_sharding, replicate_sharding, shard_pytree

__all__ = ["make_mesh", "data_sharding", "replicate_sharding", "shard_pytree"]
