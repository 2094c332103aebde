from .mesh import make_mesh, best_mesh_shape
from .sharding import ShardingRules, logical_to_spec, shard_pytree

__all__ = ["make_mesh", "best_mesh_shape", "ShardingRules", "logical_to_spec", "shard_pytree"]
