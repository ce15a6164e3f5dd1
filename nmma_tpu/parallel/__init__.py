from .mesh import live_point_sharding, make_mesh, shard_state

__all__ = ["make_mesh", "live_point_sharding", "shard_state"]
