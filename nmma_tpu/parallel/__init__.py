from .mesh import (initialize_distributed, live_point_sharding,
                   make_mesh, shard_state, state_shardings)

__all__ = ["make_mesh", "live_point_sharding", "shard_state",
           "state_shardings", "initialize_distributed"]
