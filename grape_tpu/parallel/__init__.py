from .mesh import (
    make_mesh, shard_problem, build_fg_sharded, ensemble_trajectories,
)

__all__ = [
    "make_mesh", "shard_problem", "build_fg_sharded", "ensemble_trajectories",
]
