"""Device-mesh parallelism: the population axis replaces the reference's
Redis worker fleet (SURVEY.md §2.10)."""

from .mesh import make_mesh, pop_axis_size, shard_population

__all__ = ["make_mesh", "pop_axis_size", "shard_population"]
