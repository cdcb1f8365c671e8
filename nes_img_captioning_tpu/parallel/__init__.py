"""Device-mesh parallelism: the population axis replaces the reference's
Redis worker fleet (SURVEY.md §2.10)."""

from .mesh import make_mesh, shard_population, chunked_vmap

__all__ = ["make_mesh", "shard_population", "chunked_vmap"]
