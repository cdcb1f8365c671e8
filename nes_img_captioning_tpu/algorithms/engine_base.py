"""Shared population-engine machinery: chunked mesh-sharded sweeps.

Both engines evaluate a population of individuals built on the fly from
(seed, lineage) data: the sweep is laid out as (n_chunks, chunk, ...) — the
chunk axis sharded over the mesh's ``pop`` axis so every lax.map wave runs on
all chips, with n_chunks sequential waves bounding live memory to
chunk x dim (SURVEY.md §7.2 step 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import pop_axis_size

__all__ = ["PopulationEngine"]

class PopulationEngine:
    def __init__(self, task, mesh=None, pop_chunk: int = 0):
        self.task = task
        self.mesh = mesh
        self.pop_chunk = pop_chunk
        self.dim = task.spec.num_params

    def _chunks(self, n: int) -> tuple[int, int]:
        """(n_waves, chunk) for an n-member sweep: chunk defaults to the full
        population, targets at least one member per device, and must divide n
        (grown until it does — XLA pads uneven shards). Populations smaller
        than the mesh run as a single (padded-shard) wave."""
        chunk = self.pop_chunk or n
        chunk = min(chunk, n)
        chunk = min(max(chunk, pop_axis_size(self.mesh)), n)
        while n % chunk:
            chunk += 1
        return n // chunk, chunk

    def _lay_out(self, arr: np.ndarray, n_chunks: int, chunk: int):
        """(N, ...) host array -> (n_chunks, chunk, ...) device array with
        the chunk axis sharded over the mesh (replicated when the chunk does
        not divide the mesh — tiny populations don't benefit from sharding
        and device_put rejects uneven shards)."""
        arr = np.asarray(arr).reshape(n_chunks, chunk, *arr.shape[1:])
        ndev = pop_axis_size(self.mesh)
        if self.mesh is None or ndev == 1 or chunk % ndev:
            return jnp.asarray(arr)
        spec = [None] * arr.ndim
        spec[1] = "pop"
        return jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))

    def _unchunk(self, out, n: int):
        return jax.tree_util.tree_map(
            lambda o: o.reshape(n, *o.shape[2:]), out
        )
