"""Shared population-engine machinery: chunked mesh-sharded sweeps.

Both engines evaluate a population of individuals built on the fly from
(seed, lineage) data: the sweep is laid out as (n_chunks, chunk, ...) — the
chunk axis sharded over the mesh's ``pop`` axis so every lax.map wave runs on
all chips, with n_chunks sequential waves bounding live memory to
chunk x dim (SURVEY.md §7.2 step 4).

Shape policy: the chunk is always a mesh multiple and the population is
padded up to n_chunks * chunk by repeating the final member (valid inputs,
redundant compute); results are sliced back to the true count, and gradient
weights for pad lanes are zeroed by the callers. This keeps wave count ~
ceil(N / pop_chunk) for every N — the round-1 divisor-growth scheme
degenerated to a single full-population wave whenever N was prime-ish,
defeating the memory bound pop_chunk exists for.
"""

from __future__ import annotations

import jax
import numpy as np

from ..parallel.mesh import pop_axis_size, shard_population

__all__ = ["PopulationEngine"]


class PopulationEngine:
    def __init__(self, task, mesh=None, pop_chunk: int = 0,
                 rng_impl: str = ""):
        self.task = task
        self.mesh = mesh
        self.pop_chunk = pop_chunk
        self.rng_impl = rng_impl or None
        self.dim = task.spec.num_params

    def _mk_key(self, seed):
        """Member seed -> PRNG key. tpu.rng_impl selects the stream family
        (threefry default; "rbg" is ~2.5x faster on TPU). Works under jit
        with traced seeds; eval and update phases call this with identical
        seeds, so the seed-replay contract is impl-independent."""
        return jax.random.key(seed, impl=self.rng_impl)

    def _plan(self, n: int) -> tuple[int, int]:
        """(n_waves, chunk) for an n-member sweep. The chunk defaults to the
        full population, is capped at n, and is rounded UP to a mesh multiple
        so every wave shards evenly (pads, never drops)."""
        ndev = pop_axis_size(self.mesh)
        chunk = self.pop_chunk or n
        chunk = max(min(chunk, n), 1)
        chunk = -(-chunk // ndev) * ndev
        return -(-n // chunk), chunk

    # former name, kept for API continuity with round-1 tests
    _chunks = _plan

    def _lay_out(self, arr: np.ndarray, n_chunks: int, chunk: int):
        """(N, ...) host array -> (n_chunks, chunk, ...) padded by repeating
        the last member. Sharded over the mesh when one exists; without a
        mesh the HOST array is returned as-is — the jit dispatch transfers
        it asynchronously, where an explicit device_put is a synchronous
        round trip (~30 ms RTT on this harness's tunnel)."""
        arr = np.asarray(arr)
        pad = n_chunks * chunk - arr.shape[0]
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
        arr = arr.reshape(n_chunks, chunk, *arr.shape[1:])
        if self.mesh is None or pop_axis_size(self.mesh) == 1:
            return arr
        return shard_population(self.mesh, arr, axis=1)

    def _replicated(self, x):
        """Host array -> device array consumable by this engine's programs.
        Multi-controller meshes require GLOBAL arrays (replicated here);
        single-process execution keeps the plain local transfer."""
        import jax.numpy as jnp

        if self.mesh is not None and jax.process_count() > 1:
            from ..parallel.multihost import replicate_global

            return replicate_global(self.mesh, np.asarray(x))
        return jnp.asarray(x)

    def _out_shardings(self):
        """Multi-controller: pin every jit output to mesh-replicated so the
        host can fetch results (XLA otherwise may leave outputs sharded
        across non-addressable devices). None single-controller."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            return NamedSharding(self.mesh, PartitionSpec())
        return None

    def _unchunk(self, out, n: int):
        """Flatten (n_chunks, chunk, ...) leaves and drop the pad lanes."""
        return jax.tree_util.tree_map(
            lambda o: o.reshape(-1, *o.shape[2:])[:n], out
        )
