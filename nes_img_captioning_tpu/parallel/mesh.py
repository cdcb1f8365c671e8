"""Population-parallel execution over a device mesh.

The reference's only scaling axis is population parallelism — N stateless
worker processes pulling (mutation, batch) tasks through Redis
(reference: src/dist.py, SURVEY.md §2.10). On TPU this becomes: a 1-D device
mesh with a ``pop`` axis, population seeds/batch-indices sharded over it,
theta replicated, and the fitness/gradient math jit-partitioned so each chip
evaluates its shard of the population; the gradient reduction is XLA's psum
over the pop axis. Only int32 seeds/indices and scalar fitnesses cross the
host boundary.

Memory control is orthogonal: ``chunked_vmap`` evaluates the population in
``chunk``-sized waves via ``lax.map`` (each wave still spans the whole mesh),
bounding the live theta+activation footprint to chunk × dim per pass.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_population", "chunked_vmap", "pop_axis_size"]

POP_AXIS = "pop"


def make_mesh(mesh_shape=None, devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with a ``pop`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(mesh_shape)) if mesh_shape else len(devices)
    return Mesh(np.array(devices[:n]), axis_names=(POP_AXIS,))


def pop_axis_size(mesh: Mesh | None) -> int:
    return mesh.shape[POP_AXIS] if mesh is not None else 1


def shard_population(mesh: Mesh | None, arr, axis: int = 0):
    """Place ``arr`` with its population axis sharded over the mesh.
    No-op without a mesh (single device)."""
    if mesh is None or pop_axis_size(mesh) == 1:
        return jax.numpy.asarray(arr)
    spec = [None] * np.ndim(arr)
    spec[axis] = POP_AXIS
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh | None, arr):
    if mesh is None or pop_axis_size(mesh) == 1:
        return jax.numpy.asarray(arr)
    return jax.device_put(arr, NamedSharding(mesh, P()))


def chunked_vmap(fn, chunk: int, *args):
    """vmap(fn) over the leading axis, evaluated ``chunk`` rows at a time.

    ``chunk == 0`` (or >= F) → plain vmap. Otherwise the leading axis is
    reshaped to (F//chunk, chunk) and swept with ``lax.map`` — sequential
    waves of a parallel (and mesh-sharded) chunk. F must divide by chunk.
    """
    F = args[0].shape[0]
    if not chunk or chunk >= F:
        return jax.vmap(fn)(*args)
    assert F % chunk == 0, f"population {F} not divisible by pop_chunk {chunk}"
    reshaped = tuple(a.reshape(F // chunk, chunk, *a.shape[1:]) for a in args)
    out = jax.lax.map(lambda xs: jax.vmap(fn)(*xs), reshaped)
    return jax.tree_util.tree_map(
        lambda o: o.reshape(F, *o.shape[2:]), out
    )
