"""Population-parallel execution over a device mesh.

The reference's only scaling axis is population parallelism — N stateless
worker processes pulling (mutation, batch) tasks through Redis
(reference: src/dist.py, SURVEY.md §2.10). On TPU this becomes: a 1-D device
mesh with a ``pop`` axis, population seeds/batch-indices sharded over it,
theta replicated, and the fitness/gradient math jit-partitioned so each chip
evaluates its shard of the population; the gradient reduction is XLA's psum
over the pop axis. Only int32 seeds/indices and scalar fitnesses cross the
host boundary.

Memory control is orthogonal and lives in the engines: they sweep the
population in ``pop_chunk``-sized lax.map waves of a mesh-sharded vmap
(algorithms/engine_base.py), bounding the live theta+activation footprint to
chunk × dim per wave.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_population", "pop_axis_size"]

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
    No-op without a mesh (single device). Multi-controller meshes build the
    global array from each process's slice of the (identical) host array."""
    if mesh is None or pop_axis_size(mesh) == 1:
        return jax.numpy.asarray(arr)
    spec = [None] * np.ndim(arr)
    spec[axis] = POP_AXIS
    sharding = NamedSharding(mesh, P(*spec))
    if jax.process_count() > 1:
        host = np.asarray(arr)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )
    return jax.device_put(arr, sharding)


