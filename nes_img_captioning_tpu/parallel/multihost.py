"""Multi-host execution support.

The reference scales across nodes with a TCP Redis master + per-node relay
mirrors and a shared filesystem for .pth transport (reference: src/dist.py,
SURVEY.md §2.2). The TPU-native equivalent is JAX multi-controller SPMD:
every host runs the same program, ``jax.distributed`` wires the processes,
the mesh spans all global devices, and the population axis shards across
them — there is no task queue and nothing is pickled between hosts.

Requirements this module enforces/documents:

* the experiment must set ``tpu.seed`` — every host draws the same seed and
  batch-index streams, so the SPMD collectives see identical inputs without
  any host-to-host communication (the reference instead ships batches through
  Redis);
* filesystem side effects (model .pth, snapshots, plots) happen on the
  primary host only — use ``is_primary()``.

Elasticity note (SURVEY.md §7.2 step 9): TPU SPMD is gang-scheduled; the
reference's tolerance of worker churn maps to checkpoint-restart via the
z_info snapshots, not to elastic membership.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["init_multihost", "is_primary", "process_count"]


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Initialize jax.distributed (no-op when single-process / already
    initialized). Returns this process's id."""
    if num_processes is not None and num_processes > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                # defaults (100 s heartbeat) declare a host dead whenever it
                # starves that long — routine on a contended 1-core harness
                # (two CPU test processes + a concurrent TPU driver). A
                # starved-but-alive process must survive until the scheduler
                # gets back to it; real failures still trip the barrier.
                heartbeat_timeout_seconds=600,
                shutdown_timeout_seconds=600,
            )
        except RuntimeError as e:  # already initialized
            logger.info("jax.distributed: %s", e)
    logger.info(
        "process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def replicate_global(mesh, x):
    """Place a (pytree of) host array(s) as mesh-replicated GLOBAL arrays.
    Multi-controller jits only accept global arrays; every process must pass
    identical host data (guaranteed here by the shared tpu.seed)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def place(a):
        host = np.asarray(a)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    return jax.tree_util.tree_map(place, x)
