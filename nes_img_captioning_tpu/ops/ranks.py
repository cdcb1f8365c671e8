"""Centered-rank fitness shaping and the NES gradient estimate.

Device-side reimplementation of the reference's master-side gradient math
(reference: src/algorithm/nic_nes/nic_nes_master.py:170-221, itself from
openai/evolution-strategies-starter). Where the reference dots rank weights
with a host-resident (F, dim) matrix of shipped noise vectors in numpy batches
of 500, here the noise rows live on device (regenerated from seeds) and the
weighted sum is a single matmul that XLA partitions over the population axis
of the mesh (a psum over shards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compute_ranks", "compute_centered_ranks", "nes_gradient"]


def compute_ranks(x: jax.Array) -> jax.Array:
    """Ranks in [0, len(x)) — rank of each element in ascending order.

    Matches reference compute_ranks (nic_nes_master.py:196-205):
    ``ranks[x.argsort()] = arange(len(x))``. Documented deviation on TIES
    (see README "Deliberate behavioral deviations"): jnp.argsort is stable,
    so tied fitnesses rank in position order; the reference's np.argsort
    defaults to introsort, whose tie order is an unspecified implementation
    detail there (it varies with array size/layout). With antithetic
    pairing, tied members get adjacent integer ranks either way — only
    WHICH tied member gets which adjacent rank differs.
    """
    assert x.ndim == 1
    order = jnp.argsort(x)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(x.shape[0]))
    return ranks


def compute_centered_ranks(x: jax.Array) -> jax.Array:
    """Map fitnesses (any shape) to centered ranks in [-0.5, 0.5].

    Matches reference compute_centered_ranks (nic_nes_master.py:184-194).
    """
    y = compute_ranks(x.ravel()).reshape(x.shape).astype(jnp.float32)
    y = y / (x.size - 1)
    return y - 0.5


def nes_gradient(fitnesses: jax.Array, noise: jax.Array) -> jax.Array:
    """NES gradient estimate from antithetic fitness pairs.

    :param fitnesses: (F, 2) — fitness at theta+delta_i (col 0) and
        theta-delta_i (col 1) for each of F antithetic pairs.
    :param noise: (F, dim) — the F mutation vectors delta_i.
    :return: (dim,) gradient estimate, normalized by 2F as the reference does
        (nic_nes_master.py:178-182).
    """
    ranked = compute_centered_ranks(fitnesses)
    weights = ranked[:, 0] - ranked[:, 1]
    grad = jnp.einsum(
        "f,fd->d", weights, noise, preferred_element_type=jnp.float32
    )
    return grad / fitnesses.size
