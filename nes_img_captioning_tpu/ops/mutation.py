"""Mutation ops: counter-based Gaussian perturbation of flat parameter vectors.

TPU-native replacement for the reference's in-place torch mutation
(reference: src/algorithm/nets.py:83-119 ``PolicyNet.evolve`` and the
``Mutation`` enum at src/algorithm/nets.py:16-21). Where the reference draws
noise with torch's global RNG and ships the realized vector through Redis
(~11 MB/result), here every mutation is a pure function of a threefry key, so
only the integer seed ever leaves the device; the noise is regenerated
on-device wherever it is needed (evaluation and gradient aggregation).

All functions are jit/vmap-friendly: ``vmap(perturb, in_axes=(None, 0, ...))``
materializes a population from one theta and a vector of keys.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

__all__ = ["MutationKind", "gaussian_noise", "shape_noise", "perturb"]


class MutationKind(enum.Enum):
    """Mirror of the reference Mutation enum (src/algorithm/nets.py:16-21)."""

    DEFAULT = ""
    SAFE_GRAD_SUM = "SM-G-SUM"
    SAFE_GRAD_ABS = "SM-G-ABS"
    SAFE_VECTOR = "SM-VECTOR"
    SAFE_PROPORTIONAL = "SM-PROPORTIONAL"

    @property
    def is_safe(self) -> bool:
        """Safe kinds divide the noise by a sensitivity vector
        (reference: src/algorithm/nets.py:98-101,106-108)."""
        return self in (
            MutationKind.SAFE_GRAD_SUM,
            MutationKind.SAFE_GRAD_ABS,
            MutationKind.SAFE_VECTOR,
        )

    @property
    def is_proportional(self) -> bool:
        return self is MutationKind.SAFE_PROPORTIONAL


def gaussian_noise(key: jax.Array, dim: int, sigma) -> jax.Array:
    """noise ~ N(0, sigma^2)^dim from a threefry key (float32)."""
    return sigma * jax.random.normal(key, (dim,), jnp.float32)


def shape_noise(
    noise: jax.Array,
    theta: jax.Array,
    sensitivity: jax.Array | None = None,
    proportional: bool = False,
) -> jax.Array:
    """Apply safe / proportional shaping to raw Gaussian noise.

    Matches reference evolve() semantics (src/algorithm/nets.py:102-113):
      * safe:          noise /= sensitivity
      * proportional:  noise *= |theta| with exact zeros replaced by
                       mean(|theta|) (the mean is taken *before* replacement).
    """
    if sensitivity is not None:
        noise = noise / sensitivity
    if proportional:
        mean = jnp.mean(jnp.abs(theta))
        scale = jnp.where(theta == 0.0, mean, jnp.abs(theta))
        noise = noise * scale
    return noise


def perturb(
    theta: jax.Array,
    key: jax.Array,
    sigma,
    sensitivity: jax.Array | None = None,
    proportional: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One mutation step: returns (theta + delta, delta).

    The realized delta (after safe/proportional shaping) is what the
    reference returns from evolve() and later dots with rank weights in the
    NES gradient — so the same shaping must be reproducible from (key, theta,
    sensitivity) alone when the gradient is aggregated.
    """
    delta = shape_noise(
        gaussian_noise(key, theta.shape[-1], sigma), theta, sensitivity, proportional
    )
    return theta + delta, delta
