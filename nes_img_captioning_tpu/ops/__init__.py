"""On-device algorithm ops: fitness shaping, mutation, sensitivity."""

from .ranks import compute_ranks, compute_centered_ranks, nes_gradient
from .mutation import gaussian_noise, perturb, MutationKind

__all__ = [
    "compute_ranks",
    "compute_centered_ranks",
    "nes_gradient",
    "gaussian_noise",
    "perturb",
    "MutationKind",
]
