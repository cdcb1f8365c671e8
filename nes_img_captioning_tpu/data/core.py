"""Device-resident dataset + host-side epoch index sampler."""

from __future__ import annotations

import numpy as np

__all__ = ["DeviceDataset", "EpochSampler"]


class DeviceDataset:
    """A dict of same-leading-dim arrays kept on device.

    Batches never leave the device: jitted code indexes the arrays with an
    int32 index vector (`arrays[name][idx]` inside jit compiles to a gather).
    """

    def __init__(self, arrays: dict, n: int):
        import jax.numpy as jnp

        self.n = int(n)
        self.arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        for k, v in self.arrays.items():
            assert v.shape[0] == self.n, (k, v.shape, self.n)

    def __getitem__(self, key):
        return self.arrays[key]


class EpochSampler:
    """Shuffled epoch index stream.

    Mirrors the reference's shuffle-per-epoch dataloaders
    (src/algorithm/tools/experiment.py:84-90, captioning BlobFetcher
    shuffle-on-wrap). ``batch(bs)`` yields consecutive index vectors from a
    per-epoch permutation; ``member_batches(F, bs)`` draws F independent
    batches for the reference's single_batch=false regime where every worker
    advances its own loader (src/algorithm/nic_nes/nic_nes_worker.py:121-128)
    — statistically equivalent to F independent loader positions.
    """

    def __init__(self, n: int, seed: int | None = 0):
        self.n = int(n)
        self._rng = np.random.default_rng(seed)
        self._perm = self._rng.permutation(self.n)
        self._pos = 0

    def _refill(self):
        self._perm = self._rng.permutation(self.n)
        self._pos = 0

    def batch(self, bs: int) -> np.ndarray:
        """Next (bs,) indices from the epoch stream (wraps with reshuffle)."""
        if bs > self.n:
            return self._rng.integers(0, self.n, size=bs).astype(np.int32)
        if self._pos + bs > self.n:
            self._refill()
        out = self._perm[self._pos : self._pos + bs]
        self._pos += bs
        return out.astype(np.int32)

    def member_batches(self, members: int, bs: int) -> np.ndarray:
        """(members, bs) independent uniform batches (without replacement
        within a member)."""
        if bs <= self.n:
            rows = [
                self._rng.choice(self.n, size=bs, replace=False)
                for _ in range(members)
            ]
        else:
            rows = [self._rng.integers(0, self.n, size=bs) for _ in range(members)]
        return np.stack(rows).astype(np.int32)

    def batches_per_epoch(self, bs: int) -> int:
        return max(self.n // bs, 1)
