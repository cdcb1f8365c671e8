"""Device->host transfer helpers tuned for this harness's tunnel.

Measured (docs/RESULTS.md "ES blocks"): the tunnel moves ~4 MB buffers at
~22 MB/s but 35+ MB buffers at ~6 MB/s, with a one-time per-shape setup
that cost 38 s on the first 35 MB pull. Pulling a large array as a stream
of fixed-shape ~4 MB slices keeps every transfer on the fast path and pays
the setup once (the slice program + shape is reused for every chunk).

On a non-tunneled backend (CPU tests, co-located TPU) chunking is a few
extra dispatches on a path that only runs at snapshot/materialize time —
harmless either way.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["pull_chunked"]

_CHUNK_BYTES = 4 << 20  # ~4 MB: the measured fast-path transfer size


@functools.lru_cache(maxsize=8)
def _slicer(ch: int):
    """One jitted dynamic-slice program per chunk length, shared across
    pull_chunked calls so jax's per-shape executable cache actually
    amortizes the setup (a fresh jit wrapper per call would re-trace)."""
    import jax

    return jax.jit(lambda a, i: jax.lax.dynamic_slice(a, (i,), (ch,)))


def pull_chunked(arr, chunk_bytes: int = _CHUNK_BYTES) -> np.ndarray:
    """np.asarray(arr) for multi-MB device arrays, transferred in
    fixed-shape ~4 MB slices via ONE jitted dynamic-slice program."""
    size = int(np.prod(arr.shape)) if arr.ndim else 1
    itemsize = np.dtype(arr.dtype).itemsize
    ch = max(1, chunk_bytes // itemsize)
    if size <= ch:
        return np.asarray(arr)

    flat = arr.reshape(-1)

    # one program for every chunk: the start index is a traced operand
    take = _slicer(ch)
    n_full = size // ch
    out = np.empty((size,), arr.dtype)
    for k in range(n_full):
        out[k * ch : (k + 1) * ch] = np.asarray(take(flat, k * ch))
    tail = size - n_full * ch
    if tail:
        # dynamic_slice clamps the start so the last full-size window ends
        # exactly at the array's end; take the suffix of that window
        window = np.asarray(take(flat, size - ch))
        out[n_full * ch :] = window[ch - tail :]
    return out.reshape(arr.shape)
