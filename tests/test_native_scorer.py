"""Native C++ CIDEr scorer: parity vs the pure-Python oracle, and speed."""

import time

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.scorer import IndexedCiderScorer, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native scorer not buildable"
)


def _random_corpus(rng, n_images=50, caps=5, T=16, vocab=40, length=(3, 10)):
    gts = []
    for _ in range(n_images):
        rows = np.zeros((caps, T), np.int32)
        for c in range(caps):
            L = rng.integers(*length)
            rows[c, :L] = rng.integers(1, vocab + 1, size=L)
        gts.append(rows)
    return gts


@pytest.mark.parametrize("variant", ["cider-d", "cider"])
def test_native_matches_python(variant, rng):
    gts = _random_corpus(rng)
    nat = IndexedCiderScorer(gts, variant=variant, prefer_native=True)
    py = IndexedCiderScorer(gts, variant=variant, prefer_native=False)
    assert nat._native is not None and py._py is not None

    R = 200
    img_idx = rng.integers(0, len(gts), size=R)
    cands = np.zeros((R, 16), np.int32)
    for i in range(R):
        # half are (mutated) copies of a reference, half random
        if i % 2 == 0:
            cands[i] = gts[img_idx[i]][0]
            if i % 4 == 0:
                cands[i, 1] = rng.integers(1, 41)
        else:
            L = rng.integers(2, 9)
            cands[i, :L] = rng.integers(1, 41, size=L)

    m_n, s_n = nat.score(cands, img_idx)
    m_p, s_p = py.score(cands, img_idx)
    np.testing.assert_allclose(s_n, s_p, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(m_n, m_p, rtol=1e-6)


def test_native_throughput(rng):
    """Bench-scale sanity: 36,864 captions (pop 288 x batch 128) must score
    in a few seconds, not minutes (the Python scorer's regime)."""
    gts = _random_corpus(rng, n_images=500, vocab=9487, length=(8, 11), T=16)
    nat = IndexedCiderScorer(gts, variant="cider-d", prefer_native=True)
    assert nat._native is not None

    R = 288 * 128
    img_idx = rng.integers(0, len(gts), size=R)
    cands = np.zeros((R, 16), np.int32)
    L = 10
    cands[:, :L] = rng.integers(1, 9488, size=(R, L))

    t0 = time.time()
    _, scores = nat.score(cands, img_idx)
    dt = time.time() - t0
    assert np.isfinite(scores).all()
    assert dt < 5.0, f"native scorer too slow: {dt:.2f}s for {R} captions"
