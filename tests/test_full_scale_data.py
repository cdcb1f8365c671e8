"""Data path at scale: .npy-dir consolidation -> mmap reload -> split views
-> epoch sampling, beyond the small fixtures every other test uses.

The measured full-scale numbers (113,287 train images, 2048-d features —
the real Karpathy-split shape, reference src/captioning/dataloader.py:56-98,
238-240) live in docs/RESULTS.md ("Full-scale data path"), produced by
scripts/rehearse_full_scale.py on this harness. The default test here runs
the same machinery at 20k images (~60 MB features) to keep the slow suite
bounded; set NES_FULL_SCALE=1 to run the true 123,287-image shape inside
pytest (~2 GB disk, ~1 min on a quiet host).
"""

import os
import time

import numpy as np
import pytest


@pytest.mark.slow
def test_consolidation_mmap_and_sampling_at_scale(tmp_path):
    full = os.environ.get("NES_FULL_SCALE") == "1"
    n_train, n_val, n_test = (113287, 5000, 5000) if full else (20000, 500, 500)
    feat = 2048 if full else 512

    from nes_img_captioning_tpu.data.core import EpochSampler
    from nes_img_captioning_tpu.data.mscoco import CocoData
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco

    copts = make_synthetic_coco(
        str(tmp_path / "d"), n_train=n_train, n_val=n_val, n_test=n_test,
        vocab_size=200, fc_feat_size=feat, cap_len=9,
    )
    n = n_train + n_val + n_test
    fc_dir = copts["input_fc_dir"]
    cache = fc_dir.rstrip("/") + "_fc.npy"

    # cold: per-image .npy reads consolidate into one cache file
    data = CocoData(copts)
    assert data._fc.shape == (n, feat)
    assert os.path.isfile(cache)
    assert os.path.getsize(cache) >= n * feat * 4

    # warm: the reload memory-maps the consolidated cache (no re-stack) and
    # is file-count independent (sub-second even at 123k images)
    t0 = time.time()
    data2 = CocoData(copts)
    warm_s = time.time() - t0
    assert isinstance(data2._fc, np.memmap)
    assert warm_s < 10.0, f"warm mmap reload took {warm_s:.1f}s"
    # identical bytes through the mmap
    np.testing.assert_array_equal(np.asarray(data2._fc[n - 1]),
                                  np.asarray(data._fc[n - 1]))

    # split views materialize contiguously at the right sizes
    train = data2.split_feats("train")
    assert train.shape == (n_train, feat) and train.flags["C_CONTIGUOUS"]
    assert data2.split_feats("val").shape == (n_val, feat)

    # a stale cache (different image-id set) is rebuilt, not trusted
    ids_path = fc_dir.rstrip("/") + "_ids.npy"
    ids = np.load(ids_path)
    np.save(ids_path, ids[::-1].copy())
    data3 = CocoData(copts)
    assert not isinstance(data3._fc, np.memmap)  # re-consolidated
    np.testing.assert_array_equal(np.asarray(data3._fc[0]),
                                  np.asarray(data._fc[0]))

    # epoch sampling at the true mscoco_nes regime shape (2000 pairs x 64)
    sampler = EpochSampler(n_train, seed=0)
    idx = sampler.member_batches(2000, 64)
    assert idx.shape == (2000, 64)
    assert idx.min() >= 0 and idx.max() < n_train
