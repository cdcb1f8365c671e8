"""CocoData contract tests: splits, caption ranges, feature consolidation."""

import json
import os

import numpy as np
import pytest

from nes_img_captioning_tpu.data.mscoco import CocoData


@pytest.fixture
def raw_fixture(tmp_path):
    """Hand-built dataset with a restval image and ragged caption counts."""
    import h5py

    fc_dir = tmp_path / "fc"
    os.makedirs(fc_dir)
    images = [
        {"id": 1, "split": "train", "file_path": "a.jpg"},
        {"id": 2, "split": "restval", "file_path": "b.jpg"},
        {"id": 3, "split": "val", "file_path": "c.jpg"},
        {"id": 4, "split": "test", "file_path": "d.jpg"},
    ]
    ix_to_word = {str(i): f"w{i}" for i in range(1, 11)}
    # captions: img1 has 3, img2 has 7, img3 has 2, img4 has 5
    counts = [3, 7, 2, 5]
    labels, start, end = [], [], []
    row = 1
    for ix, n in enumerate(counts):
        for c in range(n):
            lab = np.zeros(16, np.int32)
            lab[:3] = [ix + 1, c + 1, 9]
            labels.append(lab)
        start.append(row)
        end.append(row + n - 1)
        row += n
    with h5py.File(tmp_path / "labels.h5", "w") as h5:
        h5.create_dataset("labels", data=np.stack(labels))
        h5.create_dataset("label_start_ix", data=np.asarray(start))
        h5.create_dataset("label_end_ix", data=np.asarray(end))
    with open(tmp_path / "info.json", "w") as f:
        json.dump({"ix_to_word": ix_to_word, "images": images}, f)
    for img in images:
        np.save(fc_dir / f"{img['id']}.npy",
                np.full(8, img["id"], np.float32))
    return {
        "input_json": str(tmp_path / "info.json"),
        "input_label_h5": str(tmp_path / "labels.h5"),
        "input_fc_dir": str(fc_dir),
    }


def test_restval_joins_train(raw_fixture):
    d = CocoData(raw_fixture, train_only=0)
    assert d.split_len("train") == 2  # train + restval
    assert d.split_len("val") == 1 and d.split_len("test") == 1
    d2 = CocoData(raw_fixture, train_only=1)
    assert d2.split_len("train") == 1  # restval excluded


def test_split_gts_cover_all_captions(raw_fixture):
    d = CocoData(raw_fixture)
    gts = d.split_gts("train")
    assert [g.shape[0] for g in gts] == [3, 7]
    # rows carry the image marker in token 0
    assert (gts[0][:, 0] == 1).all() and (gts[1][:, 0] == 2).all()


def test_get_captions_subsamples_with_replacement(raw_fixture):
    d = CocoData(raw_fixture)
    rng = np.random.default_rng(0)
    # img3 (val split pos 0) has only 2 captions; asking for 5 subsamples
    caps = d.get_captions(0, "val", 5, rng)
    assert caps.shape == (5, 16)
    assert set(caps[:, 1]).issubset({1, 2})
    # img2 (train pos 1) has 7 captions; 5 contiguous ones
    caps = d.get_captions(1, "train", 5, rng)
    assert caps.shape == (5, 16)
    assert (np.diff(caps[:, 1]) == 1).all()  # contiguous block


def test_feature_consolidation_cache(raw_fixture):
    d1 = CocoData(raw_fixture)
    cache = raw_fixture["input_fc_dir"].rstrip("/") + "_fc.npy"
    assert os.path.isfile(cache)
    # second load uses the consolidated mmap and returns identical features
    d2 = CocoData(raw_fixture)
    np.testing.assert_array_equal(
        d1.split_feats("train"), d2.split_feats("train")
    )
    np.testing.assert_array_equal(d1.split_feats("train")[0],
                                  np.full(8, 1, np.float32))


def test_decode_sequence(raw_fixture):
    d = CocoData(raw_fixture)
    out = d.decode_sequence(np.array([[1, 2, 0, 5], [3, 0, 0, 0]]))
    assert out == ["w1 w2", "w3"]
