"""MNIST idx-file reader and loader semantics."""

import gzip
import os
import struct

import numpy as np

from nes_img_captioning_tpu.data.mnist import MNIST_MEAN, MNIST_STD, load_mnist


def _write_idx_images(path, arr, gz=False):
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr, gz=False):
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def test_loads_real_idx_layout(tmp_path):
    """Standard torchvision on-disk layout: <root>/MNIST/raw/*-ubyte[.gz]."""
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    tr_x = rng.integers(0, 256, size=(20, 28, 28))
    tr_y = rng.integers(0, 10, size=20)
    te_x = rng.integers(0, 256, size=(10, 28, 28))
    te_y = rng.integers(0, 10, size=10)
    _write_idx_images(str(raw / "train-images-idx3-ubyte"), tr_x)
    _write_idx_labels(str(raw / "train-labels-idx1-ubyte"), tr_y)
    _write_idx_images(str(raw / "t10k-images-idx3-ubyte.gz"), te_x, gz=True)
    _write_idx_labels(str(raw / "t10k-labels-idx1-ubyte.gz"), te_y, gz=True)

    d = load_mnist(str(tmp_path), seed=0)
    assert d["train_x"].shape == (20, 1, 28, 28)
    assert d["train_y"].shape == (20,)
    # normalization matches the reference transform (0.1307, 0.3081)
    expected = (tr_x[0].astype(np.float32) / 255.0 - MNIST_MEAN) / MNIST_STD
    np.testing.assert_allclose(d["train_x"][0, 0], expected, rtol=1e-6)
    # val/test = disjoint halves of the test set
    assert d["val_x"].shape[0] == 5 and d["test_x"].shape[0] == 5
    np.testing.assert_array_equal(np.sort(d["train_y"]), np.sort(tr_y))


def test_synthetic_fallback_deterministic(tmp_path):
    a = load_mnist(str(tmp_path / "nodata"), synthetic_sizes=(64, 32), seed=3)
    b = load_mnist(str(tmp_path / "nodata"), synthetic_sizes=(64, 32), seed=3)
    np.testing.assert_array_equal(a["train_x"], b["train_x"])
    assert a["train_x"].shape == (64, 1, 28, 28)
    # classes are learnable (distinct prototypes): mean intra-class distance
    # < mean inter-class distance
    x = a["train_x"].reshape(64, -1)
    y = a["train_y"]
    same, diff = [], []
    for i in range(30):
        for j in range(i + 1, 30):
            (same if y[i] == y[j] else diff).append(
                np.linalg.norm(x[i] - x[j])
            )
    assert np.mean(same) < np.mean(diff)


def test_plot_score_vs(tmp_path):
    from nes_img_captioning_tpu.utils.analysis import plot_score_vs

    out = str(tmp_path / "cmp.pdf")
    plot_score_vs(
        {"nic_nes": ([0, 1, 2], [0.1, 0.5, 0.9]),
         "xent": ([0, 1, 2], [0.2, 0.6, 0.8])},
        xlabel="hours", out_path=out,
    )
    assert os.path.getsize(out) > 0
