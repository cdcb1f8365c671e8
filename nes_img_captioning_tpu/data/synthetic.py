"""Synthetic MSCOCO-format fixture generator.

Writes a miniature dataset in the exact on-disk contract the captioning
pipeline consumes (cocotalk.json / cocotalk_label.h5 / per-image fc .npy
files), with a *learnable* structure: each image's feature vector encodes its
caption's tokens, so evolution can actually improve CIDEr. Used by the test
suite and demo configs; real MSCOCO drops in via the same caption_options.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["make_synthetic_coco"]


def make_synthetic_coco(
    out_dir: str,
    n_train: int = 64,
    n_val: int = 16,
    n_test: int = 16,
    vocab_size: int = 30,
    seq_length: int = 16,
    fc_feat_size: int = 64,
    caps_per_img: int = 5,
    cap_len: int = 4,
    seed: int = 0,
) -> dict:
    """Returns a caption_options dict pointing at the generated files."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    fc_dir = os.path.join(out_dir, "fc")
    os.makedirs(fc_dir, exist_ok=True)

    n = n_train + n_val + n_test
    splits = ["train"] * n_train + ["val"] * n_val + ["test"] * n_test

    ix_to_word = {str(i): f"w{i}" for i in range(1, vocab_size + 1)}
    images, labels, start_ix, end_ix = [], [], [], []
    # token embedding that also generates the image features
    tok_proj = rng.normal(size=(vocab_size + 1, fc_feat_size)).astype(np.float32)

    row = 1  # h5 ranges are 1-based
    for i in range(n):
        img_id = 1000 + i
        images.append({"id": img_id, "split": splits[i], "file_path": f"im/{img_id}.jpg"})
        base = rng.integers(1, vocab_size + 1, size=cap_len)
        caps = []
        for _ in range(caps_per_img):
            cap = base.copy()
            # small paraphrase noise on one position
            j = rng.integers(0, cap_len)
            if rng.random() < 0.3:
                cap[j] = rng.integers(1, vocab_size + 1)
            padded = np.zeros(seq_length, np.int32)
            padded[:cap_len] = cap
            caps.append(padded)
        labels.extend(caps)
        start_ix.append(row)
        end_ix.append(row + caps_per_img - 1)
        row += caps_per_img

        feat = tok_proj[base].sum(0) + 0.1 * rng.normal(size=fc_feat_size)
        np.save(os.path.join(fc_dir, f"{img_id}.npy"), feat.astype(np.float32))

    input_json = os.path.join(out_dir, "cocotalk.json")
    with open(input_json, "w") as f:
        json.dump({"ix_to_word": ix_to_word, "images": images}, f)

    import h5py

    input_h5 = os.path.join(out_dir, "cocotalk_label.h5")
    with h5py.File(input_h5, "w") as h5:
        h5.create_dataset("labels", data=np.stack(labels))
        h5.create_dataset("label_start_ix", data=np.asarray(start_ix))
        h5.create_dataset("label_end_ix", data=np.asarray(end_ix))

    return {
        "input_json": input_json,
        "input_label_h5": input_h5,
        "input_fc_dir": fc_dir,
    }
