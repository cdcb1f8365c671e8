"""Word-level validation scoring + predictions artifact.

The reference scores validation on decoded WORD STRINGS through
COCOEvalCap (src/captioning/eval_utils.py:30-57), writing the predictions
JSON first. Two vocabulary ids mapping to the same word (e.g. UNK) must
therefore score as the same token — the word_id_rows remap implements
exactly that collapse, and CocoTask.validate writes the reference-shaped
eval_cache_{split}.json.
"""

import json
import os

import numpy as np

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
from nes_img_captioning_tpu.data.mscoco import CocoData
from nes_img_captioning_tpu.fitness.ciderd import CiderScorer


def _data_with_alias(tmp_path, vocab_size=30):
    """Synthetic fixture whose ids 1 and 2 both decode to the same word."""
    copts = make_synthetic_coco(
        str(tmp_path / "d"), n_train=24, n_val=8, n_test=8,
        vocab_size=vocab_size, fc_feat_size=16,
    )
    info = json.load(open(copts["input_json"]))
    info["ix_to_word"]["2"] = info["ix_to_word"]["1"]  # alias: 2 -> word of 1
    json.dump(info, open(copts["input_json"], "w"))
    return copts, CocoData(copts)


def test_word_id_rows_collapse_aliases(tmp_path):
    _, data = _data_with_alias(tmp_path)
    rows = np.array([[1, 2, 3, 0], [2, 2, 1, 0]], np.int32)
    w = data.word_id_rows(rows)
    assert w[0, 0] == w[0, 1] == w[1, 0] == w[1, 1] == w[1, 2]
    assert w[0, 2] != w[0, 0]
    assert (w[:, 3] == 0).all()  # EOS stays the terminator
    # decoded strings agree with the word ids
    s = data.decode_sequence(rows)
    assert s[0].split()[0] == s[0].split()[1]


def test_word_level_cider_differs_from_token_level(tmp_path):
    """A candidate using the alias id must score as if it used the word:
    word-level CIDEr sees a match where token-level does not."""
    _, data = _data_with_alias(tmp_path)
    # 4-image corpus (distinct captions so document frequencies stay < N and
    # idf > 0); image 0's refs are five copies of "w1 w5 w6"
    rng = np.random.default_rng(0)
    refs = [np.zeros((5, 8), np.int32) for _ in range(4)]
    refs[0][:, :3] = [1, 5, 6]
    for i in (1, 2, 3):
        refs[i][:, :4] = rng.integers(5, 30, size=(1, 4))
    cand = np.zeros((1, 8), np.int32)
    cand[0, :3] = [2, 5, 6]     # alias id: decodes to the same words

    token_scorer = CiderScorer(variant="cider").fit_df(refs)
    _, tok = token_scorer.score(cand, [refs[0]])

    wrefs = [data.word_id_rows(r) for r in refs]
    word_scorer = CiderScorer(variant="cider").fit_df(wrefs)
    _, wrd = word_scorer.score(data.word_id_rows(cand), [wrefs[0]])
    assert wrd[0] > tok[0]       # the alias only matches at the word level
    np.testing.assert_allclose(wrd[0], 10.0, rtol=1e-9)  # perfect match


def test_validate_writes_predictions_artifact(tmp_path):
    import jax

    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    copts, data = _data_with_alias(tmp_path)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "log_dir": str(tmp_path / "run"),
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {
                "input_encoding_size": 8, "rnn_size": 8, "fc_feat_size": 16,
            },
        },
    }
    task = CocoTask(exp, Config(batch_size=4, val_batch_size=4), TpuConfig(seed=0))
    theta = task.generate_theta(jax.random.PRNGKey(0))
    score = task.validate(theta)
    assert np.isfinite(score)

    path = tmp_path / "run" / "eval" / "eval_cache_val.json"
    preds = json.load(open(path))
    assert len(preds) == 8  # one entry per validation image
    val_ids = data.split_image_ids("val")
    for i, p in enumerate(preds):
        assert set(p) == {"image_id", "caption"}
        assert p["image_id"] == val_ids[i]
        assert isinstance(p["caption"], str)

    task.test_score(theta)
    assert (tmp_path / "run" / "eval" / "eval_cache_test.json").is_file()

