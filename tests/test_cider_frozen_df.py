"""Frozen coco-train-idxs DF table support (VERDICT r4 directive 3).

The reference scores training fitness with a FROZEN document-frequency
table: ``CiderD(df='coco-train-idxs')`` (reference:
src/captioning/policies.py:72) loads the cider submodule's pickled
``{'document_frequency': {ngram tuple: count}, 'ref_len': log(N)}`` blob.
``caption_options.cider_df`` threads a user-supplied copy of that pickle
through every scorer (python / native / on-device), making absolute
training-fitness values comparable to the reference — not just the ranks.
"""

import pickle

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.ciderd import (
    CiderScorer,
    load_df_pickle,
)
from nes_img_captioning_tpu.fitness.scorer import IndexedCiderScorer

from test_cider_device import _make_cands, _make_gts


def _df_as_pickle_blob(scorer: CiderScorer, ref_len: float) -> dict:
    """Reference pickle format: one flat dict keyed by tuples of id
    STRINGS (prepro_ngrams output), counts as floats (defaultdict(float))."""
    doc_freq = {}
    for order_df in scorer.df:
        for g, count in order_df.items():
            doc_freq[tuple(str(t) for t in g)] = float(count)
    return {"document_frequency": doc_freq, "ref_len": float(ref_len)}


@pytest.fixture()
def frozen_setup(tmp_path):
    """A 'train corpus' fits the frozen table; a distinct scored subset makes
    the frozen-vs-rebuilt difference observable (a rebuilt table would use
    the subset's own DF/ref_len)."""
    rng = np.random.default_rng(42)
    train_gts = _make_gts(rng, n_img=40)
    fitted = CiderScorer(variant="cider-d").fit_df(train_gts)
    # a frozen table carries its OWN ref_len constant (log of the table
    # corpus size — deliberately not the scored corpus's)
    ref_len = float(np.log(40504.0))
    blob = _df_as_pickle_blob(fitted, ref_len)
    path = str(tmp_path / "coco-train-idxs.p")
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=2)  # the published table is protocol<=2

    scored_gts = train_gts[:12]
    cands, img_ids = _make_cands(rng, scored_gts, n_cand=32)
    return path, fitted, ref_len, scored_gts, cands, img_ids


def test_load_df_pickle_roundtrip(frozen_setup):
    path, fitted, ref_len, *_ = frozen_setup
    df, got_ref_len = load_df_pickle(path)
    assert got_ref_len == pytest.approx(ref_len)
    assert len(df) == 4
    for n_i in range(4):
        assert df[n_i].keys() == fitted.df[n_i].keys()
        for g, c in fitted.df[n_i].items():
            assert df[n_i][g] == pytest.approx(float(c))
            assert all(isinstance(t, int) for t in g)


def test_load_df_pickle_drops_long_ngrams_and_accepts_ints(tmp_path):
    path = str(tmp_path / "t.p")
    blob = {
        "document_frequency": {
            ("3",): 7.0,
            (5, 6): 2.0,                  # int keys accepted
            ("1", "2", "3", "4", "5"): 9.0,  # order 5: dropped
        },
        "ref_len": 1.5,
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    df, ref_len = load_df_pickle(path)
    assert df[0] == {(3,): 7.0}
    assert df[1] == {(5, 6): 2.0}
    assert df[2] == {} and df[3] == {}
    assert ref_len == 1.5


def test_load_df_pickle_rejects_word_tables_and_bad_blobs(tmp_path):
    p1 = str(tmp_path / "words.p")
    with open(p1, "wb") as f:
        pickle.dump({"document_frequency": {("a", "cat"): 3.0},
                     "ref_len": 1.0}, f)
    with pytest.raises(ValueError, match="id-space"):
        load_df_pickle(p1)

    p2 = str(tmp_path / "list.p")
    with open(p2, "wb") as f:
        pickle.dump([1, 2, 3], f)
    with pytest.raises(ValueError, match="coco-train-idxs"):
        load_df_pickle(p2)


def test_frozen_df_python_absolute_parity(frozen_setup):
    """Python scorer with the loaded table == oracle with the same table,
    and != a table rebuilt from the scored gts (proving the frozen DF and
    its ref_len actually drive the numbers)."""
    path, _, ref_len, scored_gts, cands, img_ids = frozen_setup
    frozen = load_df_pickle(path)

    oracle = CiderScorer(variant="cider-d").set_df(*frozen)
    assert oracle.ref_len == pytest.approx(ref_len)
    _, want = oracle.score(cands, [scored_gts[i] for i in img_ids])

    idx = IndexedCiderScorer(scored_gts, variant="cider-d",
                             prefer_native=False, frozen_df=frozen)
    _, got = idx.score(cands, img_ids)
    np.testing.assert_allclose(got, want, rtol=1e-12)

    rebuilt = IndexedCiderScorer(scored_gts, variant="cider-d",
                                 prefer_native=False)
    _, other = rebuilt.score(cands, img_ids)
    assert not np.allclose(got, other)


def test_frozen_df_native_matches_python(frozen_setup):
    from nes_img_captioning_tpu.fitness.scorer import native_available

    if not native_available():
        pytest.skip("native scorer unavailable")
    path, _, _, scored_gts, cands, img_ids = frozen_setup
    frozen = load_df_pickle(path)

    py = IndexedCiderScorer(scored_gts, variant="cider-d",
                            prefer_native=False, frozen_df=frozen)
    nat = IndexedCiderScorer(scored_gts, variant="cider-d",
                             prefer_native=True, frozen_df=frozen)
    assert nat._native is not None
    _, want = py.score(cands, img_ids)
    _, got = nat.score(cands, img_ids)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_frozen_df_device_matches_oracle(frozen_setup):
    from nes_img_captioning_tpu.ops.cider_device import DeviceCider

    path, _, ref_len, scored_gts, cands, img_ids = frozen_setup
    frozen = load_df_pickle(path)

    oracle = CiderScorer(variant="cider-d").set_df(*frozen)
    _, want = oracle.score(cands, [scored_gts[i] for i in img_ids])

    dev = DeviceCider(scored_gts, variant="cider-d", frozen_df=frozen)
    assert dev.ref_len == pytest.approx(ref_len)
    got = np.asarray(dev.score_rows(cands, img_ids))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_task_threads_cider_df(tmp_path, frozen_setup):
    """caption_options.cider_df reaches BOTH training scorers (host + on
    device); validation stays corpus-mode (reference: COCOEvalCap computes
    its own corpus DF, captioning/eval_utils.py:30-57)."""
    import jax

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    path, *_ = frozen_setup
    copts = make_synthetic_coco(
        str(tmp_path / "d"), n_train=24, n_val=6, n_test=6,
        vocab_size=60, fc_feat_size=24,
    )
    exp = {
        "dataset": "mscoco",
        "caption_options": dict(copts, cider_df=path),
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {
                "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
            },
        },
    }
    task = CocoTask(exp, Config(batch_size=6), TpuConfig(seed=0))
    frozen = load_df_pickle(path)
    assert task._frozen_df is not None
    assert task._device_cider is not None
    assert task._device_cider.ref_len == pytest.approx(frozen[1])

    # host train scorer scores with the frozen table: equal to an oracle
    # with the same table over the task's own ground truths
    rng = np.random.default_rng(0)
    cands, img_ids = _make_cands(rng, task.train_gts, n_cand=12, vocab=60)
    oracle = CiderScorer(variant="cider-d").set_df(*frozen)
    _, want = oracle.score(cands, [task.train_gts[i] for i in img_ids])
    _, got = task.train_scorer.score(cands, img_ids)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # device fitness path agrees too
    dev_got = np.asarray(jax.jit(
        lambda s, i, dev: task._device_cider.score_rows(s, i, dev=dev)
    )(cands, img_ids, task._device_cider.dev))
    np.testing.assert_allclose(dev_got, want, rtol=2e-5, atol=2e-5)
