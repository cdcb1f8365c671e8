"""CIDEr-D scorer and fitness-criteria unit tests (hand-computed cases)."""

import numpy as np

from nes_img_captioning_tpu.fitness.ciderd import CiderScorer, cut_at_eos, ngram_counts
from nes_img_captioning_tpu.fitness.criteria import apply_criterion


def _pad(toks, T=16):
    out = np.zeros(T, np.int32)
    out[: len(toks)] = toks
    return out


def test_cut_at_eos_includes_terminator():
    # array_to_str includes the first 0 (reference: tools/utils.py:34-40)
    assert cut_at_eos(_pad([3, 7])) == (3, 7, 0)
    assert cut_at_eos(np.full(4, 5)) == (5, 5, 5, 5)  # no 0: full length


def test_ngram_counts():
    c = ngram_counts((1, 2, 1, 2), 2)
    assert c[0] == {(1,): 2, (2,): 2}
    assert c[1] == {(1, 2): 2, (2, 1): 1}


def _corpus():
    """4 images with distinct reference captions so idf > 0."""
    gts = [
        np.stack([_pad([1, 2, 3])]),
        np.stack([_pad([4, 5, 6])]),
        np.stack([_pad([7, 8, 9])]),
        np.stack([_pad([10, 11, 12])]),
    ]
    return gts


def test_perfect_match_scores_ten():
    gts = _corpus()
    sc = CiderScorer(variant="cider-d").fit_df(gts)
    cand = np.stack([_pad([1, 2, 3])])
    mean, scores = sc.score(cand, [gts[0]])
    # identical caption, one ref: cosine 1 at every n, zero length penalty
    np.testing.assert_allclose(scores, [10.0], atol=1e-9)


def test_disjoint_scores_zero():
    gts = _corpus()
    sc = CiderScorer(variant="cider-d").fit_df(gts)
    mean, scores = sc.score(np.stack([_pad([4, 5, 6])]), [gts[0]])
    # no shared n-grams (even the EOS bigram differs); unigram (0,) is shared
    # by every caption -> df = #images -> idf = 0 -> contributes nothing
    np.testing.assert_allclose(scores, [0.0], atol=1e-9)


def test_length_penalty_applies_only_in_ciderd():
    gts = _corpus()
    long_ref = [np.stack([_pad([1, 2, 3, 13, 14, 15, 16, 17])])]
    cand = np.stack([_pad([1, 2, 3])])
    d = CiderScorer(variant="cider-d").fit_df(gts + long_ref)
    p = CiderScorer(variant="cider").fit_df(gts + long_ref)
    _, s_d = d.score(cand, [long_ref[0]])
    _, s_p = p.score(cand, [long_ref[0]])
    assert s_p[0] > s_d[0] > 0  # same overlap, penalty only in -D


def test_clipping_caps_repeated_ngrams():
    """CIDEr-D clips candidate counts at reference counts; plain CIDEr
    rewards stuffing."""
    gts = _corpus()
    ref = [np.stack([_pad([1, 2, 3])])]
    stuffed = np.stack([_pad([1, 1, 1])])  # unigram (1,) x3 vs ref count 1
    d = CiderScorer(variant="cider-d").fit_df(gts)
    p = CiderScorer(variant="cider").fit_df(gts)
    _, s_d = d.score(stuffed, [ref[0]])
    _, s_p = p.score(stuffed, [ref[0]])
    assert s_p[0] > s_d[0]


def test_multi_ref_averaging():
    gts = _corpus()
    two_refs = np.stack([_pad([1, 2, 3]), _pad([4, 5, 6])])
    sc = CiderScorer(variant="cider-d").fit_df(gts)
    _, s1 = sc.score(np.stack([_pad([1, 2, 3])]), [np.stack([_pad([1, 2, 3])])])
    _, s2 = sc.score(np.stack([_pad([1, 2, 3])]), [two_refs])
    # averaging over one perfect + one disjoint ref roughly halves the score
    assert 0.3 * s1[0] < s2[0] < 0.7 * s1[0]


def test_criteria_formulas():
    lp = np.log(np.array([[0.5, 1.0, 0.25]]))
    seq = np.array([[3, 0, 0]])  # mask = [1, 1, 0]
    reward = np.full((1, 3), 2.0)
    m = 2.0  # mask sum

    got = apply_criterion("greedy_linprob", lp, seq, reward)
    np.testing.assert_allclose(got, (0.5 * 2 + 1.0 * 2) / m)

    got = apply_criterion("sc_loss", lp, seq, reward)
    np.testing.assert_allclose(got, (-np.log(0.5) * 2 + -0.0 * 2) / m)

    pf = np.log10(np.array([0.5, 1.0]) + 1 / 9) + np.log10(9.0)
    got = apply_criterion("greedy_logprob", lp, seq, reward)
    np.testing.assert_allclose(got, (pf * 2).sum() / m)

    got = apply_criterion("greedy_avgprob", lp, seq, reward)
    np.testing.assert_allclose(got, (0.5 * 2 + 0.5 * pf * 2).sum() / m)

    ef = (np.exp(np.array([0.5, 1.0])) - 1) / (np.e - 1)
    got = apply_criterion("greedy_expprob", lp, seq, reward)
    np.testing.assert_allclose(got, (ef * 2).sum() / m)
