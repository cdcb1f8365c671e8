"""Corpus language metrics for offline evaluation: BLEU-1..4 and ROUGE-L.

The reference's validation path runs the cococaption submodule's
``COCOEvalCap`` (Java PTBTokenizer + BLEU/METEOR/ROUGE/CIDEr/SPICE —
reference: src/captioning/eval_utils.py:30-57), of which only CIDEr is
consumed by training (``accuracy_on`` returns lang_stats['CIDEr'],
src/captioning/policies.py:130-143). For offline eval parity we provide the
pure-Python computable metrics over token ids (BLEU with corpus-level brevity
penalty and closest-reference length, per Papineni et al. 2002 / the
coco-caption convention; ROUGE-L per Lin 2004 with beta=1.2 as in
coco-caption; METEOR per Banerjee & Lavie 2005 with exact + Porter-stem
matchers — see fitness/meteor.py for the deviation from the Java
METEOR-1.5's synonym/paraphrase stages). SPICE requires an external
dependency parser + scene-graph models and is intentionally not
reimplemented; ``language_eval`` reports it as None.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .ciderd import cut_at_eos

__all__ = ["corpus_bleu", "rouge_l", "language_eval"]


def _tokens(row) -> tuple:
    """Caption tokens (without the trailing EOS 0 — word-level metrics score
    words, and decode_sequence drops everything from the first 0)."""
    t = cut_at_eos(row)
    return t[:-1] if t and t[-1] == 0 else t


def corpus_bleu(cands, gts_list, n_max: int = 4) -> list[float]:
    """BLEU-1..n_max, corpus level, with clipped n-gram precision and the
    closest-reference-length brevity penalty."""
    match = np.zeros(n_max)
    total = np.zeros(n_max)
    c_len, r_len = 0, 0
    for cand, refs in zip(cands, gts_list):
        c = _tokens(cand)
        rs = [_tokens(r) for r in np.asarray(refs)]
        c_len += len(c)
        # closest ref length (ties -> shorter, the coco-caption convention)
        r_len += min((abs(len(r) - len(c)), len(r)) for r in rs)[1]
        for n in range(1, n_max + 1):
            cnt = Counter(tuple(c[i : i + n]) for i in range(len(c) - n + 1))
            if not cnt:
                continue
            max_ref = Counter()
            for r in rs:
                rc = Counter(tuple(r[i : i + n]) for i in range(len(r) - n + 1))
                for g, v in rc.items():
                    if v > max_ref[g]:
                        max_ref[g] = v
            match[n - 1] += sum(min(v, max_ref[g]) for g, v in cnt.items())
            total[n - 1] += sum(cnt.values())
    bp = 1.0 if c_len > r_len else np.exp(1.0 - r_len / max(c_len, 1))
    bleus = []
    logsum = 0.0
    for n in range(n_max):
        p = match[n] / total[n] if total[n] else 0.0
        logsum += np.log(p) if p > 0 else -1e10
        bleus.append(float(bp * np.exp(logsum / (n + 1))))
    return bleus


def _lcs(a: tuple, b: tuple) -> int:
    la, lb = len(a), len(b)
    dp = np.zeros((la + 1, lb + 1), dtype=np.int32)
    for i in range(la):
        for j in range(lb):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return int(dp[la][lb])


def rouge_l(cands, gts_list, beta: float = 1.2) -> float:
    """Mean ROUGE-L F-beta over candidates, max over references per image."""
    scores = []
    for cand, refs in zip(cands, gts_list):
        c = _tokens(cand)
        best = 0.0
        for r in np.asarray(refs):
            r = _tokens(r)
            if not c or not r:
                continue
            l = _lcs(c, r)
            prec, rec = l / len(c), l / len(r)
            if prec and rec:
                f = ((1 + beta**2) * prec * rec) / (rec + beta**2 * prec)
                best = max(best, f)
        scores.append(best)
    return float(np.mean(scores)) if scores else 0.0


def language_eval(cands, gts_list, stem_of=None) -> dict:
    """COCOEvalCap-shaped metric dict over token ids
    (reference: src/captioning/eval_utils.py:49-57). ``stem_of``: optional
    token -> stem-class mapping (CocoData.word_stem_of) enabling METEOR's
    stage-2 stem matcher; without it METEOR matches exact tokens only."""
    from .meteor import meteor_corpus
    from .scorer import IndexedCiderScorer

    bleus = corpus_bleu(cands, gts_list)
    cider = IndexedCiderScorer(gts_list, variant="cider")
    mean_cider, _ = cider.score(np.asarray(cands), np.arange(len(cands)))
    return {
        "Bleu_1": bleus[0],
        "Bleu_2": bleus[1],
        "Bleu_3": bleus[2],
        "Bleu_4": bleus[3],
        "ROUGE_L": rouge_l(cands, gts_list),
        "CIDEr": float(mean_cider),
        # Banerjee-Lavie 2005 formulation (exact+stem matchers); the
        # reference's Java METEOR-1.5 adds WordNet synonym/paraphrase stages
        "METEOR": meteor_corpus(cands, gts_list, stem_of),
        "SPICE": None,  # needs an external scene-graph parser; not reimplemented
        # caveats ride along with every score presentation (README metrics
        # table states the same)
        "metric_notes": {
            "METEOR": "Banerjee-Lavie 2005 (exact+stem matchers); the "
                      "reference's Java METEOR-1.5 adds WordNet "
                      "synonym/paraphrase stages, absolute values differ "
                      "by a few points",
            "SPICE": "not computed (external Java scene-graph pipeline; "
                     "absent from the reference checkout as well)",
        },
    }
