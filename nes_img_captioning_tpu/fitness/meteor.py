"""METEOR (Banerjee & Lavie 2005): unigram alignment with exact and
Porter-stem matchers, harmonic Fmean, and a fragmentation penalty.

The reference scores METEOR through the cococaption submodule's Java
METEOR-1.5 jar (reference: src/captioning/eval_utils.py:30-57), which adds
WordNet-synonym and paraphrase-table matchers plus function-word weighting —
external model files that do not exist in this offline image. This module
implements the original, fully-specified METEOR formulation instead:

    P = m / len(hyp),  R = m / len(ref)
    Fmean = 10 P R / (R + 9 P)
    penalty = 0.5 * (chunks / m)^3
    score = Fmean * (1 - penalty),   best over the image's references

where ``m`` counts aligned unigrams (stage 1 exact, stage 2 Porter stems on
the remainder, optional stage 3 synonym classes from a user-supplied table —
``load_synonym_table`` / caption_options.meteor_synonyms) and ``chunks``
counts maximal runs of the alignment that are contiguous in both sentences.
Without synonym data, absolute values differ from METEOR-1.5 by a few
points; with a WordNet-derived table the synonym stage restores that
matcher. The paraphrase-table stage and function-word weighting remain
out of scope. Documented as a deliberate deviation in README.md.

The Porter stemmer below is the 1980 algorithm as published (An algorithm
for suffix stripping, M.F. Porter), verified against the paper's examples in
tests/test_meteor.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["porter_stem", "meteor", "meteor_corpus", "load_synonym_table"]


# ---- Porter stemmer ---------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in the [C](VC)^m[V] decomposition of the stem."""
    n, i, m = len(w), 0, 0
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suffix: str, repl: str, min_m: int = 0) -> str | None:
    """stem(w) -> stem+repl when w ends with suffix and measure(stem) > min_m
    (None = rule does not fire)."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return w  # suffix matched but condition failed: later rules don't fire


def porter_stem(word: str) -> str:
    """Porter 1980. Lowercase input expected; words of length <= 2 are
    returned unchanged (the algorithm's convention)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, fired = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, fired = w[:-3], True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0 suffix swaps, longest-match by construction of the scan)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        out = _replace(w, suf, rep)
        if out is not None:
            w = out
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        out = _replace(w, suf, rep)
        if out is not None:
            w = out
            break

    # step 4 (m > 1 suffix deletion)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break  # (*S or *T) condition for -ion
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---- METEOR alignment + score ------------------------------------------------------


def _align(hyp: list, ref: list, stem_of=None,
           syn_of=None) -> list[tuple[int, int]]:
    """Matcher-cascade unigram alignment: exact tokens, then stems, then
    synonyms over the residue (the METEOR-1.5 cascade order minus the
    paraphrase table). Within a stage each hypothesis position (left to
    right) takes the nearest unmatched reference position — the standard
    greedy approximation of METEOR's fewest-crossings tie-break.

    ``syn_of``: token -> set of synonym-class ids (e.g. WordNet synsets);
    two tokens match when their class sets intersect — a word belongs to
    several synsets, so class equality would be too strict."""
    matched_r = [False] * len(ref)
    pairs: list[tuple[int, int]] = []
    matched_h = [False] * len(hyp)

    def stage(key_h, key_r, hit):
        for i, kh in enumerate(key_h):
            if matched_h[i]:
                continue
            best, best_d = -1, None
            for j, kr in enumerate(key_r):
                if matched_r[j] or not hit(kh, kr):
                    continue
                d = abs(i - j)
                if best_d is None or d < best_d:
                    best, best_d = j, d
            if best >= 0:
                matched_h[i] = True
                matched_r[best] = True
                pairs.append((i, best))

    eq = lambda a, b: a == b  # noqa: E731
    stage(hyp, ref, eq)
    if stem_of is not None:
        stage([stem_of(t) for t in hyp], [stem_of(t) for t in ref], eq)
    if syn_of is not None:
        stage([syn_of(t) for t in hyp], [syn_of(t) for t in ref],
              lambda a, b: bool(a and b and (a & b)))
    return sorted(pairs)


def _chunks(pairs: list[tuple[int, int]]) -> int:
    """Maximal runs contiguous in both sentences (pairs sorted by hyp pos)."""
    if not pairs:
        return 0
    by_h = pairs  # already sorted
    n = 1
    for (h1, r1), (h2, r2) in zip(by_h, by_h[1:]):
        if h2 != h1 + 1 or r2 != r1 + 1:
            n += 1
    return n


def meteor(hyp, refs, stem_of=None, syn_of=None) -> float:
    """METEOR score of one hypothesis against its references (best ref).

    hyp: token sequence; refs: list of token sequences. Tokens may be ints
    (word ids) or strings. ``stem_of``: optional token -> stem-class mapping
    enabling the stage-2 stem matcher. ``syn_of``: optional token ->
    synonym-class-id set enabling the stage-3 synonym matcher (the
    reference METEOR-1.5's WordNet stage, given user-supplied synonym data —
    caption_options.meteor_synonyms)."""
    hyp = list(hyp)
    best = 0.0
    for ref in refs:
        ref = list(ref)
        if not hyp or not ref:
            continue
        pairs = _align(hyp, ref, stem_of, syn_of)
        m = len(pairs)
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        fmean = 10.0 * p * r / (r + 9.0 * p)
        penalty = 0.5 * (_chunks(pairs) / m) ** 3
        best = max(best, fmean * (1.0 - penalty))
    return best


def _strip_eos(row) -> list:
    out = []
    for t in np.asarray(row).tolist():
        if t == 0:
            break
        out.append(t)
    return out


def meteor_corpus(cands, gts_list, stem_of=None, syn_of=None) -> float:
    """Mean METEOR over (candidate row, reference rows) pairs of int token
    rows (0-terminated, the framework's caption layout)."""
    scores = [
        meteor(_strip_eos(c), [_strip_eos(r) for r in np.asarray(refs)],
               stem_of, syn_of)
        for c, refs in zip(cands, gts_list)
    ]
    return float(np.mean(scores)) if scores else 0.0


def load_synonym_table(path: str) -> dict[str, frozenset]:
    """User-supplied synonym data -> word -> synonym-class-id set.

    Accepted JSON formats (chosen so a WordNet dump is a trivial export):
      * a list of synonym groups: ``[["car","auto"], ["kid","child"]]``
        (group index = class id);
      * a dict word -> class id(s): ``{"car": [3, 7], "auto": 3}``.
    Words are lowercased. A word may belong to several classes; METEOR's
    synonym matcher fires on any shared class."""
    import json

    with open(path) as f:
        spec = json.load(f)
    table: dict[str, set] = {}
    if isinstance(spec, list):
        for gid, group in enumerate(spec):
            for w in group:
                table.setdefault(str(w).lower(), set()).add(gid)
    elif isinstance(spec, dict):
        for w, gids in spec.items():
            ids = gids if isinstance(gids, (list, tuple)) else [gids]
            table.setdefault(str(w).lower(), set()).update(int(g) for g in ids)
    else:
        raise ValueError(
            f"synonym table {path}: expected a JSON list of groups or a "
            f"word->class dict, got {type(spec).__name__}"
        )
    return {w: frozenset(s) for w, s in table.items()}
