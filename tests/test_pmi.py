"""Co-occurrence counts + PMI pairs: brute-force replay."""

import math
from collections import Counter

from dachshund_spark.pipeline.lm import cooccurrence_counts, pmi_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_cooc(texts, window):
    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for i, a in enumerate(toks):
            for o in range(1, window + 1):
                if i + o < len(toks):
                    c[(a, toks[i + o])] += 1
                    c[(toks[i + o], a)] += 1
    return dict(c)


def test_cooccurrence_window2(spark):
    texts = ["a b c d", "b a b"]
    got = {
        (r["w1"], r["w2"]): r["c"]
        for r in cooccurrence_counts(_docs(spark, texts), window=2).collect()
    }
    assert got == _brute_cooc(texts, 2)


def test_cooccurrence_window_longer_than_doc(spark):
    # window 5 over a 3-token doc: offsets past the end contribute
    # nothing (the ANSI sequence() guard)
    texts = ["x y z"]
    got = {
        (r["w1"], r["w2"]): r["c"]
        for r in cooccurrence_counts(_docs(spark, texts), window=5).collect()
    }
    assert got == _brute_cooc(texts, 5)


def _e8(x):
    return int(round(x * 1e8))


def test_pmi_matches_brute_force(spark):
    texts = ["a b a b a b c", "c a b b a", "b a c a b a"]
    cooc = _brute_cooc(texts, 2)
    cx = Counter()
    for (w1, _), c in cooc.items():
        cx[w1] += c
    n = sum(cooc.values())
    exp = {}
    for (w1, w2), c in cooc.items():
        if w1 < w2 and c >= 2:
            exp[(w1, w2)] = (
                c,
                _e8(math.log(c)) + _e8(math.log(n))
                - _e8(math.log(cx[w1])) - _e8(math.log(cx[w2])),
            )
    got = {
        (r["w1"], r["w2"]): (r["c"], r["pmi_e8"], r["pmi"])
        for r in pmi_pairs(_docs(spark, texts), window=2, min_count=2).collect()
    }
    assert set(got) == set(exp)
    for k, (c, pe8) in exp.items():
        assert got[k] == (c, pe8, pe8 / 1e8)


def test_pmi_top_k_is_deterministic_cutoff(spark):
    texts = ["p q p q r s r s t u t u"] * 3
    full = pmi_pairs(_docs(spark, texts), window=2, min_count=1, top_k=100).collect()
    top2 = pmi_pairs(_docs(spark, texts), window=2, min_count=1, top_k=2).collect()
    key = lambda r: (-r["pmi_e8"], r["w1"], r["w2"])
    assert [key(r) for r in top2] == sorted([key(r) for r in full])[:2]
