"""Bloom-prefiltered decontamination: no false negatives, exact replay."""

import hashlib

from pyspark.sql import functions as F

from dachshund_spark.pipeline.decontam import (
    benchmark_ngrams,
    bloom_bits,
    bloom_decontaminate,
)


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _pos(seed, gram, j, m):
    return int(hashlib.md5(f"{seed}#bf#{gram}#{j}".encode()).hexdigest()[:15], 16) % m


def _replay(bench_texts, corpus_texts, n, m, k, seed):
    def grams(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench = set().union(*(grams(t) for t in bench_texts))
    bits = {_pos(seed, g, j, m) for g in bench for j in range(1, k + 1)}
    out = {}
    for i, t in enumerate(corpus_texts):
        gs = grams(t)
        bloom = sum(
            1
            for g in gs
            if all(_pos(seed, g, j, m) in bits for j in range(1, k + 1))
        )
        exact = len(gs & bench)
        out[100 + i] = (len(gs), bloom, exact, bloom - exact)
    return out


def test_matches_python_replay_and_no_false_negatives(spark):
    bench_texts = ["a b c d e", "x y z w"]
    corpus_texts = [
        "a b c d q",          # shares grams 'a b c', 'b c d'
        "q w e r t y",        # shares nothing
        "x y z w v",          # shares 'x y z', 'y z w'
    ]
    bench = benchmark_ngrams(_docs(spark, bench_texts), n=3)
    # tiny m forces false positives to actually occur sometimes
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_bloom_hits"], r["n_exact_hits"], r["n_false_pos"]
        )
        for r in bloom_decontaminate(
            _docs(spark, corpus_texts, start=100), bench, n=3, m=64, k=2
        ).collect()
    }
    assert got == _replay(bench_texts, corpus_texts, 3, 64, 2, 0)
    for _, bloom, exact, fp in got.values():
        assert bloom >= exact and fp >= 0  # bloom never misses a real hit


def test_bits_deterministic_and_bounded(spark):
    bench = benchmark_ngrams(_docs(spark, ["p q r s"]), n=3)
    bits = sorted(r["pos"] for r in bloom_bits(bench, m=32, k=4).collect())
    exp = sorted(
        {_pos(0, g, j, 32) for g in ["p q r", "q r s"] for j in range(1, 5)}
    )
    assert bits == exp
    assert all(0 <= p < 32 for p in bits)


def test_large_m_has_no_false_positives_here(spark):
    bench = benchmark_ngrams(_docs(spark, ["a b c d e"]), n=3)
    out = bloom_decontaminate(
        _docs(spark, ["f g h i j k"], start=100), bench, n=3, m=1 << 20, k=3
    ).collect()[0]
    assert out["n_bloom_hits"] == 0 and out["n_exact_hits"] == 0
