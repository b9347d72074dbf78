"""DSIR importance weights: directional separation (target-like docs
score higher), exact-integer reproducibility, and token accounting."""

import math

from pyspark.sql import functions as F

from dachshund_spark.pipeline.lm import E8, dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


CORPUS = [
    (0, "alpha beta gamma alpha beta", "en"),
    (1, "beta alpha alpha gamma beta gamma", "en"),
    (2, "zeta eta theta zeta eta", "de"),
    (3, "theta zeta eta eta theta zeta", "de"),
    (4, "alpha beta gamma beta", "de"),  # de doc with en-like vocab
]


def test_target_vocab_scores_higher(spark):
    docs = _docs(spark, CORPUS)
    w = {
        r.doc_id: r.log_weight
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    # en-vocab docs (0, 1, 4) must outrank de-vocab docs (2, 3)
    assert min(w[0], w[1], w[4]) > max(w[2], w[3])


def test_exact_integer_and_token_count(spark):
    docs = _docs(spark, CORPUS)
    out = {r.doc_id: r for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    assert out[0].n_tokens == 5 and out[3].n_tokens == 6
    for r in out.values():
        assert r.log_weight == r.w_e8 / E8  # single closing division


def test_small_corpus_hand_check(spark):
    # one target doc "a a", one source-only doc "b": with B buckets,
    # bucket(a): tc=2 sc=2; bucket(b): tc=0 sc=1; S=3, T=2
    docs = _docs(spark, [(0, "a a", "en"), (1, "b", "de")])
    B = 1024
    out = {r.doc_id: r for r in dsir_weights(docs, F.col("lang") == "en", n_buckets=B).collect()}

    def e8ln(x):
        return round(math.log(x) * E8)

    term_a = e8ln(3) - e8ln(3) + e8ln(3 + B) - e8ln(2 + B)
    term_b = e8ln(1) - e8ln(2) + e8ln(3 + B) - e8ln(2 + B)
    assert out[0].w_e8 == 2 * term_a
    assert out[1].w_e8 == term_b


def test_row_order_invariant(spark):
    docs = _docs(spark, CORPUS)
    shuffled = _docs(spark, list(reversed(CORPUS))).repartition(7)
    a = {r.doc_id: r.w_e8 for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    b = {r.doc_id: r.w_e8 for r in dsir_weights(shuffled, F.col("lang") == "en").collect()}
    assert a == b
