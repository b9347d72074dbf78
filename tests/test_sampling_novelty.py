"""Hash-stratified sampling determinism/rates + n-gram novelty."""

from pyspark.sql import functions as F

from dachshund_spark.pipeline.curate import hash_stratified_sample
from dachshund_spark.pipeline.dedup import ngram_novelty


def test_stratified_deterministic_and_subset(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, text string, lang string",
    )
    a = {r.doc_id for r in hash_stratified_sample(docs, {"en": 0.5, "de": 0.1}).collect()}
    b = {r.doc_id for r in hash_stratified_sample(docs, {"en": 0.5, "de": 0.1}).collect()}
    assert a == b  # pure function of ids
    # half-rate subset property: lowering a stratum's rate only removes
    half = {r.doc_id for r in hash_stratified_sample(docs, {"en": 0.25, "de": 0.1}).collect()}
    assert half <= a
    # rates roughly honored (1000 ids per stratum, md5-uniform)
    en = sum(1 for i in a if i % 2 == 0) / 1000
    de = sum(1 for i in a if i % 2 == 1) / 1000
    assert 0.4 < en < 0.6 and 0.05 < de < 0.16


def test_stratified_default_and_seed(spark):
    docs = spark.createDataFrame(
        [(i, "t", "fr") for i in range(100)], "doc_id long, text string, lang string"
    )
    assert hash_stratified_sample(docs, {"en": 1.0}).count() == 0  # default 0
    assert hash_stratified_sample(docs, {}, default=1.0).count() == 100
    s0 = {r.doc_id for r in hash_stratified_sample(docs, {"fr": 0.5}, seed=0).collect()}
    s1 = {r.doc_id for r in hash_stratified_sample(docs, {"fr": 0.5}, seed=1).collect()}
    assert s0 != s1  # seed changes the kept set


def test_novelty_bounds_and_values(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    docs = spark.createDataFrame(
        [
            (0, shared),
            (1, shared),
            (2, "a completely different and unshared sentence here!!"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, k=32).collect()}
    assert out[0].novel == 0 and out[1].novel == 0  # fully duplicated
    assert out[2].novelty == 1.0
    assert out[0].n_grams == 43 - 32 + 1
    for r in out.values():
        assert r.novelty == r.novel / r.n_grams


def test_novelty_within_doc_repeat_still_novel(spark):
    s = "0123456789abcdefghijklmnopqrstuvwxyz"  # 36 chars, unique doc
    docs = spark.createDataFrame(
        [(0, s + " ## " + s)], "doc_id long, text string"
    )
    r = ngram_novelty(docs, k=32).collect()[0]
    assert r.novelty == 1.0  # repeats within the same doc are not dups
