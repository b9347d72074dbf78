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


def test_khop_neighbor_sample_semantics(spark):
    from pyspark.sql import functions as F

    from dachshund_spark.skew import khop_neighbor_sample

    # star hub 0 -> 1..9 plus chain 1->10->11
    rows = [(0, i) for i in range(1, 10)] + [(1, 10), (10, 11)]
    e = spark.createDataFrame(rows, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node_id long")
    out = khop_neighbor_sample(e, seeds, fanouts=(4, 2), seed=3)
    rows_out = out.collect()
    h1 = [r for r in rows_out if r["hop"] == 1]
    h2 = [r for r in rows_out if r["hop"] == 2]
    # fanout cap: exactly 4 of hub 0's nine out-edges
    assert len(h1) == 4 and all(r["src"] == 0 for r in h1)
    # hop 2 expands only the sampled frontier
    frontier = {r["dst"] for r in h1}
    assert all(r["src"] in frontier for r in h2)
    if 1 in frontier:
        assert (1, 10) in {(r["src"], r["dst"]) for r in h2}
    # deterministic: same seed -> identical sample
    again = khop_neighbor_sample(e, seeds, fanouts=(4, 2), seed=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows_out))
    # different seed -> (almost surely) different hop-1 choice set
    other = khop_neighbor_sample(e, seeds, fanouts=(4, 2), seed=4)
    assert {r["dst"] for r in other.collect() if r["hop"] == 1} != frontier
