"""Decontamination / substring-dup / mixing-sampler / PII-scrub units.

Value assertions are handcrafted (no oracle dependency here — the
driver-level DuckDB oracles cover the fixture corpus); plan tests pin
the scale contracts: sampler and scrubber are shuffle-free maps, and
decontamination broadcasts the benchmark gram set.
"""

from pyspark.sql import functions as F

from dachshund_spark.pipeline.decontam import (
    benchmark_ngrams,
    decontaminate,
    duplicate_ngram_stats,
    scrub_pii,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_shared_ngram(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta", "en")])
    corpus = _docs(
        spark,
        [
            (1, "x alpha beta gamma y", "en"),  # shares "alpha beta gamma"
            (2, "no overlap here at all", "en"),
            (3, "zz", "en"),  # < n tokens: zero grams
        ],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in decontaminate(corpus, benchmark_ngrams(bench, n=3), n=3).collect()
    }
    assert got[1] == (3, 1, True)
    assert got[2] == (3, 0, False)
    assert got[3] == (0, 0, False)


def test_decontaminate_counts_distinct_grams_once(spark):
    bench = _docs(spark, [(100, "a b c", "en")])
    # "a b c" occurs twice in doc 1 — distinct grams, so n_overlap == 1
    corpus = _docs(spark, [(1, "a b c a b c", "en")])
    row = decontaminate(corpus, benchmark_ngrams(bench, n=3), n=3).collect()[0]
    assert (row["n_grams"], row["n_overlap"]) == (3, 1)


def test_duplicate_ngram_stats_cross_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d", "en"),  # positions: "a b c", "b c d"
            (2, "x a b c", "en"),  # positions: "x a b", "a b c"
            (3, "solo unique words only", "en"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_positions"], r["n_dup_positions"], r["dup_frac"])
        for r in duplicate_ngram_stats(docs, n=3, min_docs=2).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 0, 0.0)


def test_duplicate_ngram_within_doc_repeat_not_counted(spark):
    # the same gram twice in ONE doc is df=1 — not cross-document
    docs = _docs(spark, [(1, "a b c a b c", "en")])
    row = duplicate_ngram_stats(docs, n=3, min_docs=2).collect()[0]
    assert row["n_dup_positions"] == 0


def test_stratified_sample_rate_bounds(spark):
    docs = _docs(
        spark, [(i, "t", "en" if i % 2 == 0 else "zh") for i in range(200)]
    )
    kept = stratified_sample(docs, {"en": 1.0, "zh": 0.0}, seed=3)
    langs = {r["lang"] for r in kept.collect()}
    assert langs == {"en"}
    assert kept.count() == 100


def test_stratified_sample_partition_invariant(spark):
    docs = _docs(spark, [(i, "t", "en") for i in range(500)])
    a = stratified_sample(docs, {"en": 0.5}, seed=7)
    b = stratified_sample(docs.repartition(7), {"en": 0.5}, seed=7)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b
    # hash threshold keeps ~half; exact value pinned by determinism
    assert 200 < len(ids_a) < 300


def test_scrub_pii_values(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@x.co or 10.1.2.3 or 555-123-4567 now"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[1]["text"] == "mail <EMAIL> or <IP> or <PHONE> now"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[2]["text"] == "nothing sensitive here"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 0)


def test_sampler_and_scrubber_plans_are_shuffle_free(spark):
    from tests.test_plans import plan_of

    docs = _docs(spark, [(1, "t", "en")])
    for df in (
        stratified_sample(docs, {"en": 0.5}),
        scrub_pii(docs.select("doc_id", "text")),
    ):
        plan = plan_of(df).split("== Initial Plan ==")[0]
        assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    from tests.test_plans import plan_of

    bench = _docs(spark, [(100, "a b c", "en")])
    corpus = _docs(spark, [(1, "a b c d", "en")])
    plan = plan_of(decontaminate(corpus, benchmark_ngrams(bench, n=3), n=3))
    assert "BroadcastHashJoin" in plan


def test_frontier_priority_values_and_missing_hosts(spark):
    from dachshund_spark.pipeline.curate import frontier_priority

    hr = spark.createDataFrame(
        [("a.com", 0.5), ("b.com", 0.25), ("empty.com", 0.25)],
        "host string, pagerank double",
    )
    dh = spark.createDataFrame(
        [(1, "a.com", True), (2, "a.com", False), (3, "b.com", True)],
        "doc_id long, host string, passes_quality boolean",
    )
    got = {r["host"]: r for r in frontier_priority(hr, dh).collect()}
    assert got["a.com"]["n_docs"] == 2 and got["a.com"]["n_quality_docs"] == 1
    assert got["a.com"]["priority"] == 0.25  # 0.5 * 1/2
    assert got["b.com"]["priority"] == 0.25
    assert got["empty.com"]["n_docs"] == 0 and got["empty.com"]["priority"] == 0.0
