"""ExactSubstr duplicate spans + winnowing fingerprints: detection
guarantees, tie rules, shift robustness, and short-doc edges."""

from pyspark.sql import functions as F

from dachshund_spark.pipeline.dedup import (
    char_gram_hashes,
    duplicate_spans,
    winnow_fingerprints,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


SHARED = "the quick brown fox jumps over the lazy dog"  # 43 chars


def test_gram_count_and_short_doc(spark):
    docs = _docs(spark, ["abcdefgh", "abc"])
    grams = char_gram_hashes(docs, k=4).collect()
    assert all(r.doc_id == 0 for r in grams)  # len-3 doc emits nothing
    assert len(grams) == 8 - 4 + 1
    assert sorted(r.pos for r in grams) == [1, 2, 3, 4, 5]


def test_duplicate_spans_cross_doc(spark):
    docs = _docs(
        spark,
        [
            "AAAA " + SHARED + " BBBB",
            "CCCCCCC " + SHARED + " DDDD",
            "completely unrelated text with no shared spans at all here",
        ],
    )
    spans = duplicate_spans(docs, k=32).collect()
    # the shared span includes BOTH flanking spaces: " "+SHARED+" "
    assert len(spans) == (43 + 2) - 32 + 1
    assert all(r.n_docs == 2 and r.min_doc_id == 0 for r in spans)


def test_same_doc_repeat_not_cross_doc(spark):
    docs = _docs(spark, [SHARED + " ... " + SHARED, "nothing in common"])
    assert duplicate_spans(docs, k=32).count() == 0  # n_docs == 1


def test_winnow_guarantee_and_density(spark):
    # shared substring of length >= w + k - 1 must share a fingerprint
    k, w = 8, 4
    docs = _docs(spark, ["xx" + SHARED, SHARED + "yy zz"])
    fp = winnow_fingerprints(docs, k=k, w=w)
    by_doc = {
        d: {r.gram_hash for r in rows}
        for d, rows in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r.doc_id), lambda r: r.doc_id
        )
    }
    common = by_doc[0] & by_doc[1]
    assert len(common) >= 1
    # density: ~2/(w+1) of grams selected, never more than all
    n_grams = len("xx" + SHARED) - k + 1
    assert 2 <= len(by_doc[0]) <= n_grams


def test_winnow_shift_robust_vs_stride(spark):
    # content-based selection: inserting a prefix shifts every
    # position but the shared tail still yields shared fingerprints
    base = SHARED + " and then some more shared tail text"
    docs = _docs(spark, [base, "PREFIX-" + base])
    fp = winnow_fingerprints(docs, k=8, w=4)
    hashes = (
        fp.groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
        .count()
    )
    assert hashes >= 3


def test_winnow_short_doc_empty(spark):
    # len < k + w - 1 -> no full window -> nothing selected
    docs = _docs(spark, ["0123456789"])  # 10 < 8 + 4 - 1
    assert winnow_fingerprints(docs, k=8, w=4).count() == 0


def test_winnow_tie_leftmost(spark):
    # identical k-grams inside one window: struct(hash, pos) min picks
    # the leftmost occurrence deterministically
    docs = _docs(spark, ["abababababab"])
    fp = winnow_fingerprints(docs, k=4, w=3).collect()
    # all "abab"/"baba" grams hash to 2 values; selections must be
    # stable and deduped
    assert len(fp) == len({(r.pos, r.gram_hash) for r in fp})


def test_winnow_candidate_pairs(spark):
    from dachshund_spark.pipeline.dedup import winnow_candidate_pairs

    docs = _docs(
        spark,
        [
            SHARED + " tail one",
            SHARED + " tail two",
            "entirely different content nothing shared whatsoever here",
        ],
    )
    pairs = winnow_candidate_pairs(docs, k=8, w=4).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b) == (0, 1)
    assert 0 < p.shared_fp <= min(p.n_fp_a, p.n_fp_b)
    assert abs(p.est_jaccard - p.shared_fp / (p.n_fp_a + p.n_fp_b - p.shared_fp)) == 0


def test_winnow_pairs_bucket_cap(spark):
    from dachshund_spark.pipeline.dedup import winnow_candidate_pairs

    # 4 docs all sharing the same text: every fingerprint bucket has
    # size 4; cap 3 drops them all -> no candidate pairs
    docs = _docs(spark, [SHARED] * 4)
    assert winnow_candidate_pairs(docs, k=8, w=4).count() == 6  # C(4,2)
    assert winnow_candidate_pairs(docs, k=8, w=4, max_bucket=3).count() == 0


def test_duplicate_intervals_merge_overlap(spark):
    from dachshund_spark.pipeline.dedup import duplicate_intervals

    # two docs share " "+SHARED+" " (45 chars) embedded at different
    # offsets; all dup windows merge into ONE maximal interval each
    docs = _docs(spark, ["AAAA " + SHARED + " BBBB", "CC " + SHARED + " DD"])
    rows = sorted(
        duplicate_intervals(docs, k=32).collect(), key=lambda r: r.doc_id
    )
    assert len(rows) == 2
    # doc 0: shared span " SHARED " occupies [5-1+1, 4+45] = [5, 49]
    r0 = rows[0]
    assert (r0.start_pos, r0.end_pos, r0.span_len) == (5, 49, 45)
    r1 = rows[1]
    assert (r1.start_pos, r1.end_pos, r1.span_len) == (3, 47, 45)


def test_duplicate_intervals_disjoint_islands(spark):
    from dachshund_spark.pipeline.dedup import duplicate_intervals

    a = "0123456789abcdefghijklmnopqrstuv"  # 32 chars, shared block 1
    b = "ZYXWVUTSRQPONMLKJIHGFEDCBAzyxwvu"  # 32 chars, shared block 2
    filler1 = " one filler segment that is long and unique here "
    filler2 = " another totally different unique filler part!! "
    docs = _docs(spark, [a + filler1 + b, b + filler2 + a])
    rows = duplicate_intervals(docs, k=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start_pos, r.end_pos))
    # each doc: two disjoint 32-char islands (the filler separates them)
    assert all(len(v) == 2 for v in by_doc.values())
    for v in by_doc.values():
        assert all(e - s + 1 == 32 for s, e in v)
