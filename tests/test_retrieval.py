"""Retrieval layer: postings, tf-idf ranking, BM25 scoring, chunking.

Golden values are recomputed in-test with plain Python math using the
same pre-round-to-1e-8-int contract as the implementation, so any
drift in the parity scheme fails loudly.
"""

import math

import pytest
from pyspark.sql import functions as F

E8 = 100_000_000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana banana"),
        (2, "apple cherry date elder"),
        (3, "fig grape fig grape fig"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings(spark, docs):
    from dachshund_spark.pipeline.retrieval import postings

    rows = {(r.token, r.doc_id): r.tf for r in postings(docs).collect()}
    assert rows[("apple", 0)] == 2
    assert rows[("banana", 1)] == 3
    assert rows[("fig", 3)] == 3
    assert ("apple", 1) not in rows
    # total postings = distinct (token, doc) pairs
    assert len(rows) == 3 + 1 + 4 + 2


def test_tfidf_top_terms_golden(spark, docs):
    from dachshund_spark.pipeline.retrieval import tfidf_top_terms

    out = tfidf_top_terms(docs, k=2).collect()
    n = 4.0
    df = {"apple": 2, "banana": 2, "cherry": 2, "date": 1, "elder": 1,
          "fig": 1, "grape": 1}

    def idf_e8(t):
        return int(round(math.log(n / df[t]) * E8))

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        assert len(rs) <= 2
    # doc 0: apple tf=2 idf=ln2 -> 2*ln2 beats cherry (1*ln2) and banana
    d0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert d0[0].token == "apple" and d0[0].score_e8 == 2 * idf_e8("apple")
    assert d0[1].token == "banana" or d0[1].token == "cherry"
    # tie between banana(1*ln2) and cherry(1*ln2) breaks on token text
    assert d0[1].token == "banana"
    # doc 3: fig tf=3 idf=ln4 > grape tf=2 idf=ln4
    d3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert [r.token for r in d3] == ["fig", "grape"]
    assert d3[0].score_e8 == 3 * idf_e8("fig")


def test_bm25_golden(spark, docs):
    from dachshund_spark.pipeline.retrieval import bm25_topk

    out = bm25_topk(docs, ["apple", "fig"], k=4, k1=1.5, b=0.75).collect()
    # recompute with the same integer contract
    n = 4.0
    dls = {0: 4, 1: 3, 2: 4, 3: 5}
    avgdl = sum(dls.values()) / 4
    tfs = {("apple", 0): 2, ("apple", 2): 1, ("fig", 3): 3}
    dfq = {"apple": 2, "fig": 1}

    def idf_e8(t):
        return int(round(math.log((n - dfq[t] + 0.5) / (dfq[t] + 0.5) + 1.0) * E8))

    def term_e8(t, d):
        tf = tfs[(t, d)]
        w = (tf * 2.5) / (tf + 1.5 * (1.0 - 0.75 + 0.75 * (dls[d] / avgdl)))
        return int(round(idf_e8(t) * w))

    expect = {
        0: term_e8("apple", 0),
        2: term_e8("apple", 2),
        3: term_e8("fig", 3),
    }
    got = {r.doc_id: r.score_e8 for r in out}
    assert got == expect
    # doc 1 matches no query term -> absent, not zero-scored
    assert 1 not in got
    # fig is rarer (df=1) so doc 3 outranks the apple docs
    ranked = [r.doc_id for r in out]
    assert ranked[0] == 3


def test_bm25_empty_query_raises(spark, docs):
    from dachshund_spark.pipeline.retrieval import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_chunk_windows_cover_and_hash(spark):
    from dachshund_spark.pipeline.retrieval import chunk_windows
    from dachshund_spark.pipeline.text import md5_long

    text = " ".join(f"t{i}" for i in range(37))
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = chunk_windows(docs, window=16, stride=8).orderBy("chunk_idx").collect()
    # 37 tokens, W=16, S=8: extra = ceil(21/8) = 3 -> 4 chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.start_token for r in out] == [0, 8, 16, 24]
    assert [r.n_tokens for r in out] == [16, 16, 16, 13]
    # last chunk covers the tail: start 24 + 13 = 37
    assert out[-1].start_token + out[-1].n_tokens == 37
    # hash equals md5_long of the joined slice
    toks = text.split(" ")
    want = spark.createDataFrame(
        [(i, " ".join(toks[i * 8 : i * 8 + 16])) for i in range(4)],
        "chunk_idx long, win string",
    ).select("chunk_idx", md5_long(F.col("win")).alias("h")).collect()
    want = {r.chunk_idx: r.h for r in want}
    for r in out:
        assert r.chunk_hash == want[r.chunk_idx]


def test_chunk_windows_short_doc_single_chunk(spark):
    from dachshund_spark.pipeline.retrieval import chunk_windows

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = chunk_windows(docs, window=16, stride=8).collect()
    assert len(out) == 1
    assert out[0].n_tokens == 3 and out[0].start_token == 0


def test_chunk_windows_bad_args(spark):
    from dachshund_spark.pipeline.retrieval import chunk_windows

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(docs, window=0)
    with pytest.raises(ValueError):
        chunk_windows(docs, stride=-1)


def test_phrase_matches_counts_and_overlap(spark):
    from dachshund_spark.pipeline.retrieval import phrase_matches

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c"),      # "a b" twice
            (1, "a a a"),            # "a a" twice (overlapping starts 0,1)
            (2, "b a"),              # no "a b"
            (3, "a b"),              # once
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_matches(docs, ["a", "b"]).collect()
    }
    assert got == {0: 2, 3: 1}
    # repeated-term phrase with overlapping occurrences
    got2 = {
        r.doc_id: r.n_occurrences
        for r in phrase_matches(docs, ["a", "a"]).collect()
    }
    assert got2 == {1: 2}
    # single-term phrase = term frequency
    got1 = {
        r.doc_id: r.n_occurrences
        for r in phrase_matches(docs, ["a"]).collect()
    }
    assert got1 == {0: 2, 1: 3, 2: 1, 3: 1}
    with pytest.raises(ValueError):
        phrase_matches(docs, [])


def test_positional_postings(spark):
    from dachshund_spark.pipeline.retrieval import positional_postings

    docs = spark.createDataFrame([(5, "x y x")], "doc_id long, text string")
    rows = sorted(
        (r.token, r.pos) for r in positional_postings(docs).collect()
    )
    assert rows == [("x", 0), ("x", 2), ("y", 1)]


def test_rrf_fuse_combines_lists(spark):
    from dachshund_spark.pipeline.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(3, 1), (2, 2), (4, 3)], "doc_id long, rank long")
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 2 appears at rank 2 in both lists; docs 1/3 split rank 1 and 3
    assert out[2].n_lists == 2
    assert out[1].n_lists == 1 and out[4].n_lists == 1
    # exact integer contributions: floor(1e8/61), floor(1e8/62), floor(1e8/63)
    c1, c2, c3 = 100000000 // 61, 100000000 // 62, 100000000 // 63
    assert out[2].rrf_e8 == 2 * c2
    assert out[3].rrf_e8 == c3 + c1
    # consensus wins: two rank-2 appearances outscore a single rank-1
    assert out[2].rrf_e8 > out[1].rrf_e8
    assert abs(out[2].rrf - out[2].rrf_e8 / 1e8) < 1e-12


def test_rrf_fuse_topk_and_validation(spark):
    import pytest as _pytest

    from dachshund_spark.pipeline.retrieval import rrf_fuse

    a = spark.createDataFrame([(i, i + 1) for i in range(5)], "doc_id long, rank long")
    out = rrf_fuse([a], topk=2).collect()
    assert [r.doc_id for r in out] == [0, 1]
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_doc_similarity_prefix_filter_and_scores(spark):
    import math

    from dachshund_spark.pipeline.retrieval import doc_similarity_topk

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry"),
            (1, "apple banana dates"),
            (2, "apple zebra yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    # max_df=2 drops 'apple' (df=3); banana (df=2) links 0<->1 only
    out = doc_similarity_topk(docs, k=3, max_df=2, query_max_id=4)
    got = {(r["doc_id"], r["sim_id"]): r["score_e8"] for r in out.collect()}
    idf_banana = round(math.log(4 / 2) * 10000.0)
    assert got[(0, 1)] == idf_banana * idf_banana  # tf 1*1
    assert (0, 2) not in got and (2, 0) not in got  # only 'apple' shared
    assert not any(a == 3 or b == 3 for a, b in got)  # no shared rare tokens


def test_retrieval_eval_perfect_and_empty(spark):
    """Hand-computed nDCG/MRR: a query where BM25's ranking equals the
    ideal gain ordering (ndcg exactly 1.0 via equal integer DCG sums)
    and a query with no multi-term matches (idcg 0 -> ndcg/rr 0)."""
    from dachshund_spark.pipeline.retrieval import retrieval_eval

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),   # 3 matches -> gain 3
            (2, "alpha beta pad"),     # 2 matches -> gain 1
            (3, "alpha pad pad"),      # 1 match   -> gain 0
            (4, "zzz yyy xxx"),        # q1 single-term matches only
            (5, "zzz pad pad"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.query_id: r
        for r in retrieval_eval(
            docs, {0: ["alpha", "beta", "gamma"], 1: ["zzz", "qqq", "www"]}, k=10
        ).collect()
    }
    # q0: idf(alpha) < idf(beta) < idf(gamma) all > 0, equal lengths and
    # tf=1, so score(d1) > score(d2) > score(d3): rank == ideal_rank.
    # disc(1)=1e8, disc(2)=round(1e8/log2(3))=63092975
    dcg = 3 * 100_000_000 + 1 * 63_092_975
    q0 = out[0]
    assert (q0.dcg_e8, q0.idcg_e8) == (dcg, dcg)
    assert q0.ndcg == 1.0 and q0.rr == 1.0 and q0.first_rel_rank == 1
    # q1: every matching doc matches exactly one term -> all gains 0
    q1 = out[1]
    assert q1.dcg_e8 == 0 and q1.idcg_e8 == 0
    assert q1.ndcg == 0.0 and q1.rr == 0.0 and q1.first_rel_rank == 0


def test_retrieval_eval_misranking_penalized(spark):
    """A tf-spammy single-term doc can outscore a two-term doc on BM25;
    nDCG@k must then drop below 1 and MRR reflect the later first hit."""
    from dachshund_spark.pipeline.retrieval import retrieval_eval

    docs = spark.createDataFrame(
        [
            # one doc matching both terms once, long
            (1, "alpha beta " + " ".join(["pad"] * 6)),
            # short doc stuffed with only 'alpha'
            (2, "alpha alpha alpha"),
            # background docs so idf(alpha) is low, idf(beta) modest
            (3, "alpha pad pad pad"),
            (4, "alpha pad pad pad"),
            (5, "alpha pad pad pad"),
            (6, "alpha pad pad pad"),
            (7, "alpha pad pad pad"),
            (8, "alpha pad pad pad"),
            (9, "beta pad pad pad"),
            (10, "beta pad pad pad"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.query_id: r
        for r in retrieval_eval(docs, {0: ["alpha", "beta"]}, k=10).collect()
    }
    q0 = out[0]
    # only doc 1 has gain >= 1 (two matched terms); if the ranking were
    # ideal ndcg would be 1 with rr 1 -- assert the misrank is detected
    assert q0.idcg_e8 == 100_000_000  # single gain-1 doc at ideal rank 1
    assert 0.0 < q0.ndcg < 1.0
    assert q0.first_rel_rank > 1
    assert q0.rr == 1.0 / q0.first_rel_rank
