"""TextRank keyword extraction: weighted PageRank over the word
co-occurrence graph (Mihalcea & Tarau 2004, window = 2)."""

import pytest
from pyspark.sql import functions as F

from dachshund_spark.pipeline.lm import textrank_keywords


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_textrank_hub_word_wins(spark):
    # 'graph' co-occurs with every other word; it must rank first
    docs = _docs(
        spark,
        [
            "graph mining",
            "graph theory",
            "graph rank",
            "graph mining",
            "web graph",
        ],
    )
    out = textrank_keywords(docs, topk=10).collect()
    assert out[0].token == "graph"
    assert out[0].score > out[1].score
    # every token in the co-occurrence graph appears, none duplicated
    toks = [r.token for r in out]
    assert len(toks) == len(set(toks)) == 5


def test_textrank_scores_sum_to_one(spark):
    docs = _docs(spark, ["a b c a b", "c d e", "e f a"])
    out = textrank_keywords(docs, topk=100).collect()
    # L1 norm preserved by the PageRank recurrence (no dangling mass)
    assert abs(sum(r.score for r in out) - 1.0) < 1e-6


def test_textrank_symmetric_corpus_ties_broken_by_token(spark):
    # two disjoint, isomorphic pairs: identical scores, token order
    docs = _docs(spark, ["x y", "p q"])
    out = textrank_keywords(docs, topk=4).collect()
    scores = {r.token: r.score for r in out}
    assert scores["x"] == scores["y"] == scores["p"] == scores["q"]
    assert [r.token for r in out] == ["p", "q", "x", "y"]


def test_textrank_ignores_self_pairs_and_short_docs(spark):
    # 'z z' self-pair contributes no edge; single-token doc contributes
    # nothing — graph is just a-b
    docs = _docs(spark, ["z z", "solo", "a b"])
    out = textrank_keywords(docs, topk=10).collect()
    assert sorted(r.token for r in out) == ["a", "b"]
