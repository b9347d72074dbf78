"""Trigram Stupid-Backoff goldens (all three branches)."""

import math

import pytest

from dachshund_spark.pipeline.lm import stupid_backoff_scores


pytestmark = pytest.mark.quick


def _e8(x: float) -> int:
    return round(math.log(x) * 1e8)


def test_self_scoring_trigram_branch(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_trigrams, r.sb_e8)
        for r in stupid_backoff_scores(docs).collect()
    }
    # corpus: c2(ab)=3, c2(bc)=2, c2(ca)=1; c3(abc)=2, c3(bca)=1, c3(cab)=1, c3(abd)=1
    d1 = 2 * _e8(2 / 3) + _e8(1 / 2) + _e8(1 / 1)
    d2 = _e8(1 / 3)
    assert got == {1: (4, d1), 2: (1, d2)}


def test_backoff_branches(spark):
    train = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "x b c"), (2, "x y z"), (3, "x y c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.sb_e8
        for r in stupid_backoff_scores(docs, train=train).collect()
    }
    a = 2 / 5
    # doc 1: trigram xbc unseen, bigram bc seen: 0.4 * c2(bc)/c1(b) = 0.4
    assert got[1] == _e8(a * (1 / 1))
    # doc 2: everything unseen, z OOV -> 0.16 * 1 / C (C = 3)
    assert got[2] == _e8(a * a * (1 / 3))
    # doc 3: trigram/bigram(yc) unseen, c seen once -> 0.16 * 1/3
    assert got[3] == _e8(a * a * (1 / 3))


def test_short_docs_omitted(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c")], "doc_id long, text string"
    )
    ids = {r.doc_id for r in stupid_backoff_scores(docs).collect()}
    assert ids == {2}
