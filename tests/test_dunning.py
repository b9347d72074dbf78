"""Dunning LLR collocation goldens."""

import math

import pytest

from dachshund_spark.pipeline.lm import dunning_collocations


pytestmark = pytest.mark.quick


def test_llr_hand_computed(spark):
    # corpus engineered so "x y" is a strong collocation
    docs = spark.createDataFrame(
        [(0, "x y x y x y x y x y"), (1, "a b a c a d a e a f")],
        "doc_id long, text string",
    )
    rows = dunning_collocations(docs, min_count=5, top_k=10).collect()
    got = {(r.w1, r.w2): (r.c12, r.c1, r.c2, r.llr_e8) for r in rows}
    # bigrams doc0: xy yx xy yx xy yx xy yx xy (9: 5 xy, 4 yx)
    # doc1: ab ba ac ca ad da ae ea af fa (9: a* 5 times as w1)
    assert ("x", "y") in got
    c12, c1, c2, llr = got[("x", "y")]
    assert (c12, c1, c2) == (5, 5, 5)
    n = 18

    def term(o, row, col):
        return 0 if o <= 0 else o * round(math.log(o * n / (row * col)) * 1e8)

    exp = 2 * (
        term(5, 5, 5)
        + term(0, 5, n - 5)
        + term(0, n - 5, 5)
        + term(n - 5 - 5 + 5, n - 5, n - 5)
    )
    assert llr == exp


def test_min_count_gate(spark):
    docs = spark.createDataFrame(
        [(0, "p q r s t u v w")], "doc_id long, text string"
    )
    assert dunning_collocations(docs, min_count=2, top_k=10).count() == 0
