"""Positional attribution, Heaps curve, AMS F2 goldens."""

import datetime
import hashlib

import pytest

from dachshund_spark.relational import positional_attribution
from dachshund_spark.pipeline.text import heaps_curve
from dachshund_spark.pipeline.sketches import ams_f2


pytestmark = pytest.mark.quick


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_positional_credit_split(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, dt_s, user, typ):
        return (eid, t0 + datetime.timedelta(seconds=dt_s), user, typ, 0.0, "{}")

    rows = (
        # user 1: four touches then purchase
        [ev(i, i * 10, 1, "click") for i in range(4)]
        + [ev(100, 100, 1, "purchase")]
        # user 2: one touch
        + [ev(10, 0, 2, "click"), ev(101, 50, 2, "purchase")]
        # user 3: two touches
        + [ev(20, 0, 3, "click"), ev(21, 5, 3, "click"), ev(102, 50, 3, "purchase")]
    )
    ev_df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.conv_id, r.touch_id): r.credit_e8
        for r in positional_attribution(ev_df).collect()
    }
    assert got == {
        (100, 0): 40_000_000,
        (100, 1): 10_000_000,
        (100, 2): 10_000_000,
        (100, 3): 40_000_000,
        (101, 10): 100_000_000,
        (102, 20): 50_000_000,
        (102, 21): 50_000_000,
    }


def test_heaps_curve_levels(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "d"), (3, "a d e"), (4, "f")],
        "doc_id long, text string",
    )
    got = {r.k: (r.n_docs, r.tokens_cum, r.vocab_cum)
           for r in heaps_curve(docs).collect()}
    # levels: doc 0 -> 1; docs 1,2 -> 2; docs 3,4 -> 3
    assert got == {
        1: (1, 2, 2),          # prefix {0}: tokens a,b
        2: (3, 5, 4),          # prefix {0,1,2}: + c, d
        3: (5, 9, 6),          # all: + e, f
    }


def test_ams_f2_matches_python(spark):
    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "y z")], "doc_id long, text string"
    )
    rows = ams_f2(docs, k=4).collect()
    toks = ["x", "x", "y", "y", "z"]
    for r in rows:
        z = sum(
            1 if _md5_long(f"ams{r.estimator}#{t}") % 2 == 0 else -1
            for t in toks
        )
        assert (r.z, r.z2) == (z, z * z)
        assert r.f2_exact == 4 + 4 + 1
    assert len(rows) == 4
