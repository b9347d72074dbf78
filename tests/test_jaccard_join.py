"""Prefix-filtered Jaccard join vs brute force + centralization."""

from itertools import combinations

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import degree_centralization
from dachshund_spark.pipeline.dedup import jaccard_join_prefix


pytestmark = pytest.mark.quick


def test_matches_bruteforce(spark):
    texts = {
        0: "a b c d e",
        1: "a b c d f",          # J(0,1) = 4/6
        2: "a b c d e x",        # J(0,2) = 5/6
        3: "a b c d e",          # J(0,3) = 1
        4: "z y w",
        5: "z y w q",            # J(4,5) = 3/4
        6: "completely different tokens here",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {(r.a, r.b): (r.inter, r.size_a, r.size_b)
           for r in jaccard_join_prefix(docs, tau_num=7, tau_den=10).collect()}

    sets = {k: set(v.split()) for k, v in texts.items()}
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 10 * inter >= 7 * union and inter > 0:
            exp[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == exp
    assert (0, 3) in got and (0, 2) in got and (4, 5) in got
    assert (0, 1) not in got  # 4/6 < 0.7


def test_threshold_dial(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
    )
    # J = 2/4 = 0.5
    assert jaccard_join_prefix(docs, tau_num=1, tau_den=2).count() == 1
    assert jaccard_join_prefix(docs, tau_num=6, tau_den=10).count() == 0


def test_degree_centralization_star_and_cycle(spark):
    star = LinkGraph(spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    ))
    r = degree_centralization(star).collect()[0]
    # star on 6 nodes: num = 6*5 - 10 = 20, den = 5*4 = 20 -> 1.0
    assert (r.cent_num, r.cent_den, r.centralization) == (20, 20, 1.0)
    cycle = LinkGraph(spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    ))
    assert degree_centralization(cycle).collect()[0].centralization == 0.0
