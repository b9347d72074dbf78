"""Whom-to-follow composite: circle of trust → SALSA → filtered top-k
on a crafted follow graph with an obvious best recommendation."""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.hits import wtf_recommendations


def test_obvious_recommendation(spark):
    # seeds 0-3 all follow hubs 10 and 11; both hubs follow 20 (the
    # consensus account) plus one idiosyncratic account each; a
    # disconnected clique 30-32 should never surface.
    edges = (
        [(s, 10) for s in range(4)]
        + [(s, 11) for s in range(4)]
        + [(10, 20), (11, 20), (10, 21), (11, 22)]
        + [(30, 31), (31, 32), (32, 30)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    out = wtf_recommendations(
        LinkGraph(df), [0, 1, 2, 3], circle_size=6, top_k=5
    ).collect()
    got = [r.node_id for r in out]
    # the consensus account ranks first; already-followed hubs and the
    # seeds themselves are excluded; the stranger clique is absent
    assert got[0] == 20
    assert set(got).isdisjoint({0, 1, 2, 3, 10, 11, 30, 31, 32})
    assert set(got) <= {20, 21, 22}
    # scores ordered and rounded
    auths = [r.auth for r in out]
    assert auths == sorted(auths, reverse=True)


def test_deterministic(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(60) if i != (i * 7 + 3) % 23]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = wtf_recommendations(LinkGraph(df), [0, 1], circle_size=8, top_k=5).collect()
    b = wtf_recommendations(LinkGraph(df), [0, 1], circle_size=8, top_k=5).collect()
    assert a == b and len(a) > 0
