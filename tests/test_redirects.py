"""Redirect-chain resolution (pointer doubling)."""

from pyspark.sql import functions as F

from dachshund_spark.algorithms.redirects import resolve_redirects


def _resolve(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = resolve_redirects(df, **kw)
    return {
        r["src"]: (r["final"], r["hops"], r["is_loop"]) for r in out.collect()
    }


def test_single_hop(spark):
    got = _resolve(spark, [(1, 2)])
    assert got == {1: (2, 1, False)}


def test_long_chain_exact_hops(spark):
    # 0 -> 1 -> 2 -> ... -> 10 (terminal); doubling must report the
    # exact walk length from every entry point
    got = _resolve(spark, [(i, i + 1) for i in range(10)])
    assert got[0] == (10, 10, False)
    assert got[7] == (10, 3, False)
    assert got[9] == (10, 1, False)


def test_chain_resolves_in_log_rounds(spark):
    # a 30-hop chain needs ceil(log2(30)) + 1 = 6 doubling rounds,
    # nowhere near 30 — give it exactly 6 and require full resolution
    got = _resolve(spark, [(i, i + 1) for i in range(30)], max_rounds=6)
    assert got[0] == (30, 30, False)
    assert not any(loop for _, _, loop in got.values())


def test_loop_flagged(spark):
    got = _resolve(spark, [(1, 2), (2, 3), (3, 1), (7, 1)], max_rounds=5)
    assert got[1][2] and got[2][2] and got[3][2]
    # 7 enters the loop: also unresolvable
    assert got[7][2]


def test_self_redirect_is_loop(spark):
    got = _resolve(spark, [(5, 5)], max_rounds=4)
    assert got[5][0] == 5 and got[5][2]


def test_branches_into_shared_chain(spark):
    # two chains merging: 1 -> 3, 2 -> 3, 3 -> 4
    got = _resolve(spark, [(1, 3), (2, 3), (3, 4)])
    assert got == {1: (4, 2, False), 2: (4, 2, False), 3: (4, 1, False)}


def test_multi_graph_isolation(spark):
    df = spark.createDataFrame(
        [(0, 1, 2), (0, 2, 3), (1, 1, 9)],
        "graph_id long, src long, dst long",
    )
    out = resolve_redirects(df).collect()
    got = {(r["graph_id"], r["src"]): (r["final"], r["hops"]) for r in out}
    assert got == {(0, 1): (3, 2), (0, 2): (3, 1), (1, 1): (9, 1)}
