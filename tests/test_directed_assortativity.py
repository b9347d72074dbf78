"""Directed assortativity (four modes) vs a numpy Pearson brute."""

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.stats import directed_assortativity


def _brute(edges):
    import math

    edges = sorted(set(e for e in edges if e[0] != e[1]))
    outd, ind = {}, {}
    for u, v in edges:
        outd[u] = outd.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    modes = {}
    for name, fa, fb in (
        ("in-in", lambda u: ind.get(u, 0), lambda v: ind.get(v, 0)),
        ("in-out", lambda u: ind.get(u, 0), lambda v: outd.get(v, 0)),
        ("out-in", lambda u: outd.get(u, 0), lambda v: ind.get(v, 0)),
        ("out-out", lambda u: outd.get(u, 0), lambda v: outd.get(v, 0)),
    ):
        xs = [float(fa(u)) for u, _ in edges]
        ys = [float(fb(v)) for _, v in edges]
        m = float(len(edges))
        mx, my = sum(xs) / m, sum(ys) / m
        cov = sum(a * b for a, b in zip(xs, ys)) / m - mx * my
        va = sum(a * a for a in xs) / m - mx * mx
        vb = sum(b * b for b in ys) / m - my * my
        modes[name] = (
            round(cov / (math.sqrt(va) * math.sqrt(vb)), 8)
            if va > 0 and vb > 0
            else None
        )
    return modes


def test_matches_brute(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(80)]
    edges += [(0, k) for k in range(5, 12)]  # an out-hub
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.mode: r.assortativity
           for r in directed_assortativity(LinkGraph(df)).collect()}
    want = _brute(edges)
    assert set(got) == set(want)
    for mode in want:
        if want[mode] is None:
            assert got[mode] is None
        else:
            assert abs(got[mode] - want[mode]) < 1e-7, mode


def test_star_is_degenerate_in_some_modes(spark):
    # pure out-star: every source has out-degree k, in-degree 0;
    # every target has in-degree 1, out-degree 0 → all four marginals
    # are constant → NULL everywhere
    df = spark.createDataFrame([(0, k) for k in range(1, 6)], "src long, dst long")
    got = {r.mode: r.assortativity
           for r in directed_assortativity(LinkGraph(df)).collect()}
    assert got == {"in-in": None, "in-out": None, "out-in": None, "out-out": None}
