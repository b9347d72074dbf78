"""Integer-exact Lloyd k-means — full-trajectory cross-check against a
pure-Python replay, plus clustering sanity on separated blobs."""

import pytest

from dachshund_spark.pipeline.clustering import kmeans_assignments


def _kmeans_py(vecs, k, iters, scale=1_000_000):
    # vecs: {vec_id: [floats]}; returns {vec_id: (cluster, dist2)}
    def iround(x):
        # round-half-away-from-zero, matching Spark/DuckDB ROUND
        import math

        v = x * scale
        f = math.floor(abs(v) + 0.5)
        return int(math.copysign(f, v))

    q = {i: [iround(x) for x in v] for i, v in vecs.items()}
    dim = len(next(iter(q.values())))
    seeds = sorted(q)[:k]
    cent = {s: list(q[s]) for s in seeds}
    assign = {}
    for it in range(iters):
        assign = {}
        for i, p in q.items():
            best = min(
                (sum((p[d] - c[d]) ** 2 for d in range(dim)), cl)
                for cl, c in cent.items()
            )
            assign[i] = (best[1], best[0])
        if it == iters - 1:
            break
        for cl in cent:
            members = [i for i, (c, _) in assign.items() if c == cl]
            if members:
                for d in range(dim):
                    s = sum(q[i][d] for i in members)
                    m = len(members)
                    # exact truncation toward zero (Spark DIV / DuckDB //)
                    cent[cl][d] = abs(s) // m * (1 if s >= 0 else -1)
    return assign


def test_kmeans_matches_python_replay(spark):
    import random

    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in kmeans_assignments(df, k=3, iterations=4).collect()
    }
    assert got == _kmeans_py(vecs, k=3, iters=4)


def test_kmeans_recovers_separated_blobs(spark):
    import random

    rng = random.Random(3)
    rows = []
    centers = [(10.0, 0.0), (-10.0, 0.0), (0.0, 10.0)]
    for i in range(90):
        cx, cy = centers[i % 3]
        rows.append(
            (i, [cx + rng.uniform(-0.5, 0.5), cy + rng.uniform(-0.5, 0.5)])
        )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_assignments(df, k=3, iterations=5).collect()
    by_true = {}
    for r in out:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    # each true blob maps to exactly one discovered cluster and the
    # three discovered clusters are distinct
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3
