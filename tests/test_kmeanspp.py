"""k-means|| oversampling init: full Python replay of the seeded
sampling trajectory + invariants."""

import hashlib

from dachshund_spark.pipeline.clustering import kmeanspp_init


def _coin(vec_id, r, seed=0):
    return int(
        hashlib.md5(f"kpp{seed}#r{r}#{vec_id}".encode()).hexdigest()[:5], 16
    )


def _brute(vecs, l, rounds, seed=0, scale=1000):
    q = {i: [int(v * scale) for v in vec] for i, vec in vecs.items()}

    def dist2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(q[a], q[b]))

    first = min(q)
    centers = [(first, 0)]
    d2 = {x: dist2(x, first) for x in q}
    for r in range(1, rounds + 1):
        phi = sum(d2.values())
        if not phi:
            break
        new = sorted(
            x
            for x in q
            if d2[x] > 0 and _coin(x, r, seed) < (l * d2[x] * 1048576) // phi
        )
        if not new:
            continue
        centers.extend((x, r) for x in new)
        for x in q:
            d2[x] = min(d2[x], min(dist2(x, c) for c in new))
    weights = {c: 0 for c, _ in centers}
    for x in q:
        best = min((dist2(x, c), c) for c, _ in centers)
        weights[best[1]] += 1
    return sorted((c, r, weights[c]) for c, r in centers)


def test_replay_matches_engine(spark):
    # two tight 2-d clusters + an outlier; every coordinate is an exact
    # multiple of 1e-3 so quantization is rounding-free in both paths
    vecs = {
        0: [0.0, 0.0], 1: [0.001, 0.0], 2: [0.0, 0.002],
        10: [0.9, 0.9], 11: [0.901, 0.9], 12: [0.9, 0.902],
        20: [0.4, 0.95], 30: [0.05, 0.5],
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r.vec_id, r.round_added, r.weight)
        for r in kmeanspp_init(emb, l=8, rounds=2).collect()
    )
    assert got == _brute(vecs, l=8, rounds=2)
    # the init must cover the far cluster with high probability at l=8;
    # at minimum the weights partition the corpus
    assert sum(w for _, _, w in got) == len(vecs)
    assert got[0][:2] == (0, 0)


def test_empty_input(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeanspp_init(emb).collect() == []


def test_deterministic_across_runs(spark):
    emb = spark.createDataFrame(
        [(i, [i * 0.001, (7 - i) * 0.001]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    a = kmeanspp_init(emb, l=4, rounds=3).collect()
    b = kmeanspp_init(emb, l=4, rounds=3).collect()
    assert a == b and a[0].vec_id == 0
