"""HLL-40 sketch: register replay, mergeability, estimate accuracy."""

import hashlib
import math

from pyspark.sql import functions as F

from dachshund_spark.pipeline.sketches import hll_estimate, hll_registers

P, M, RCAP = 8, 256, 40


def _h(v, seed=0):
    return int(hashlib.md5(f"{seed}#hll#{v}".encode()).hexdigest()[:15], 16)


def _replay_regs(values, seed=0):
    regs = {}
    for v in values:
        h = _h(v, seed)
        reg = h % M
        rest = h >> P
        if rest == 0:
            rho = 60 - P + 1
        else:
            rho = (60 - P) - rest.bit_length() + 1
        rho = min(rho, RCAP)
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _replay_estimate(regs):
    z_e = sum(1 << (RCAP - r) for r in regs.values()) + (M - len(regs)) * (
        1 << RCAP
    )
    alpha = 0.7213 / (1.0 + 1.079 / M)
    raw = alpha * (M * M * (1 << RCAP)) / z_e
    v = M - len(regs)
    if raw <= 2.5 * M and v > 0:
        return z_e, float(M) * math.log(M / float(v))
    return z_e, raw


def _df(spark, values, key="k"):
    return spark.createDataFrame([(key, str(v)) for v in values], "k string, v string")


def test_registers_match_python_replay(spark):
    values = [f"item{i}" for i in range(300)]
    got = {
        r["reg"]: r["rho"]
        for r in hll_registers(_df(spark, values), ["k"], "v").collect()
    }
    assert got == _replay_regs(values)


def test_estimate_matches_replay_and_is_accurate(spark):
    for n in (40, 2000):
        values = [f"u{i}" for i in range(n)]
        est = hll_estimate(
            hll_registers(_df(spark, values), ["k"], "v"), ["k"]
        ).collect()[0]
        z_e, exp = _replay_estimate(_replay_regs(values))
        assert est["z_e"] == z_e
        assert est["estimate"] == exp
        assert abs(est["estimate"] - n) / n < 0.15  # ~6.5% typical at m=256


def test_shard_merge_equals_union_sketch(spark):
    a = [f"x{i}" for i in range(500)]
    b = [f"x{i}" for i in range(300, 900)]  # overlap
    ra = hll_registers(_df(spark, a), ["k"], "v")
    rb = hll_registers(_df(spark, b), ["k"], "v")
    merged = (
        ra.unionByName(rb).groupBy("k", "reg").agg(F.max("rho").alias("rho"))
    )
    direct = hll_registers(_df(spark, a + b), ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_multi_key_isolation(spark):
    rows = [("s1", f"a{i}") for i in range(100)] + [
        ("s2", f"b{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    est = {
        r["k"]: r["estimate"]
        for r in hll_estimate(hll_registers(df, ["k"], "v"), ["k"]).collect()
    }
    assert est["s1"] > est["s2"]


def test_kmv_exact_when_under_k(spark):
    from dachshund_spark.pipeline.sketches import kmv_estimate

    vals = spark.createDataFrame([(f"v{i}",) for i in range(20)], "token string")
    row = kmv_estimate(vals, "token", k=64).collect()[0]
    # fewer distinct than k -> falls back to the exact count
    assert row["est_distinct"] == 20 and row["exact_distinct"] == 20


def test_kmv_estimate_within_rel_error(spark):
    from dachshund_spark.pipeline.sketches import kmv_estimate

    n = 5000
    vals = spark.createDataFrame(
        [(f"tok{i}",) for i in range(n)], "token string"
    )
    row = kmv_estimate(vals, "token", k=128).collect()[0]
    assert row["exact_distinct"] == n
    # KMV rel. std error ~ 1/sqrt(k-2) ≈ 9%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.36
