"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k as one join + window (exact).
Scale path: LSH-bucketed variant — random-hyperplane signatures
restrict candidate pairs to matching buckets, turning the O(N·Q)
scan into bucket-local joins. Both are pure column algebra (zip_with /
aggregate run inside codegen); no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dachshund_spark.pipeline.text import md5_long


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, computed in
    element order (reproducible across engines)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors: [query_id, neighbor_id, cos_sim, rank].

    ``queries`` rows join against every vector (broadcast the query
    side); ties broken by neighbor id so output is deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cos_sim_raw"),
        )
    )
    sim_col = (
        F.round("cos_sim_raw", round_digits) if round_digits else F.col("cos_sim_raw")
    )
    sims = sims.select("query_id", "neighbor_id", sim_col.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signatures(
    vectors: DataFrame,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH signature per vector: [id, sig].

    Plane p's normal components are derived deterministically from
    md5(seed, p, dim-index) — no RNG state to ship to executors; the
    signature bit is sign(v · n_p).
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"), dim_idx.alias("idx")
    )
    bits = []
    for p in range(num_planes):
        # pseudo-random ±1 components per (seed, plane, dim)
        normal = F.transform(
            F.col("idx"),
            lambda i: F.when(
                F.pmod(md5_long(F.concat_ws("#", F.lit(seed), F.lit(p), i)), 2) == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        proj = F.aggregate(
            F.zip_with(F.col("v"), normal, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return v.select("vec_id", sig.alias("sig"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing the
    LSH bucket (full signature match), then exact cosine re-rank.

    At 100 TB the bucket join replaces the all-pairs crossJoin; recall
    is tuned by num_planes (fewer planes → bigger buckets → higher
    recall, more compute)."""
    sig_v = hyperplane_signatures(vectors, num_planes, id_col, vec_col, seed)
    sig_q = hyperplane_signatures(queries, num_planes, id_col, vec_col, seed)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    ).join(sig_v.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).join(sig_q.withColumnRenamed("vec_id", "query_id"), "query_id")
    cands = q.join(v, "sig").where(F.col("query_id") != F.col("neighbor_id"))
    sims = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, bucketed
    by hyperplane LSH: [vec_a, vec_b, cos_sim]."""
    sig = hyperplane_signatures(vectors, num_planes, id_col, vec_col, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).join(sig, "vec_id")
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "sig")
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "sig")
    return (
        a.join(b, "sig")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )
