"""Integer-exact distributed Lloyd k-means over embedding columns.

IVF-ANN (pipeline/similarity.py) already trains float Lloyd centroids
for its cell index; this is the *auditable* clustering twin: vectors
are quantized to a 1e-6 integer grid first, so assignments (squared L2
in BIGINT), centroid updates (truncating integer mean), and every
tie-break are bit-exact in any engine — the whole trajectory replays
in SQL.  Use it when cluster membership must be reproducible across
runs/engines (corpus bucketing for mixture weights, SemDedup-style
pre-clustering), not when float precision matters.

Scale shape: points live exploded as (vec_id, dim, q) rows; each
iteration is one join against the k·dim centroid table (broadcast — it
is tiny by construction), one (vec_id, cluster) partial-agg sum, one
arg-min window per point keyed by vec_id, and one centroid groupBy.
Centroids are collected per iteration (k·dim rows — driver-safe at any
corpus size); everything per-point stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def quantize_points(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exploded integer grid points ``[vec_id, d, q]`` (1-based dim)."""
    return emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("d", "_v")
    ).select(
        "vec_id",
        (F.col("d") + 1).alias("d"),
        F.round(F.col("_v").cast("double") * F.lit(int(scale)), 0)
        .cast("long")
        .alias("q"),
    )


def kmeans_assignments(
    emb: DataFrame,
    *,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Final Lloyd assignment ``[vec_id, cluster, dist2]``.

    Clusters are labeled by their *seed* vec_id (the k smallest ids
    seed the centroids), so labels are stable as centroids move.
    ``dist2`` is the exact integer squared distance to the winning
    centroid at the last assignment.  Ties go to the smallest cluster
    label; empty clusters keep their previous centroid.
    """
    pts = quantize_points(
        emb, id_col=id_col, vec_col=vec_col, scale=scale
    ).persist()
    seed_ids = [
        r["vec_id"]
        for r in pts.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(int(k))
        .collect()
    ]
    centroids = (
        pts.where(F.col("vec_id").isin(seed_ids))
        .select(F.col("vec_id").alias("cl"), "d", F.col("q").alias("c"))
        .persist()
    )

    assign = None
    for it in range(int(iterations)):
        dists = (
            pts.join(F.broadcast(centroids), on="d")
            .groupBy("vec_id", "cl")
            .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias("dist2"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cl"))
        assign = (
            dists.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", F.col("cl").alias("cluster"), "dist2")
            .persist()
        )
        if it == int(iterations) - 1:
            break  # the last update would never be read
        new_c = (
            assign.join(pts, on="vec_id")
            .groupBy(F.col("cluster").alias("cl"), "d")
            .agg(F.expr("sum(q) DIV count(1)").alias("_nc"))
        )
        centroids = (
            centroids.join(new_c, on=["cl", "d"], how="left")
            .select("cl", "d", F.coalesce("_nc", F.col("c")).alias("c"))
            .persist()
        )
        # materialize the small centroid table so the next iteration's
        # broadcast doesn't re-run the whole lineage
        centroids = centroids.sparkSession.createDataFrame(
            centroids.collect(), schema=centroids.schema
        )
    return assign
