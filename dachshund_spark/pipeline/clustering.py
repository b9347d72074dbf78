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

E8 = 100_000_000


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


def pq_codebook_and_codes(
    emb: DataFrame,
    *,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization: per-subspace integer-exact Lloyd.

    Splits each D-dim vector into ``m`` contiguous subvectors and runs
    the same quantized Lloyd as :func:`kmeans_assignments` in EVERY
    subspace at once (subspace id ``s`` is just an extra grouping key —
    one distributed job trains all m codebooks).  Returns
    ``(codebook [s, cl, d, c], codes [vec_id, s, code, dist2])``.

    This is the ANN compression scale path (Jégou et al. 2011): at
    100 TB the full float vectors never re-shuffle after encoding —
    queries scan m-byte codes and sum k·m table lookups (see
    :func:`pq_adc_topk`).  The codebook is k·D rows regardless of
    corpus size, so it broadcasts.
    """
    dim = emb.select(F.max(F.size(F.col(vec_col)))).first()[0]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    pts = (
        quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale)
        .withColumn("s", F.expr(f"(d - 1) DIV {sub}"))
        .persist()
    )
    seed_ids = [
        r["vec_id"]
        for r in pts.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(int(k))
        .collect()
    ]
    # seed cl labels 0..k-1 in vec_id order (same seeds in every subspace)
    centroids = (
        pts.where(F.col("vec_id").isin(seed_ids))
        .withColumn(
            "cl",
            F.array_position(
                F.array(*[F.lit(int(v)) for v in seed_ids]), F.col("vec_id")
            )
            - 1,
        )
        .select("s", "cl", "d", F.col("q").alias("c"))
        .persist()
    )

    seed_centroids = centroids
    codes = None
    prev_codes = None
    for it in range(int(iterations)):
        dists = (
            pts.join(F.broadcast(centroids), on=["s", "d"])
            .groupBy("vec_id", "s", "cl")
            .agg(
                F.sum(
                    (F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))
                ).alias("dist2")
            )
        )
        w = Window.partitionBy("vec_id", "s").orderBy(F.asc("dist2"), F.asc("cl"))
        codes = (
            dists.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", "s", F.col("cl").alias("code"), "dist2")
            .persist()
        )
        if it == int(iterations) - 1:
            # the final codes are built from pts + the (local) centroid
            # table only — the previous iteration's cache is dead weight
            if prev_codes is not None:
                prev_codes.unpersist()
            break
        new_c = (
            codes.join(pts, on=["vec_id", "s"])
            .groupBy("s", F.col("code").alias("cl"), "d")
            .agg(F.expr("sum(q) DIV count(1)").alias("_nc"))
        )
        centroids = (
            centroids.join(new_c, on=["s", "cl", "d"], how="left")
            .select("s", "cl", "d", F.coalesce("_nc", F.col("c")).alias("c"))
        )
        centroids = centroids.sparkSession.createDataFrame(
            centroids.collect(), schema=centroids.schema
        )
        # the collect above materialized this iteration's codes cache;
        # the previous iteration's blocks (and, after the first rebuild,
        # the persisted seed centroids) are no longer referenced
        if prev_codes is not None:
            prev_codes.unpersist()
        prev_codes = codes
        if it == 0:
            seed_centroids.unpersist()
    return centroids, codes


def pq_adc_topk(
    emb: DataFrame,
    *,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    n_queries: int = 4,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    The first ``n_queries`` vec_ids are the query set.  Per query a
    (s, code) → partial-dist2 lookup table is built against the TRAINED
    codebook (n_queries·m·k rows — broadcast); each corpus vector's ADC
    distance is the sum of its m table lookups.  Exact integers
    throughout; ties break to the smaller vec_id.  The query vector
    itself is excluded.  Returns ``[query_id, rank, vec_id, adc]``.
    """
    codebook, codes = pq_codebook_and_codes(
        emb,
        m=m,
        k=k,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
    )
    dim = emb.select(F.max(F.size(F.col(vec_col)))).first()[0]
    sub = dim // m
    qids = [
        r["vec_id"]
        for r in emb.select(F.col(id_col).alias("vec_id"))
        .distinct()
        .orderBy("vec_id")
        .limit(int(n_queries))
        .collect()
    ]
    qpts = (
        quantize_points(
            emb.where(F.col(id_col).isin(qids)),
            id_col=id_col,
            vec_col=vec_col,
            scale=scale,
        )
        .withColumn("s", F.expr(f"(d - 1) DIV {sub}"))
        .withColumnRenamed("vec_id", "query_id")
    )
    lut = (
        qpts.join(F.broadcast(codebook), on=["s", "d"])
        .groupBy("query_id", "s", "cl")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))).alias(
                "pd2"
            )
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            on=[codes["s"] == lut["s"], codes["code"] == lut["cl"]],
        )
        .select("query_id", "vec_id", "pd2")
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2").alias("adc"))
        .where(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(topk))
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "adc"
        )
    )


def grid_dbscan(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps_e6: int = 20000,
    min_pts: int = 4,
    shift_e6: int = 2_000_000,
    cc_rounds: int = 24,
) -> DataFrame:
    """Grid-blocked DBSCAN over the first two embedding dimensions:
    ``[vec_id, role, cluster]`` with role ∈ {core, border, noise} and
    cluster = min member vec_id of the core component (-1 for noise).

    Coordinates quantize to e6 integers (then shift positive so
    truncating division equals floor in both engines); candidate pairs
    come from a 3×3 neighbor-cell equi-join on the eps-sized grid —
    the standard distributed DBSCAN blocking (cell = shuffle key,
    never an all-pairs join; a cell's population is bounded by the
    density the eps-radius admits). Core test |N_eps(p)| ≥ min_pts
    INCLUDES p itself. Cluster closure is the engine hash-min CC run
    a fixed ``cc_rounds`` supersteps so the DuckDB oracle replays the
    identical round count; border points take the MINIMUM neighboring
    core's cluster (the deterministic tie-break classic DBSCAN leaves
    scan-order dependent). Distances compare squared e6 integers —
    exact BIGINT math end-to-end.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    def _coord(i: int):
        return (
            F.round(
                F.element_at(F.col(vec_col), i).cast("double") * F.lit(1000000.0), 0
            ).cast("long")
            + F.lit(int(shift_e6))
        )

    eps = int(eps_e6)
    pts = emb.select(
        F.col(id_col).alias("pid"), _coord(1).alias("x"), _coord(2).alias("y")
    ).withColumn("cx", F.expr(f"x DIV {eps}")).withColumn(
        "cy", F.expr(f"y DIV {eps}")
    )
    pts = pts.localCheckpoint(eager=True)
    offs = emb.sparkSession.createDataFrame(
        [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)], "ox long, oy long"
    )
    probe = pts.crossJoin(F.broadcast(offs)).select(
        F.col("pid").alias("a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("ox")).alias("kx"),
        (F.col("cy") + F.col("oy")).alias("ky"),
    )
    build = pts.select(
        F.col("pid").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("kx"),
        F.col("cy").alias("ky"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    pairs = (
        probe.join(build, on=["kx", "ky"])
        .where(dx * dx + dy * dy <= F.lit(eps * eps))
        .select("a", "b")
    )
    pairs = pairs.localCheckpoint(eager=True)
    deg = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("n_eps"))
    cores = deg.where(F.col("n_eps") >= int(min_pts)).select(
        F.col("a").alias("pid")
    )
    cores = cores.localCheckpoint(eager=True)
    core_edges = (
        pairs.where(F.col("a") != F.col("b"))
        .join(cores.select(F.col("pid").alias("a")), on="a")
        .join(cores.select(F.col("pid").alias("b")), on="b")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp = connected_components(
        LinkGraph(core_edges), renumber=False, max_iterations=int(cc_rounds)
    ).select(F.col("node_id").alias("pid"), "component")
    core_lbl = cores.join(comp, on="pid", how="left").select(
        "pid", F.coalesce("component", "pid").alias("cluster")
    )
    border = (
        pairs.where(F.col("a") != F.col("b"))
        .join(cores.select(F.col("pid").alias("a")), on="a", how="left_anti")
        .join(
            core_lbl.select(F.col("pid").alias("b"), "cluster"), on="b"
        )
        .groupBy(F.col("a").alias("pid"))
        .agg(F.min("cluster").alias("cluster"))
    )
    out_core = core_lbl.select("pid", F.lit("core").alias("role"), "cluster")
    out_border = border.select("pid", F.lit("border").alias("role"), "cluster")
    rest = (
        pts.select("pid")
        .join(out_core.select("pid"), on="pid", how="left_anti")
        .join(out_border.select("pid"), on="pid", how="left_anti")
        .select("pid", F.lit("noise").alias("role"), F.lit(-1).cast("long").alias("cluster"))
    )
    return (
        out_core.unionByName(out_border)
        .unionByName(rest)
        .select(F.col("pid").alias("vec_id"), "role", F.col("cluster").cast("long").alias("cluster"))
    )


def kmeanspp_init(
    emb: DataFrame,
    *,
    l: int = 4,
    rounds: int = 3,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000,
) -> DataFrame:
    """k-means|| oversampling initialization (Bahmani et al., VLDB
    2012): ``[vec_id, round_added, weight]`` — the candidate center
    set Lloyd starts from, with the standard nearest-candidate weights.

    Sequential k-means++ needs k dependent passes; k-means|| replaces
    them with ``rounds`` INDEPENDENT oversampling sweeps: each point
    joins the candidate set with probability ~ l·d²(x)/φ where d²(x)
    is its distance to the current candidates and φ = Σd² — so each
    round is one broadcast join + one aggregation over the corpus, and
    the candidate set (≤ 1 + l·rounds before dedup) stays driver-sized
    at any corpus scale.  That per-round independence is the whole
    point at 100 TB.

    Determinism contract (no RNG): the round-r coin for x is a
    20-bit md5-derived integer h_r(x) of ``"kpp{seed}#r{r}#" +
    vec_id`` (the round tag matters: a round-constant coin would
    freeze the sampled set after round 1); x is sampled iff
    ``h_r < (l · d²(x) · 2^20) DIV φ`` — exact BIGINT
    arithmetic (one truncating division, identical in Spark and
    DuckDB), overflow-safe while l·d²·2^20 < 2^63 (with the default
    1e-3 grid that allows ~10^6 dims).  The first candidate is the
    smallest vec_id; assignment ties go to the smallest candidate id;
    unsampled rounds are no-ops.  Candidates never chosen nearest by
    any point keep weight 0.
    """
    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale).persist()
    first = pts.agg(F.min("vec_id")).first()[0]
    if first is None:
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, round_added long, weight long"
        )
    centers: list[tuple[int, int]] = [(int(first), 0)]

    def _dist_to(ids: list[int]) -> DataFrame:
        cpts = pts.where(F.col("vec_id").isin(ids)).select(
            F.col("vec_id").alias("cl"), "d", F.col("q").alias("c")
        )
        return (
            pts.join(F.broadcast(cpts), on="d")
            .groupBy("vec_id", "cl")
            .agg(
                F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                .alias("dist2")
            )
            .groupBy("vec_id")
            .agg(F.min("dist2").cast("long").alias("d2"))
        )

    def _coin(r: int) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"kpp{seed}#r{r}#"), F.col("vec_id").cast("string")
                    )
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")

    d2 = _dist_to([first]).localCheckpoint(eager=True)
    for r in range(1, int(rounds) + 1):
        phi = d2.agg(F.sum("d2")).first()[0]
        if not phi:
            break
        new_ids = sorted(
            row["vec_id"]
            for row in d2.where(
                (F.col("d2") > 0)
                & (
                    _coin(r)
                    < F.expr(
                        f"CAST({int(l)} * d2 * 1048576 DIV CAST({int(phi)} AS LONG) AS LONG)"
                    )
                )
            )
            .select("vec_id")
            .collect()
        )
        if not new_ids:
            continue
        centers.extend((int(i), r) for i in new_ids)
        nd = _dist_to(new_ids).withColumnRenamed("d2", "_nd")
        d2 = (
            d2.join(nd, on="vec_id", how="left")
            .select("vec_id", F.least("d2", F.coalesce("_nd", "d2")).alias("d2"))
            .localCheckpoint(eager=True)
        )
    cand_ids = [c for c, _ in centers]
    cpts = pts.where(F.col("vec_id").isin(cand_ids)).select(
        F.col("vec_id").alias("cl"), "d", F.col("q").alias("c")
    )
    nearest = (
        pts.join(F.broadcast(cpts), on="d")
        .groupBy("vec_id", "cl")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
            .alias("dist2")
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist2", "cl")).alias("s"))
        .select(F.col("s.cl").alias("cl"))
        .groupBy("cl")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    cdf = emb.sparkSession.createDataFrame(
        centers, "vec_id long, round_added long"
    )
    out = (
        cdf.join(nearest, cdf.vec_id == nearest.cl, "left")
        .select(
            "vec_id",
            "round_added",
            F.coalesce("weight", F.lit(0).cast("long")).alias("weight"),
        )
        .orderBy("vec_id")
    )
    pts.unpersist()
    return out


def nearest_centroid_eval(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier confusion matrix:
    ``[label, pred, n]`` — resubstitution eval of how separable the
    labeled embedding space is (the cheap linear-probe stand-in every
    embedding pipeline runs before training anything).

    Centroids are per-label truncated-mean grid points on the shared
    1e-6 integer lattice (the kmeans quantization — ``SUM DIV COUNT``
    is engine-exact); assignment is the exact integer argmin of
    squared distance, ties to the smallest label.  One labels-sized
    centroid broadcast; the distance aggregation is a (vec, label)
    partial sum — no pairwise vec×vec anything.
    """
    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    labels = emb.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).cast("long").alias("label")
    )
    cents = (
        pts.join(labels, on="vec_id")
        .groupBy("label", "d")
        .agg(F.expr("sum(q) DIV count(1)").alias("c"))
        .select(F.col("label").alias("cand"), "d", "c")
    )
    dists = (
        pts.join(F.broadcast(cents), on="d")
        .groupBy("vec_id", "cand")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
            .cast("long")
            .alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cand"))
    pred = (
        dists.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", F.col("cand").alias("pred"))
    )
    return (
        pred.join(labels, on="vec_id")
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def silhouette_simplified(
    emb: DataFrame,
    *,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Simplified (centroid-based) silhouette of the integer-exact
    Lloyd clustering: ``[vec_id, cluster, a2, b2, sil]`` with
    ``a2`` = squared distance to the own centroid, ``b2`` = min
    squared distance to any other centroid, and
    ``sil = (b2 − a2) / max(a2, b2)`` (Rousseeuw's silhouette with
    the O(n·k) centroid surrogate instead of the O(n²) pairwise mean
    — the only version that exists at corpus scale).

    Replays the exact :func:`kmeans_assignments` iteration (same
    seeds, same truncated-mean centroids), so ``cluster`` matches the
    ``kmeans_4_3`` contract bit-for-bit; a2/b2 are exact BIGINTs off
    the shared lattice and ``sil`` is one engine-stable division.
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
    dists = None
    for it in range(int(iterations)):
        dists = (
            pts.join(F.broadcast(centroids), on="d")
            .groupBy("vec_id", "cl")
            .agg(
                F.sum(
                    (F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))
                ).alias("dist2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cl"))
        assign = (
            dists.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", F.col("cl").alias("cluster"), "dist2")
            .persist()
        )
        if it == int(iterations) - 1:
            break
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
        centroids = centroids.sparkSession.createDataFrame(
            centroids.collect(), schema=centroids.schema
        )
    dists = dists.persist()
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cl"))
    own = (
        dists.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", F.col("cl").alias("cluster"), F.col("dist2").alias("a2"))
    )
    other = (
        dists.join(own.select("vec_id", "cluster"), on="vec_id")
        .where(F.col("cl") != F.col("cluster"))
        .groupBy("vec_id")
        .agg(F.min("dist2").alias("b2"))
    )
    return own.join(other, on="vec_id").select(
        "vec_id",
        "cluster",
        F.col("a2").cast("long").alias("a2"),
        F.col("b2").cast("long").alias("b2"),
        F.when(F.greatest(F.col("a2"), F.col("b2")) == 0, F.lit(0.0))
        .otherwise(
            (F.col("b2") - F.col("a2")).cast("double")
            / F.greatest(F.col("a2"), F.col("b2")).cast("double")
        )
        .alias("sil"),
    )


def dim_mutual_information(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-dimension label relevance: ``[d, mi_num_e8, mi]`` — the
    mutual information I(label; sign(v_d)) between the class label and
    each coordinate's sign, the cheapest univariate feature-relevance
    screen an embedding pipeline runs (which dimensions carry label
    signal at all?).

    I = Σ_cells p(l,s)·ln(p(l,s)/(p(l)p(s))); each cell's log ratio
    ``ln(c_ls·N / (c_l·c_s))`` is an ln of exact integers, pre-rounded
    to e8 and weighted by the integer cell count, so ``mi_num_e8`` is
    an exact sum (the PMI machinery applied per dimension) and
    ``mi = mi_num_e8 / (N·10⁸)`` one division.  Signs are taken on
    the shared 1e-6 lattice (``q ≥ 0``) for cross-engine determinism.
    Cell/marginal tables are (dims × labels × 2)-bounded.
    """
    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    lb = emb.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).cast("long").alias("label")
    )
    cells = (
        pts.join(lb, on="vec_id")
        .select("d", "label", (F.col("q") >= 0).cast("int").alias("s"))
        .groupBy("d", "label", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cl = lb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("cl"))
    cs = cells.groupBy("d", "s").agg(F.sum("c").cast("long").alias("cs"))
    nn = lb.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    term = (
        F.round(
            F.log(
                (F.col("c") * F.col("nn")).cast("double")
                / (F.col("cl") * F.col("cs")).cast("double")
            )
            * E8,
            0,
        ).cast("long")
        * F.col("c")
    )
    out = (
        cells.join(F.broadcast(cl), on="label")
        .join(F.broadcast(cs), on=["d", "s"])
        .crossJoin(F.broadcast(nn))
        .groupBy("d")
        .agg(
            F.sum(term).cast("long").alias("mi_num_e8"),
            F.max("nn").alias("_n"),
        )
    )
    return out.select(
        F.col("d").cast("long").alias("d"),
        "mi_num_e8",
        (
            F.col("mi_num_e8").cast("double")
            / (F.col("_n").cast("double") * F.lit(float(E8)))
        ).alias("mi"),
    )


def k_center_greedy(
    emb: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Gonzalez farthest-first traversal: ``[k_order, center_id,
    sel_d2]`` — the greedy 2-approximation to the k-center problem and
    the standard coreset/data-pruning selector (pick the point
    farthest from everything already kept, k times).

    Selection order: center 1 is the smallest id; center i is the
    point maximizing its squared distance to the nearest chosen
    center (exact BIGINT on the shared 1e-6 lattice), ties to the
    smallest id.  ``sel_d2`` is that covering radius² at selection
    time (0 for the first pick) — the classic diminishing-returns
    curve a pruning pipeline reads the knee off.

    Each of the k steps is one broadcast distance update (the new
    center's coordinates — D values — ship as literals) plus a
    TakeOrdered argmax: k bounded scalar handoffs, the double-sweep
    precedent, nothing node-scale ever funnels to one task.
    """
    spark = emb.sparkSession
    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale).persist()
    first = pts.select(F.min("vec_id").alias("v")).first()["v"]
    if first is None:
        raise ValueError("empty embedding table")

    def dist2_to(cid):
        # the new center's D coordinates ship as a broadcast literal
        # frame — the only data that ever leaves the executors
        cdf = spark.createDataFrame(
            [(r["d"], r["q"]) for r in pts.where(F.col("vec_id") == cid).collect()],
            "d int, c long",
        )
        return (
            pts.join(F.broadcast(cdf), on="d")
            .groupBy("vec_id")
            .agg(
                F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                .cast("long")
                .alias("nd2")
            )
        )

    chosen = [(1, first, 0)]
    mind = (
        dist2_to(first)
        .select("vec_id", F.col("nd2").alias("d2"))
        .localCheckpoint(eager=True)
    )
    for i in range(2, int(k) + 1):
        far = mind.orderBy(F.desc("d2"), F.asc("vec_id")).limit(1).first()
        chosen.append((i, far["vec_id"], far["d2"]))
        if i == int(k):
            break
        mind = (
            mind.join(dist2_to(far["vec_id"]), on="vec_id")
            .select("vec_id", F.least("d2", "nd2").alias("d2"))
            .localCheckpoint(eager=True)
        )
    pts.unpersist()
    return spark.createDataFrame(
        chosen, "k_order long, center_id long, sel_d2 long"
    )
