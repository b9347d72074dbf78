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


def _plane_bit(p: int, seed: int) -> Column:
    """1 when sign(v · n_p) > 0 else 0, for pseudo-random ±1 plane
    normals derived from md5(seed, p, dim-index).  The projection is
    rounded to 6 decimals before the sign test so the bit is
    reproducible across engines (DuckDB oracles agree with Spark's
    left-fold sum at 6 decimals; raw float sums are order-sensitive)."""
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
    return F.when(F.round(proj, 6) > 0, F.lit(1).cast("long")).otherwise(
        F.lit(0).cast("long")
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
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        sig = sig + F.shiftleft(_plane_bit(p, seed), p)
    return v.select("vec_id", sig.alias("sig"))


def hyperplane_band_signatures(
    vectors: DataFrame,
    num_planes: int = 8,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Banded hyperplane signatures: [vec_id, band, band_sig].

    The plane bits are split into ``bands`` contiguous bands of
    ``num_planes // bands`` planes each; two vectors are join
    candidates when ANY band matches — the recall/cost dial the
    full-signature bucket lacks (one flipped bit there kills the
    candidate; here it only removes one of ``bands`` chances).
    """
    if num_planes % bands:
        raise ValueError("num_planes must be divisible by bands")
    rpb = num_planes // bands
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        dim_idx.alias("idx"),
    )
    band_rows = []
    for b in range(bands):
        bsig = F.lit(0).cast("long")
        for off in range(rpb):
            bsig = bsig + F.shiftleft(_plane_bit(b * rpb + off, seed), off)
        band_rows.append(F.struct(F.lit(b).alias("band"), bsig.alias("band_sig")))
    return v.select(
        "vec_id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 12,
    bands: int | None = None,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to LSH-bucket collisions,
    then exact cosine re-rank.

    With ``bands=None`` a candidate must match the FULL signature — a
    single flipped bit hides a true neighbor, so recall collapses as
    num_planes grows.  ``multiprobe=True`` (full-signature mode only)
    additionally probes every flip-1-bit neighbor bucket on the query
    side, tolerating one wrong bit at num_planes× candidate cost.
    With ``bands=B`` the signature is split into B bands and a
    candidate needs only ONE matching band (candidates are unioned
    across bands then deduped) — the standard recall/cost dial: more
    bands → higher recall and more candidates.  At 100 TB the bucket
    joins replace the all-pairs crossJoin either way."""
    if bands is None:
        sig_v = hyperplane_signatures(vectors, num_planes, id_col, vec_col, seed)
        sig_q = hyperplane_signatures(queries, num_planes, id_col, vec_col, seed)
        if multiprobe:
            # probe the exact bucket plus every flip-1-bit neighbor
            # bucket: queries explode to num_planes+1 signatures, the
            # index side stays single-bucket — recall rises without
            # re-indexing or touching the stored table
            probes = F.array(
                F.col("sig"),
                *[
                    F.expr(f"sig ^ CAST({1 << p} AS BIGINT)")
                    for p in range(num_planes)
                ],
            )
            sig_q = sig_q.select(
                "vec_id", F.explode(probes).alias("sig")
            )
        join_keys = ["sig"]
    else:
        sig_v = hyperplane_band_signatures(
            vectors, num_planes, bands, id_col, vec_col, seed
        )
        sig_q = hyperplane_band_signatures(
            queries, num_planes, bands, id_col, vec_col, seed
        )
        join_keys = ["band", "band_sig"]
    cands = (
        sig_q.withColumnRenamed("vec_id", "query_id")
        .join(sig_v.withColumnRenamed("vec_id", "neighbor_id"), join_keys)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    sims = cands.join(q, "query_id").join(v, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rank: int = 1,
    train_iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: (centroids, assignments).

    Initial centroids are ``n_cells`` data vectors picked
    deterministically (smallest md5(vec_id) — a seeded sample with no
    RNG state), then refined with ``train_iters`` Lloyd iterations
    (assign → element-wise cell mean), all as DataFrame aggregations.
    Every vector joins against the broadcast centroid set and keeps its
    ``n_rank`` nearest cells (n_rank=1 for indexing; queries pass
    n_rank=nprobe for multi-probe).  Returns
    (centroids[cell, cv], assign[id, cell, rank]).
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    centroids = (
        v.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(n_cells)
        .select(
            F.row_number()
            .over(Window.orderBy("_h"))
            .alias("cell"),
            F.col("v").alias("cv"),
        )
    )
    for _ in range(train_iters):
        assign1 = _ivf_cells(v, centroids, 1)
        pos = v.join(assign1, "vec_id").select(
            "cell", F.posexplode("v").alias("pos", "val")
        )
        means = pos.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
        centroids = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select(
                "cell", F.transform("s", lambda x: x["m"]).alias("cv")
            )
            # k small: keep the refined centroid table materialized so
            # the next round's crossJoin doesn't replay the whole chain
            .localCheckpoint(eager=True)
        )
    return centroids, _ivf_cells(v, centroids, n_rank)


def _ivf_cells(v: DataFrame, centroids: DataFrame, n_rank: int) -> DataFrame:
    """Nearest ``n_rank`` cells per vector: [vec_id, cell, rank]."""
    sims = (
        v.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "cell",
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("c_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_rank)
        .select("vec_id", "cell", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: [query_id, neighbor_id, cos_sim, rank].

    The inverted-file alternative to hyperplane LSH: vectors are
    clustered into ``n_cells`` coarse cells (one cell each); a query
    probes its ``nprobe`` nearest cells and re-ranks exactly within
    them.  recall/cost dial = nprobe/n_cells.  At scale the cell
    assignment is a bucketed join key — candidates never go all-pairs.
    """
    centroids, v_assign = ivf_assign(vectors, n_cells, id_col, vec_col, n_rank=1)
    # queries quantize against the SAME centroids (multi-probe)
    qv = queries.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q_cells = _ivf_cells(qv, centroids, nprobe).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cands = (
        q_cells.join(
            v_assign.select(F.col("vec_id").alias("neighbor_id"), "cell"), "cell"
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    sims = cands.join(q, "query_id").join(v, "neighbor_id").select(
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


def similarity_pairs(
    vectors: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All canonical pairs (a < b) with cosine ≥ ``min_sim``:
    ``[a, b, cos_sim]``.

    Exact all-pairs path — quadratic by construction, for query sets /
    golden baselines.  The corpus-scale route is
    :func:`near_dup_candidates` (banded LSH buckets) feeding the same
    threshold verify, never this cross join.
    """
    a = vectors.select(
        F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("_va")
    )
    b = vectors.select(
        F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("_vb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= F.lit(float(min_sim)))
    )


def single_linkage_clusters(
    vectors: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Single-linkage clustering at a similarity threshold:
    ``[<id_col>, cluster]`` where cluster is the minimum member id.

    Single linkage at threshold t IS the connected components of the
    ≥t similarity graph — equivalently, cut the Borůvka MSF over
    distance weights at 1−t (the dendrogram view; see
    :func:`dachshund_spark.algorithms.msf.boruvka_msf`).  Vectors with
    no qualifying pair are singleton clusters of themselves.

    ``pairs`` overrides the edge source (e.g. LSH candidates verified
    by exact cosine — the scale path); default is the exact all-pairs
    :func:`similarity_pairs`.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    if pairs is None:
        pairs = similarity_pairs(vectors, min_sim, id_col, vec_col)
    g = LinkGraph(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    cc = connected_components(g, renumber=False)
    ids = vectors.select(F.col(id_col).alias("node_id"))
    return (
        ids.join(cc, on="node_id", how="left")
        .select(
            F.col("node_id").alias(id_col),
            F.coalesce("component", "node_id").alias("cluster"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023): assign every vector to its nearest
    centroid by cosine, then mark within-cluster near-duplicates.

    Returns ``[<id_col>, cluster_id, dup_of, keep]`` — ``dup_of`` is
    the smallest same-cluster vector id whose cosine similarity is
    ≥ ``tau`` (NULL when none), ``keep`` = ``dup_of IS NULL``.  The
    keep rule is deterministic (smallest id in each ε-neighborhood
    survives), so the output replays exactly in any engine: cosines
    are rounded to ``round_digits`` before both the argmax-centroid
    assignment and the τ test.

    Scale shape: the centroid table is broadcast (k centroids, one
    pass over the vectors); the dedup join is CLUSTER-LOCAL pairwise —
    that bounded quadratic is the published SemDedup design (clusters
    are capped in size by k).  For Lloyd-trained centroids use
    :func:`ivf_train`; note trained centroids involve float averaging,
    so only fixed/seeded centroid frames are oracle-replayable.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    c = centroids.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    sims = v.crossJoin(F.broadcast(c)).select(
        "vid",
        "cid",
        F.round(cosine(F.col("v"), F.col("cv")), round_digits).alias("sim"),
    )
    assign = sims.groupBy("vid").agg(
        F.expr("max_by(cid, struct(sim, ~cid))").alias("cluster_id")
    )
    member = assign.join(v, on="vid")
    a = member.select(
        F.col("cluster_id"), F.col("vid").alias("small"), F.col("v").alias("va")
    )
    b = member.select(
        F.col("cluster_id"), F.col("vid").alias("big"), F.col("v").alias("vb")
    )
    dup = (
        a.join(b, on="cluster_id")
        .where(F.col("small") < F.col("big"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), round_digits) >= tau)
        .groupBy(F.col("big").alias("vid"))
        .agg(F.min("small").alias("dup_of"))
    )
    return (
        assign.join(dup, on="vid", how="left")
        .select(
            F.col("vid").alias(id_col),
            "cluster_id",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def triplet_mining(
    vectors: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Hard-triplet mining for embedding training:
    ``[anchor_id, pos_id, pos_sim, neg_id, neg_sim, margin]`` — per
    anchor, the hardest positive (LEAST similar same-label vector) and
    hardest negative (MOST similar different-label vector), the
    batch-hard strategy of Hermans et al. 2017.

    Same plan shape as :func:`brute_force_topk`: anchors broadcast
    against the vector table, two rank-1 windows per anchor partition.
    At corpus scale the negative side would ride the LSH-bucketed
    candidates instead of the cross join; the windows are per-anchor
    (bounded) either way.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("a_label"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    sims = (
        F.broadcast(a)
        .crossJoin(v)
        .where(F.col("anchor_id") != F.col("neighbor_id"))
        .select(
            "anchor_id",
            "a_label",
            "neighbor_id",
            "n_label",
            F.round(cosine(F.col("qv"), F.col("nv")), round_digits).alias(
                "cos_sim"
            ),
        )
    )
    wp = Window.partitionBy("anchor_id").orderBy(
        F.asc("cos_sim"), F.asc("neighbor_id")
    )
    pos = (
        sims.where(F.col("a_label") == F.col("n_label"))
        .withColumn("_r", F.row_number().over(wp))
        .where(F.col("_r") == 1)
        .select(
            "anchor_id",
            F.col("neighbor_id").alias("pos_id"),
            F.col("cos_sim").alias("pos_sim"),
        )
    )
    wn = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    neg = (
        sims.where(F.col("a_label") != F.col("n_label"))
        .withColumn("_r", F.row_number().over(wn))
        .where(F.col("_r") == 1)
        .select(
            "anchor_id",
            F.col("neighbor_id").alias("neg_id"),
            F.col("cos_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, on="anchor_id").select(
        "anchor_id",
        "pos_id",
        "pos_sim",
        "neg_id",
        "neg_sim",
        (F.col("pos_sim") - F.col("neg_sim")).alias("margin"),
    )


def mmr_rerank(
    vectors: DataFrame,
    query_id: int = 0,
    *,
    n_candidates: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) with λ = 0.5: greedily pick k results maximizing
    ``0.5·sim(q,d) − 0.5·max_{s∈selected} sim(d,s)`` — relevance traded
    against redundancy, the standard diversity re-rank after ANN
    retrieval.

    Engine-exact: cosine similarities are rounded to 6 digits first
    (the brute_force_topk convention), and λ = 0.5 makes every score an
    exact dyadic halving of rounded values — zero float tolerance.
    Rank 1 is pure relevance (empty selected set): mmr_score = sim_q.

    Scale shape: candidate generation is the distributed broadcast-query
    scan (or any ANN variant upstream); re-ranking operates on the
    bounded ``n_candidates`` list — the k-round greedy loop collects one
    argmax row per round (bounded driver handoff, the double-sweep
    pattern), never touching the full corpus again.

    Returns ``[rank, vec_id, sim_q, mmr_score]``.
    """
    spark = vectors.sparkSession
    q = vectors.where(F.col(id_col) == int(query_id))
    cand = (
        brute_force_topk(vectors, q, k=n_candidates, id_col=id_col, vec_col=vec_col)
        .select(F.col("neighbor_id").alias("cid"), F.col("cos_sim").alias("sim_q"))
        .persist()
    )
    cv = (
        vectors.join(cand.select("cid"), on=F.col(id_col) == F.col("cid"))
        .select(F.col("cid").alias("i"), F.col(vec_col).cast("array<double>").alias("v"))
        .persist()
    )
    a = cv.select(F.col("i"), F.col("v").alias("va"))
    b = cv.select(F.col("i").alias("j"), F.col("v").alias("vb"))
    cs = (
        a.crossJoin(b)
        .where(F.col("i") != F.col("j"))
        .select("i", "j", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s"))
        .persist()
    )
    first = cand.orderBy(F.desc("sim_q"), F.asc("cid")).limit(1).collect()[0]
    sel = [(int(first["cid"]), float(first["sim_q"]), float(first["sim_q"]))]
    for _ in range(2, int(k) + 1):
        ids = [s[0] for s in sel]
        scored = (
            cs.where(F.col("j").isin(ids))
            .groupBy("i")
            .agg(F.max("s").alias("msim"))
            .join(cand, on=F.col("i") == F.col("cid"))
            .where(~F.col("cid").isin(ids))
            .select(
                "cid",
                "sim_q",
                (
                    F.lit(0.5) * F.col("sim_q") - F.lit(0.5) * F.col("msim")
                ).alias("m"),
            )
        )
        top = scored.orderBy(F.desc("m"), F.asc("cid")).limit(1).collect()[0]
        sel.append((int(top["cid"]), float(top["sim_q"]), float(top["m"])))
    for df in (cand, cv, cs):
        df.unpersist()
    return spark.createDataFrame(
        [(r + 1, *s) for r, s in enumerate(sel)],
        "rank int, vec_id long, sim_q double, mmr_score double",
    )


def truncation_agreement(
    emb: DataFrame,
    *,
    half_dims: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Matryoshka truncation eval: per vector, the exact top-1
    neighbor under the FULL dot product vs under the first
    ``half_dims`` dims — ``[vec_id, nn_full, nn_half, agree]``.

    The question MRL (Kusupati et al. 2022) makes operational: how
    much retrieval do you lose by storing/searching half the vector?
    ``agree`` is the per-query answer; AVG(agree) is the headline
    truncation-recall@1.  Dot products are exact BIGINTs on the 1e-6
    integer grid (64 dims · (1e6)² < 2^63), so both argmaxes are
    engine-stable; ties break toward the smaller neighbor id.

    This is the brute-force EVAL harness — quadratic by design, run it
    on a sampled slice (the standard MRL protocol); the production ANN
    paths are the LSH/IVF/PQ operators.
    """
    from dachshund_spark.pipeline.clustering import quantize_points

    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    a = pts.select(F.col("vec_id").alias("qa"), "d", F.col("q").alias("_qa"))
    b = pts.select(F.col("vec_id").alias("nb"), "d", F.col("q").alias("_qb"))
    dots = (
        a.join(b, on="d")
        .where(F.col("qa") != F.col("nb"))
        .groupBy("qa", "nb")
        .agg(
            F.sum(F.col("_qa") * F.col("_qb")).alias("full"),
            F.sum(
                F.when(
                    F.col("d") <= int(half_dims), F.col("_qa") * F.col("_qb")
                ).otherwise(F.lit(0))
            ).alias("half"),
        )
    )
    best = dots.groupBy(F.col("qa").alias("vec_id")).agg(
        F.min(F.struct((-F.col("full")).alias("s"), F.col("nb").alias("n")))
        .alias("_bf"),
        F.min(F.struct((-F.col("half")).alias("s"), F.col("nb").alias("n")))
        .alias("_bh"),
    )
    return best.select(
        "vec_id",
        F.col("_bf.n").alias("nn_full"),
        F.col("_bh.n").alias("nn_half"),
        (F.col("_bf.n") == F.col("_bh.n")).cast("long").alias("agree"),
    ).orderBy("vec_id")


def _lattice_pairs(emb: DataFrame, vec_col: str, id_col: str):
    """All ordered pairs (a, b, dist2) on the shared 1e-6 integer
    lattice — the exact-kNN kernel for the bounded-subset evals."""
    from dachshund_spark.pipeline.clustering import quantize_points

    pts = quantize_points(emb, id_col=id_col, vec_col=vec_col)
    return (
        pts.alias("x")
        .join(
            pts.alias("y"),
            on=[
                F.col("x.d") == F.col("y.d"),
                F.col("x.vec_id") != F.col("y.vec_id"),
            ],
        )
        .groupBy(
            F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b")
        )
        .agg(
            F.sum(
                (F.col("x.q") - F.col("y.q")) * (F.col("x.q") - F.col("y.q"))
            )
            .cast("long")
            .alias("dist2")
        )
    )


def mutual_nearest_neighbors(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal best matches: ``[a, b, dist2]`` (a < b) where each
    is the other's exact nearest neighbor on the integer lattice
    (ties to the smallest id).

    The mutual-NN criterion is the standard high-precision pairing
    primitive (bitext alignment, duplicate mating, cleanlab-style
    pair mining): one-directional NN is noisy near cluster borders,
    reciprocity filters exactly those.  Intended for bounded eval
    subsets — the candidate generation is the exact pairwise kernel.
    """
    from pyspark.sql import Window

    pairs = _lattice_pairs(emb, vec_col, id_col)
    w = Window.partitionBy("a").orderBy(F.asc("dist2"), F.asc("b"))
    nn1 = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("a", "b", "dist2")
    )
    return (
        nn1.alias("f")
        .join(
            nn1.alias("g"),
            on=[
                F.col("f.a") == F.col("g.b"),
                F.col("f.b") == F.col("g.a"),
                F.col("f.a") < F.col("f.b"),
            ],
        )
        .select(
            F.col("f.a").alias("a"),
            F.col("f.b").alias("b"),
            F.col("f.dist2").alias("dist2"),
        )
    )


def knn_label_agreement(
    emb: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label consistency screen: ``[vec_id, label, n_same,
    n_diff, agree]`` — among each point's exact k nearest lattice
    neighbors, how many share its label (``agree`` is the single
    division of the two exact integers).

    The confident-learning-lite mislabel detector: a point whose
    neighborhood votes against its label is a labeling-error or
    boundary candidate, the first screen a labeled-embedding pipeline
    runs before training on the labels.  Bounded-subset eval, same
    exact pairwise kernel as :func:`mutual_nearest_neighbors`.
    """
    from pyspark.sql import Window

    pairs = _lattice_pairs(emb, vec_col, id_col)
    lb = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).cast("long").alias("label"),
    )
    w = Window.partitionBy("a").orderBy(F.asc("dist2"), F.asc("b"))
    topk = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(k)))
        .select("a", "b")
    )
    joined = (
        topk.join(lb.select(F.col("vec_id").alias("a"), F.col("label").alias("la")), on="a")
        .join(lb.select(F.col("vec_id").alias("b"), F.col("label").alias("lb")), on="b")
    )
    return (
        joined.groupBy(F.col("a").alias("vec_id"), F.col("la").alias("label"))
        .agg(
            F.sum((F.col("la") == F.col("lb")).cast("int"))
            .cast("long")
            .alias("n_same"),
            F.sum((F.col("la") != F.col("lb")).cast("int"))
            .cast("long")
            .alias("n_diff"),
        )
        .select(
            "vec_id",
            "label",
            "n_same",
            "n_diff",
            (
                F.col("n_same").cast("double")
                / (F.col("n_same") + F.col("n_diff")).cast("double")
            ).alias("agree"),
        )
    )
