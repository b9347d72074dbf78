"""Whole-graph structural statistics for web-scale link graphs.

The reference exposes per-graph summary stats through its featurizer
(/root/reference/src/dachshund/graph_stats.rs — node/edge counts,
degree moments); these are the standard additional link-graph
diagnostics (Newman 2002 assortativity, Garlaschelli & Loffredo 2004
reciprocity, log-binned degree histograms for power-law fitting).

Every statistic is a constant number of shuffles over the edge table —
no fixpoints, no collects — so they run as cheap side-queries of a
100 TB crawl: degree tables are one groupBy; the edge-endpoint join
reuses the degree table twice; the final moments are single-row
aggregations with map-side partial combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def degree_assortativity(graph: LinkGraph) -> DataFrame:
    """Pearson correlation of endpoint degrees over undirected edges:
    ``[graph_id?, assortativity]``.

    Newman (2002) eq. 4 computed on the directed-edge double cover:
    each undirected edge {u, v} contributes both (deg u, deg v) and
    (deg v, deg u), which makes the two marginal moments identical and
    the estimator symmetric.  corr = (E[xy] - E[x]E[y]) / Var[x].
    """
    g = gcols(graph.edges)
    und = graph.undirected_edges().select(*g, "src", "dst")
    deg = graph.degrees()  # node_id, degree (distinct-neighbor count)
    ends = und.join(
        deg.withColumnRenamed("node_id", "src").withColumnRenamed(
            "degree", "deg_src"
        ),
        on=g + ["src"],
    ).join(
        deg.withColumnRenamed("node_id", "dst").withColumnRenamed(
            "degree", "deg_dst"
        ),
        on=g + ["dst"],
    )
    # sums of integer-valued doubles are exact (every partial sum is an
    # integer < 2^53), hence order-independent and bit-identical to the
    # DuckDB oracle; the handful of divisions happen once on scalars
    x = F.col("deg_src").cast("double")
    y = F.col("deg_dst").cast("double")
    agg = [
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    ]
    mo = ends.groupBy(*g).agg(*agg) if g else ends.agg(*agg)
    mean = F.col("sx") / F.col("m")
    num = F.col("sxy") / F.col("m") - mean * mean
    den = F.col("sxx") / F.col("m") - mean * mean
    return mo.select(
        *g,
        F.when(den != 0.0, num / den).alias("assortativity"),
    )


def reciprocity(graph: LinkGraph) -> DataFrame:
    """Fraction of directed (non-loop, deduped) edges whose reverse
    edge also exists: ``[graph_id?, n_edges, n_reciprocal,
    reciprocity]``.

    The classic crawl-graph statistic (r ≈ 0.3-0.6 on the web, 0 on a
    DAG).  One self-join on the deduped edge table — the reverse probe
    shuffles on the same (dst, src) keyspace, no fan-out.
    """
    g = gcols(graph.edges)
    e = (
        graph.edges.select(*g, "src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(*g, F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(
        rev.withColumn("_has_rev", F.lit(1)).dropDuplicates(
            g + ["src", "dst"]
        ),
        on=g + ["src", "dst"],
        how="left",
    )
    agg = [
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.coalesce(F.col("_has_rev"), F.lit(0)))
        .cast("long")
        .alias("n_reciprocal"),
    ]
    out = marked.groupBy(*g).agg(*agg) if g else marked.agg(*agg)
    return out.select(
        *g,
        "n_edges",
        "n_reciprocal",
        (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
    )


def dyad_census(graph: LinkGraph) -> DataFrame:
    """Holland-Leinhardt MAN dyad census of the directed graph:
    ``[graph_id?, n_nodes, mutual, asymmetric, null_dyads]``.

    Every unordered node pair is Mutual (both directions present),
    Asymmetric (exactly one), or Null (no edge).  M and A come from one
    canonical-pair aggregation over the deduped non-loop edge table
    (direction count per pair is 1 or 2); N is closed-form
    n·(n−1)/2 − M − A, so the census never materializes the O(n²)
    null set — the only way the statistic survives a web-scale graph.
    All outputs are exact integers (no float parity risk).
    """
    g = gcols(graph.edges)
    e = (
        graph.edges.select(*g, "src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    pairs = e.select(
        *g, F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    pc = pairs.groupBy(*g, "a", "b").agg(F.count(F.lit(1)).alias("ndir"))
    agg = [
        F.sum((F.col("ndir") == 2).cast("long")).alias("mutual"),
        F.sum((F.col("ndir") == 1).cast("long")).alias("asymmetric"),
    ]
    man = pc.groupBy(*g).agg(*agg) if g else pc.agg(*agg)
    nodes = graph.nodes()
    ncnt = (
        nodes.groupBy(*g).agg(F.count(F.lit(1)).alias("n_nodes"))
        if g
        else nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    if g:
        out = man.join(F.broadcast(ncnt), on=g)
    else:
        # two 1-row aggregates: broadcast cross join, no driver action
        out = man.crossJoin(F.broadcast(ncnt))
    null_d = (
        (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))) / F.lit(2)
    ).cast("long") - F.col("mutual") - F.col("asymmetric")
    return out.select(
        *g,
        "n_nodes",
        "mutual",
        "asymmetric",
        null_d.alias("null_dyads"),
    )


def modularity(graph: LinkGraph, labels: DataFrame, label_col: str = "label") -> DataFrame:
    """Newman modularity of a node labeling (e.g. LPA communities):
    ``[graph_id?, within_edges, sum_deg_sq, modularity]``.

    Q = Σ_c [ e_c/m − (d_c/2m)² ]  =  within/m − sum_deg_sq/(4m²)

    where m = undirected edge count, within = Σ_c e_c (edges with both
    endpoints in the same community), and sum_deg_sq = Σ_c d_c²
    (squared community degree sums).  Both numerators are INTEGER sums
    — the only float ops are two scalar divisions at the end, so the
    value is bit-identical to the SQL oracle with no rounding.

    Cost: two label-dictionary joins on the canonical edge table + two
    aggregations (all map-side-combinable) — constant shuffles, no
    fixpoint, safe as a convergence metric evaluated every LPA round.
    ``sum_deg_sq`` is accumulated as double: d_c ≤ 2m, so d_c² can pass
    2^63 on a 10^12-edge crawl, but every partial sum stays an exact
    integer until ~2^53 and the Q contribution of the error beyond that
    is ≪ 1e-8 (d_c²/4m² is O(1)).
    """
    g = gcols(graph.edges)
    lab = labels.select(*g, "node_id", F.col(label_col).alias("_c"))
    canon = graph.canonical_edges()
    within = (
        canon.join(
            lab.select(*g, F.col("node_id").alias("src"), F.col("_c").alias("_cs")),
            on=g + ["src"],
        )
        .join(
            lab.select(*g, F.col("node_id").alias("dst"), F.col("_c").alias("_cd")),
            on=g + ["dst"],
        )
        .where(F.col("_cs") == F.col("_cd"))
    )
    w_agg = [F.count(F.lit(1)).cast("long").alias("within_edges")]
    # NB: a graph whose labeling has NO intra-community edge produces no
    # row in this aggregate — the joins below anchor on the edge-count
    # frame (every graph with edges has one) and coalesce within to 0
    w = within.groupBy(*g).agg(*w_agg) if g else within.agg(*w_agg)
    comm_deg = (
        graph.degrees()
        .join(lab, on=g + ["node_id"])
        .groupBy(*g, "_c")
        .agg(F.sum("degree").cast("double").alias("d_c"))
    )
    s_agg = [F.sum(F.col("d_c") * F.col("d_c")).alias("sum_deg_sq")]
    s = comm_deg.groupBy(*g).agg(*s_agg) if g else comm_deg.agg(*s_agg)
    m_agg = [F.count(F.lit(1)).cast("double").alias("_m")]
    m = canon.groupBy(*g).agg(*m_agg) if g else canon.agg(*m_agg)
    joined = (
        m.join(w, on=g, how="left").join(s, on=g, how="left")
        if g
        else w.crossJoin(s).crossJoin(m)
    )
    within_c = F.coalesce("within_edges", F.lit(0).cast("long"))
    return joined.select(
        *g,
        within_c.alias("within_edges"),
        F.col("sum_deg_sq").cast("long").alias("sum_deg_sq"),
        (
            within_c / F.col("_m")
            - F.col("sum_deg_sq") / (F.lit(4.0) * F.col("_m") * F.col("_m"))
        ).alias("modularity"),
    )


def hub_removal_robustness(graph: LinkGraph, k: int = 10) -> DataFrame:
    """Targeted-attack robustness (Albert, Jeong & Barabási 2000):
    remove the top-``k`` hubs (by degree, ties → smallest id) and
    report the connectivity damage in ONE row: ``[n_nodes,
    largest_cc, n_nodes_after, largest_cc_after]``.

    The classic scale-free-graph diagnostic — a power-law web graph
    shatters under hub removal while staying robust to random failure.
    Hub selection is a TakeOrdered (top-k never sorts globally); the
    reduced graph is two anti-joins; each largest-component size is one
    hash-min fixpoint + a count aggregation.
    """
    from dachshund_spark.algorithms.components import connected_components

    def largest(g_: LinkGraph) -> DataFrame:
        comps = connected_components(g_, renumber=False)
        per = comps.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        return per.agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("largest"),
        )

    if gcols(graph.edges):
        raise ValueError(
            "hub_removal_robustness reports a single-graph summary — "
            "filter to one graph_id first"
        )
    deg = graph.degrees()
    hubs = (
        deg.orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(int(k))
        .select("node_id")
    )
    reduced = graph.excluding_nodes(hubs)
    before = graph.nodes().agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    after = reduced.nodes().agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes_after")
    )
    lb = largest(graph).select(F.col("largest").alias("largest_cc"))
    la = largest(reduced).select(F.col("largest").alias("largest_cc_after"))
    return before.crossJoin(lb).crossJoin(after).crossJoin(la)


def degree_distribution(
    graph: LinkGraph, *, log_binned: bool = True
) -> DataFrame:
    """Undirected-degree histogram: ``[graph_id?, bin, n_nodes]``.

    With ``log_binned`` (default) ``bin = floor(log2(degree))`` — the
    standard power-law diagnostic binning (a straight line in
    (bin, log n_nodes) space ⟺ scale-free); otherwise the raw degree.
    Two shuffles total (degree groupBy + histogram groupBy), both with
    map-side combine; output is O(log max_degree) rows per graph.

    floor(log2) is computed as binary-digit-count − 1 (integer-exact,
    no libm dependence — keeps the DuckDB oracle bit-identical at
    power-of-two boundaries).
    """
    g = gcols(graph.edges)
    deg = graph.degrees()
    if log_binned:
        b = (F.length(F.conv(F.col("degree"), 10, 2)) - 1).cast("long")
    else:
        b = F.col("degree").cast("long")
    return (
        deg.select(*g, b.alias("bin"))
        .groupBy(*g, "bin")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def powerlaw_alpha(
    graph: LinkGraph, dmin: int = 5, directed: bool = False
) -> DataFrame:
    """Continuous-MLE power-law exponent of the degree distribution
    (Hill estimator with the Clauset–Shalizi–Newman −0.5 discreteness
    correction): ``α = 1 + n · (Σ_{dᵢ≥dmin} ln(dᵢ/(dmin−0.5)))⁻¹``.

    Web-graph in/out-degree tails are the canonical power laws
    (α ≈ 2.1 in; Broder et al. 2000); the exponent is the standard
    sanity check that a crawl sample reproduces the web's tail, and
    feeds hub-threshold choices for the salting paths.

    Returns one row ``[dmin, n_tail, alpha]`` (per graph if grouped).
    ``directed=True`` uses in-degrees (the classic web measurement);
    default is undirected degree.

    Oracle parity: each ln term is pre-rounded to a 1e-8-scaled BIGINT
    and summed exactly — never a float sum of libm outputs (CLAUDE.md
    parity notes); the final α is scalar arithmetic after aggregation.
    One degree aggregation + one filtered sum: two shuffles total.
    """
    if dmin < 2:
        raise ValueError("dmin must be >= 2 (the -0.5 correction needs dmin-0.5 > d/e)")
    deg = graph.in_degrees() if directed else graph.degrees()
    g = gcols(graph.edges)
    dcol = "in_degree" if directed else "degree"
    term_e8 = F.round(
        F.log(F.col(dcol) / F.lit(float(dmin) - 0.5)) * F.lit(100_000_000), 0
    ).cast("long")
    tail = deg.where(F.col(dcol) >= F.lit(int(dmin)))
    out = tail.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(term_e8).cast("long").alias("_s_e8"),
    )
    return out.select(
        *g,
        F.lit(int(dmin)).cast("long").alias("dmin"),
        "n_tail",
        F.round(
            F.lit(1.0)
            + F.col("n_tail") / (F.col("_s_e8").cast("double") / F.lit(100_000_000.0)),
            8,
        ).alias("alpha"),
    )


def rich_club(graph: LinkGraph) -> DataFrame:
    """Rich-club coefficient sweep: ``[graph_id?, k, n_nodes, n_edges,
    phi]`` with one row per observed degree value k where ≥2 nodes
    have degree > k.

    Zhou & Mondragón (2004): φ(k) = 2·E_{>k} / (N_{>k}·(N_{>k}−1)),
    the edge density among the subgraph induced by nodes of degree > k
    — φ(k) → 1 means the hubs form a near-clique (the "rich club"),
    the standard diagnostic of core-dominated web/citation topologies.

    Shuffle shape: degree groupBy + one edges→degrees join to get each
    edge's bottleneck degree min(deg u, deg v), then everything
    collapses to per-degree-value histograms (O(#distinct degrees)
    rows) where N_{>k} / E_{>k} are descending cumulative sums — a
    per-graph window over the tiny aggregated frame, never a non-equi
    join over the sweep. All counts stay BIGINT; the single closing
    division is the only float op (oracle-exact).
    """
    from pyspark.sql import Window

    g = gcols(graph.edges)
    deg = graph.degrees()
    canon = graph.canonical_edges()
    m = (
        canon.join(
            deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("_ds")),
            on=g + ["src"],
        )
        .join(
            deg.select(*g, F.col("node_id").alias("dst"), F.col("degree").alias("_dd")),
            on=g + ["dst"],
        )
        .select(*g, F.least("_ds", "_dd").alias("val"))
    )
    # every edge's bottleneck value IS some node's degree, so the two
    # histograms share one value axis and one window pass covers both
    node_hist = deg.groupBy(*g, F.col("degree").alias("val")).agg(
        F.count(F.lit(1)).alias("ncnt")
    )
    edge_hist = m.groupBy(*g, "val").agg(F.count(F.lit(1)).alias("ecnt"))
    hist = (
        node_hist.join(edge_hist, on=g + ["val"], how="left")
        .select(*g, "val", "ncnt", F.coalesce("ecnt", F.lit(0)).alias("ecnt"))
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.desc("val"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *g,
        F.col("val").alias("k"),
        (F.sum("ncnt").over(w) - F.col("ncnt")).alias("n_nodes"),
        (F.sum("ecnt").over(w) - F.col("ecnt")).alias("n_edges"),
    )
    return cum.where(F.col("n_nodes") >= 2).select(
        *g,
        "k",
        "n_nodes",
        "n_edges",
        F.round(
            F.lit(2.0)
            * F.col("n_edges")
            / (F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1).cast("double")),
            8,
        ).alias("phi"),
    )


def degree_quantiles(graph: LinkGraph) -> DataFrame:
    """Exact degree quantiles ``[g?, q, rank, degree]`` for p50 / p90 /
    p99 / p100 — integer arithmetic end-to-end.

    The quantile at fraction num/den is the degree of the node ranked
    ceil(q·n) in ascending order, computed from the degree HISTOGRAM
    (O(#distinct degrees) rows) with an ascending window cumsum — never
    a global sort of the node table, so the shuffle cost is the degree
    groupBy it shares with every other stat.  ``rank`` = ceil(q·n) is
    emitted so the oracle comparison pins the target, not just the
    answer.
    """
    g = gcols(graph.edges)
    return exact_quantiles(
        graph.degrees(), "degree", group_cols=g
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str] | tuple[str, ...]" = (),
    qs: "tuple[tuple[str, int, int], ...]" = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
        ("p100", 1, 1),
    ),
    two_phase_buckets: int | None = None,
) -> DataFrame:
    """Exact quantiles of an integral column via histogram cumsum:
    ``[*group_cols, q, rank, <value_col>]`` — the sort-free quantile
    machinery shared by :func:`degree_quantiles` and the corpus length
    profiles.  Each quantile num/den is the value at ascending rank
    ceil(q·n), found on the VALUE HISTOGRAM (O(#distinct values) rows
    per group) — never a global sort of the input.

    When the histogram itself is NOT bounded (distinct values grow
    with the data, e.g. per-user monetary totals rather than degrees),
    pass ``two_phase_buckets`` (group_cols must be empty): the cumsum
    runs per value-range bucket with the bucket offsets folded back in
    (the :mod:`~dachshund_spark.pipeline.packing` two-phase pattern) —
    no single-partition window at any histogram size.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    n = df.groupBy(*g).agg(F.count(F.lit(1)).alias("_n"))
    hist = df.groupBy(*g, F.col(value_col).alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if two_phase_buckets is not None:
        if g:
            raise ValueError("two_phase_buckets requires empty group_cols")
        from dachshund_spark.pipeline.packing import _two_phase_cumsum

        cum = (
            _two_phase_cumsum(hist, "val", "cnt", int(two_phase_buckets))
            .select("val", (F.col("_gs") + F.col("cnt")).alias("cum"))
        )
    else:
        w = (
            Window.partitionBy(*g)
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = hist.select(*g, "val", F.sum("cnt").over(w).alias("cum"))
    qdf = df.sparkSession.createDataFrame(
        list(qs), "q string, num long, den long"
    )
    # ceil(q·n) in pure integer math: (num·n + den − 1) div den
    ranks = n.crossJoin(F.broadcast(qdf)).select(
        *g, "q", F.expr("(num * _n + den - 1) div den").alias("rank")
    )
    # ranks is ≤ |qs| rows per group key; broadcast it explicitly — the
    # non-equi (cum >= rank) probe must never degrade to a Cartesian
    # product when the input's stats are opaque (e.g. checkpointed)
    joined = ranks.join(cum, on=g) if g else cum.crossJoin(F.broadcast(ranks))
    return (
        joined.where(F.col("cum") >= F.col("rank"))
        .groupBy(*g, "q", "rank")
        .agg(F.min("val").cast("long").alias(value_col))
    )


def degree_gini(graph: LinkGraph) -> DataFrame:
    """Gini coefficient of the degree sequence:
    ``[graph_id?, n_nodes, sum_degree, gini_num, gini]``.

    The inequality dial of a crawl graph (0 = regular, →1 = a few hubs
    own all the edges) — the scalar complement to the log-binned degree
    histogram.  Uses the sorted-rank identity
    G = (2·Σᵢ i·d₍ᵢ₎ − (n+1)·Σd) / (n·Σd) computed on the degree
    HISTOGRAM (same sort-free shape as :func:`exact_quantiles`): a
    degree block with count c and cumulative count F has rank-sum
    c·(F−c) + c(c+1)/2, so the window runs over O(#distinct degrees)
    rows, never a global node sort.  Numerator and denominator are
    exact BIGINTs; ``gini`` is the single IEEE division of the two.
    """
    from pyspark.sql import Window

    g = gcols(graph.edges)
    deg = graph.degrees()
    hist = deg.groupBy(*g, F.col("degree").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(*g)
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(*g, "val", "cnt", F.sum("cnt").over(w).alias("cum"))
    ranksum = F.col("cnt") * (F.col("cum") - F.col("cnt")) + F.expr(
        "cnt * (cnt + 1) div 2"
    )
    agg = [
        F.sum("cnt").cast("long").alias("n_nodes"),
        F.sum(F.col("val") * F.col("cnt")).cast("long").alias("sum_degree"),
        F.sum(F.col("val") * ranksum).cast("long").alias("_t"),
    ]
    mo = cum.groupBy(*g).agg(*agg) if g else cum.agg(*agg)
    num = (
        F.lit(2) * F.col("_t")
        - (F.col("n_nodes") + F.lit(1)) * F.col("sum_degree")
    ).cast("long")
    return mo.select(
        *g,
        "n_nodes",
        "sum_degree",
        num.alias("gini_num"),
        (num / (F.col("n_nodes") * F.col("sum_degree"))).alias("gini"),
    )


def burt_constraint(graph: LinkGraph) -> DataFrame:
    """Burt's structural-holes constraint (Burt 1992) on the
    unweighted undirected graph: ``[graph_id?, node_id, degree,
    constraint_e16, constraint]``.

    cᵢⱼ = (pᵢⱼ + Σ_q pᵢq·pqⱼ)² over direct ties j, with pᵢⱼ = 1/dᵢ;
    Cᵢ = Σⱼ cᵢⱼ.  Low constraint = the node brokers between
    otherwise-disconnected contacts.

    Engine-exact arithmetic: each addend is pre-rounded to 1e-8-scaled
    BIGINTs (direct term round(1e8/dᵢ), indirect round(1e8/(dᵢ·d_q))),
    summed exactly, squared into 1e-16 units, and the per-node sum is
    DECIMAL(38,0) (worst case dᵢ·4e16 exceeds int64); ``constraint``
    is the single IEEE division by 1e16.  The indirect sum is one
    wedge join (adjacency ⋈ adjacency on the shared contact) semi-
    joined back to direct ties — the link-prediction join shape, hub
    cost bounded by the same degree-cap arguments.
    """
    g = gcols(graph.edges)
    adj = graph.undirected_edges().select(*g, "src", "dst")
    deg = graph.degrees()
    dsrc = deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("d_i"))
    e = adj.join(dsrc, on=g + ["src"])
    direct_e8 = F.round(F.lit(100000000.0) / F.col("d_i"), 0).cast("long")
    # wedge (i, q, j): q a contact of i, j a contact of q, j ≠ i;
    # q ≠ j holds by no-self-loop construction
    dq = deg.select(*g, F.col("node_id").alias("q"), F.col("degree").alias("d_q"))
    iq = adj.select(*g, "src", F.col("dst").alias("q")).join(
        deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("d_i")),
        on=g + ["src"],
    ).join(dq, on=g + ["q"])
    qj = adj.select(*g, F.col("src").alias("q"), F.col("dst").alias("dst"))
    wedges = iq.join(qj, on=g + ["q"]).where(F.col("dst") != F.col("src"))
    # keep only wedges landing on a DIRECT tie of i
    wedges = wedges.join(
        adj.select(*g, "src", "dst"), on=g + ["src", "dst"], how="left_semi"
    )
    ind_term = F.round(
        F.lit(100000000.0) / (F.col("d_i") * F.col("d_q")), 0
    ).cast("long")
    ind = wedges.select(*g, "src", "dst", ind_term.alias("_w")).groupBy(
        *g, "src", "dst"
    ).agg(F.sum("_w").alias("ind_e8"))
    s = e.join(ind, on=g + ["src", "dst"], how="left").select(
        *g,
        "src",
        "d_i",
        (direct_e8 + F.coalesce(F.col("ind_e8"), F.lit(0))).alias("s_e8"),
    )
    return s.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.max("d_i").cast("long").alias("degree"),
        F.sum((F.col("s_e8") * F.col("s_e8")).cast("decimal(38,0)")).alias(
            "constraint_e16"
        ),
    ).select(
        *g,
        "node_id",
        "degree",
        F.col("constraint_e16").cast("decimal(38,0)").alias("constraint_e16"),
        (
            F.col("constraint_e16").cast("double") / F.lit(1.0e16)
        ).alias("constraint"),
    )


def conductance(
    graph: LinkGraph, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Per-community conductance over the symmetrized simple graph:
    ``[graph_id?, label, volume, cut_edges, conductance]`` with
    φ(S) = cut(S) / min(vol(S), 2m − vol(S)).

    ``volume`` counts directed adjacency rows whose src is in S (=
    Σ deg), ``cut_edges`` those whose endpoint labels differ (each
    undirected cut edge contributes once per side, so it appears in
    both communities' cuts — the standard convention).  All sums are
    exact integers; φ is a single IEEE division, NULL when the
    denominator is 0 (community spans the whole graph).

    Scale: two label joins on the edge endpoints + one groupBy(label)
    — the same shape as one LPA superstep; no windows, no collects.
    """
    und = graph.undirected_edges()
    g = gcols(und)
    lsrc = labels.select(
        *g, F.col("node_id").alias("src"), F.col(label_col).alias("_ls")
    )
    ldst = labels.select(
        *g, F.col("node_id").alias("dst"), F.col(label_col).alias("_ld")
    )
    e = und.join(lsrc, on=g + ["src"]).join(ldst, on=g + ["dst"])
    per = e.groupBy(*g, F.col("_ls").alias(label_col)).agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum(F.when(F.col("_ls") != F.col("_ld"), 1).otherwise(0))
        .cast("long")
        .alias("cut_edges"),
    )
    m2 = und.groupBy(*g).agg(F.count(F.lit(1)).alias("_m2"))
    joined = per.join(F.broadcast(m2), on=g) if g else per.crossJoin(
        F.broadcast(m2)
    )
    den = F.least(F.col("volume"), F.col("_m2") - F.col("volume"))
    return joined.select(
        *g,
        label_col,
        "volume",
        "cut_edges",
        F.when(den > 0, F.col("cut_edges") / den).alias("conductance"),
    )


def gap_encoding_stats(edges: DataFrame) -> DataFrame:
    """WebGraph-style compressibility profile of an adjacency list:
    per source, the exact bit cost of gap-encoding its sorted successor
    list — ``[graph_id?, node_id, n_out, gap_bits]``.

    Successors sorted ascending; the first entry costs
    ``bits(dst + 1)`` and each next one ``bits(dst − prev)`` with
    ``bits(x) = ⌊log2 x⌋ + 1`` computed exactly as the length of the
    minimal binary string (no float log anywhere).  The per-node sums
    are what a storage planner needs to size a BV-graph-style encoding
    of a 10^12-edge crawl (Boldi & Vigna, WWW 2004 — the γ-code payload
    term).  One distinct + one per-source LAG window (hub partitions
    sort in one task, same profile as the h-index coreness sort).
    """
    from pyspark.sql import Window

    g = gcols(edges)
    e = edges.select(*g, "src", "dst").distinct()
    w = Window.partitionBy(*g, "src").orderBy("dst")
    gap = F.when(
        F.lag("dst").over(w).isNull(), F.col("dst") + 1
    ).otherwise(F.col("dst") - F.lag("dst").over(w))
    bits = F.length(F.bin(gap))
    return (
        e.withColumn("_bits", bits)
        .groupBy(*g, F.col("src").alias("node_id"))
        .agg(
            F.count(F.lit(1)).alias("n_out"),
            F.sum("_bits").cast("long").alias("gap_bits"),
        )
    )


def bond_percolation(
    graph: "LinkGraph",
    *,
    thresholds: tuple = (25, 50, 75),
    seed: int = 11,
    cc_rounds: int = 24,
) -> DataFrame:
    """Bond-percolation robustness curve: keep each canonical edge iff
    ``md5(seed#src#dst) % 100 < p`` and report the surviving graph per
    threshold — ``[p_pct, n_edges, n_nodes, largest_cc]``.

    One hash per edge *coupled across thresholds* (the standard
    monotone coupling: the p=25 graph is a subgraph of the p=50 graph),
    so the curve is monotone by construction and the whole family costs
    one hash pass + one CC fixpoint per threshold.  Component labels
    are the state after exactly ``cc_rounds`` hash-min rounds (the
    driver oracle replays the same count; on fixture graphs this is
    far past convergence).  Complements hub-attack robustness
    (:func:`hub_removal_robustness`) with the random-failure curve.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.pipeline.text import md5_long

    g = gcols(graph.edges)
    canon = graph.canonical_edges()
    hashed = canon.withColumn(
        "_h",
        md5_long(F.concat_ws("#", F.lit(int(seed)), F.col("src"), F.col("dst")))
        % 100,
    ).persist()
    out = None
    for pct in thresholds:
        kept = hashed.where(F.col("_h") < int(pct)).select(*g, "src", "dst")
        comp = connected_components(
            LinkGraph(kept), renumber=False, max_iterations=int(cc_rounds)
        )
        sizes = comp.groupBy(*g, "component").agg(F.count(F.lit(1)).alias("_c"))
        nstats = sizes.groupBy(*g).agg(
            F.max("_c").alias("largest_cc"), F.sum("_c").alias("n_nodes")
        )
        estats = kept.groupBy(*g).agg(F.count(F.lit(1)).alias("n_edges")) if g else kept.agg(
            F.count(F.lit(1)).alias("n_edges")
        )
        joined = nstats.join(estats, on=g) if g else nstats.crossJoin(estats)
        row = joined.select(
            *g,
            F.lit(int(pct)).alias("p_pct"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("largest_cc").cast("long").alias("largest_cc"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def articulation_points(graph: "LinkGraph", *, cc_rounds: int = 24) -> DataFrame:
    """Articulation (cut) vertices by coupled vertex-deletion CC —
    ``[node_id, n_components, n_isolated, is_articulation]``.

    Every candidate deletion runs as one graph of a MULTI-graph frame
    (graph_id = deleted vertex, plus a -1 sentinel for the intact
    graph), so all |V| what-if graphs converge in a single hash-min
    fixpoint of ``cc_rounds`` supersteps — not |V| sequential CC jobs.
    ``n_components`` counts edge-bearing components of G−v;
    ``n_isolated`` counts vertices whose only neighbor was v;
    ``is_articulation`` = their sum exceeds the intact component count.

    O(|V|·|E|) state — a bounded-subgraph / ego-net diagnostic (like
    ``betweenness_local``), not a whole-crawl op. Tarjan's linear-time
    algorithm is inherently sequential; this formulation trades work
    for superstep-parallel SQL-replayable semantics.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.util import GRAPH_ID

    assert not gcols(graph.edges), "articulation_points expects a single graph"
    und = graph.undirected_edges().select("src", "dst")
    xs = (
        graph.nodes()
        .select(F.col("node_id").alias("_x"))
        .unionByName(
            und.sparkSession.createDataFrame([(-1,)], "_x long")
        )
    )
    ex = (
        und.crossJoin(F.broadcast(xs))
        .where((F.col("src") != F.col("_x")) & (F.col("dst") != F.col("_x")))
        .select(F.col("_x").alias(GRAPH_ID), "src", "dst")
    )
    comp = connected_components(
        LinkGraph(ex), renumber=False, max_iterations=int(cc_rounds)
    )
    ncomp = comp.groupBy(GRAPH_ID).agg(
        F.countDistinct("component").cast("long").alias("n_components")
    )
    # vertices isolated BY the deletion: their single distinct
    # neighbor is the deleted vertex
    nb = und.groupBy("src").agg(
        F.countDistinct("dst").alias("_nd"), F.min("dst").alias("_only")
    )
    iso = (
        nb.where(F.col("_nd") == 1)
        .groupBy(F.col("_only").alias(GRAPH_ID))
        .agg(F.count(F.lit(1)).cast("long").alias("n_isolated"))
    )
    base = ncomp.where(F.col(GRAPH_ID) == -1).select(
        F.col("n_components").alias("_base")
    )
    # deleting e.g. a star center leaves ZERO edges for that graph_id,
    # so it vanishes from the CC output — anchor on the candidate set
    return (
        xs.where(F.col("_x") != -1)
        .select(F.col("_x").alias(GRAPH_ID))
        .join(ncomp, on=GRAPH_ID, how="left")
        .withColumn(
            "n_components", F.coalesce("n_components", F.lit(0).cast("long"))
        )
        .join(iso, on=GRAPH_ID, how="left")
        .withColumn("n_isolated", F.coalesce("n_isolated", F.lit(0).cast("long")))
        .crossJoin(F.broadcast(base))
        .select(
            F.col(GRAPH_ID).alias("node_id"),
            "n_components",
            "n_isolated",
            (
                (F.col("n_components") + F.col("n_isolated")) > F.col("_base")
            ).cast("int").alias("is_articulation"),
        )
    )


def bridges(graph: "LinkGraph", *, cc_rounds: int = 24) -> DataFrame:
    """Bridge (cut) edges by coupled edge-deletion CC —
    ``[src, dst, n_components, n_isolated, is_bridge]`` over canonical
    (src<dst) edges.

    Same shape as :func:`articulation_points`: every canonical edge's
    deletion is one graph of a multi-graph frame (graph_id = the
    deleted edge's ``min·2^20+max`` key, -1 sentinel = intact), all
    converging in one ``cc_rounds``-round hash-min fixpoint.
    ``n_isolated`` counts deleted-edge endpoints of degree 1 (they
    leave the edge-bearing node set). O(|E|²) state — a
    bounded-subgraph diagnostic, not a whole-crawl op.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph
    from dachshund_spark.util import GRAPH_ID

    assert not gcols(graph.edges), "bridges expects a single graph"
    canon = graph.canonical_edges().select("src", "dst")
    # Pack the deleted edge as min·2^shift + max.  A fixed 2^20 shift
    # silently collides for ids ≥ 2^20 (routine for web-scale ids even
    # on a small subgraph), merging distinct what-if deletions — so
    # derive the shift from the observed max id (one bounded scalar
    # agg; this operator already costs |E| CC problems, the agg is
    # noise) and refuse ids whose packed key can't fit a long.
    max_id = canon.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("m")
    ).first()[0]
    if max_id is None:
        max_id = 0
    shift = max(int(max_id).bit_length(), 1)
    if 2 * shift > 62:
        raise ValueError(
            f"bridges: max node id {max_id} needs {shift} bits; the packed "
            "(min,max) edge key would overflow a 64-bit long — renumber "
            "node ids densely first (LinkGraph renumbering or CC renumber)"
        )
    ekey = (F.col("src") * F.lit(1 << shift) + F.col("dst")).alias("_x")
    xs = canon.select(ekey).unionByName(
        canon.sparkSession.createDataFrame([(-1,)], "_x long")
    )
    und = graph.undirected_edges().select("src", "dst")
    ukey = F.least("src", "dst") * F.lit(1 << shift) + F.greatest("src", "dst")
    ex = (
        und.crossJoin(F.broadcast(xs))
        .where(ukey != F.col("_x"))
        .select(F.col("_x").alias(GRAPH_ID), "src", "dst")
    )
    comp = connected_components(
        LinkGraph(ex), renumber=False, max_iterations=int(cc_rounds)
    )
    ncomp = comp.groupBy(GRAPH_ID).agg(
        F.countDistinct("component").cast("long").alias("n_components")
    )
    deg = und.groupBy(F.col("src").alias("_n")).agg(
        F.countDistinct("dst").alias("_deg")
    )
    iso = (
        canon.join(deg, canon.src == F.col("_n"))
        .select("src", "dst", (F.col("_deg") == 1).cast("long").alias("_i1"))
        .join(deg, F.col("dst") == F.col("_n"))
        .select(
            "src",
            "dst",
            (F.col("_i1") + (F.col("_deg") == 1).cast("long")).alias("n_isolated"),
        )
    )
    base = ncomp.where(F.col(GRAPH_ID) == -1).select(
        F.col("n_components").alias("_base")
    )
    return (
        canon.select("src", "dst", ekey)
        .join(
            ncomp.select(F.col(GRAPH_ID).alias("_x"), "n_components"),
            on="_x",
            how="left",
        )
        .withColumn(
            "n_components", F.coalesce("n_components", F.lit(0).cast("long"))
        )
        .join(iso, on=["src", "dst"])
        .crossJoin(F.broadcast(base))
        .select(
            "src",
            "dst",
            "n_components",
            "n_isolated",
            (
                (F.col("n_components") + F.col("n_isolated")) > F.col("_base")
            ).cast("int").alias("is_bridge"),
        )
    )


def two_edge_components(
    graph: "LinkGraph", *, cc_rounds: int = 24, max_iterations: int = 200
) -> DataFrame:
    """Bridge-free (2-edge-connected) components:
    ``[node_id, component]`` — connected components after deleting
    every bridge edge, over the FULL node set (a node all of whose
    incident edges are bridges becomes a singleton).  Every
    non-singleton component is 2-edge-connected: any two of its nodes
    lie on a common cycle, the classic "robust core" decomposition for
    link-graph reliability.

    Composition of :func:`bridges` (O(|E|) coupled what-if CC problems
    — a bounded-subgraph diagnostic, same budget note as there) and one
    more hash-min CC over the surviving edges.
    """
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    br = bridges(graph, cc_rounds=cc_rounds)
    bridge_edges = br.where(F.col("is_bridge") == 1).select("src", "dst")
    canon = graph.canonical_edges().select("src", "dst")
    keep = canon.join(bridge_edges, on=["src", "dst"], how="left_anti")
    return connected_components(
        LinkGraph(keep),
        nodes=graph.nodes(),
        renumber=False,
        max_iterations=max_iterations,
    ).select("node_id", "component")


def attribute_assortativity(
    graph: LinkGraph, classes: DataFrame, cls_col: str = "cls"
) -> DataFrame:
    """Newman nominal (categorical) assortativity over a node attribute:
    ``[graph_id?, m_edges, same_class, sum_sq, assortativity]``.

    r = (Tr e − Σᵢ aᵢbᵢ) / (1 − Σᵢ aᵢbᵢ) on the symmetric edge double
    cover, computed in cleared-denominator integer form
    (M·same − Σᵢ sᵢ²) / (M² − Σᵢ sᵢ²) so the only float op is the final
    division (engine-stable).  ``classes``: [node_id, cls]; at web
    scale it is the language/host-type table and broadcasts when small.
    Integer bound: M² must fit BIGINT (M < 3·10⁹ symmetric edges) —
    past that, pre-aggregate per class pair and move to doubles.
    """
    g = gcols(graph.edges)
    und = graph.undirected_edges().select(*g, "src", "dst")
    cs = classes.select(F.col("node_id").alias("src"), F.col(cls_col).alias("c_src"))
    cd = classes.select(F.col("node_id").alias("dst"), F.col(cls_col).alias("c_dst"))
    # no explicit broadcast: classes is node-cardinality in the driver
    # query (the full node table), so forcing it driver-side can OOM at
    # web scale — AQE size-gates the build side at runtime instead
    ends = und.join(cs, on="src").join(cd, on="dst")
    per_cls = ends.groupBy(*g, "c_src").agg(
        F.count(F.lit(1)).alias("s_i"),
        F.sum((F.col("c_src") == F.col("c_dst")).cast("long")).alias("same_i"),
    )
    agg = [
        F.sum("s_i").alias("m_edges"),
        F.sum("same_i").alias("same_class"),
        F.sum(F.col("s_i") * F.col("s_i")).alias("sum_sq"),
    ]
    mo = per_cls.groupBy(*g).agg(*agg) if g else per_cls.agg(*agg)
    m, same, ss = F.col("m_edges"), F.col("same_class"), F.col("sum_sq")
    return mo.select(
        *g,
        m.cast("long").alias("m_edges"),
        same.cast("long").alias("same_class"),
        ss.cast("long").alias("sum_sq"),
        F.when(
            m * m - ss != 0,
            (m * same - ss).cast("double") / (m * m - ss).cast("double"),
        ).alias("assortativity"),
    )


def neighbor_degree_curve(graph: LinkGraph) -> DataFrame:
    """Average-neighbor-degree spectrum knn(k) (Pastor-Satorras et al.
    2001): for each degree class k, the mean degree of neighbors of
    degree-k nodes — the degree-correlation curve behind the scalar
    assortativity coefficient (rising = assortative, falling =
    hub-periphery).  ``[graph_id?, degree, n_nodes, sum_nbr_degree,
    n_nbr, knn]``: exact integer sums; knn is one IEEE division."""
    g = gcols(graph.edges)
    und = graph.undirected_edges().select(*g, "src", "dst")
    deg = und.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ends = und.join(
        deg.select(*g, F.col("node_id").alias("src"), F.col("d").alias("d_src")),
        on=g + ["src"],
    ).join(
        deg.select(*g, F.col("node_id").alias("dst"), F.col("d").alias("d_dst")),
        on=g + ["dst"],
    )
    per_deg = ends.groupBy(*g, F.col("d_src").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nbr"),
        F.sum("d_dst").alias("sum_nbr_degree"),
    )
    counts = deg.groupBy(*g, F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    return counts.join(per_deg, on=g + ["degree"]).select(
        *g,
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("sum_nbr_degree").cast("long").alias("sum_nbr_degree"),
        F.col("n_nbr").cast("long").alias("n_nbr"),
        (
            F.col("sum_nbr_degree").cast("double") / F.col("n_nbr").cast("double")
        ).alias("knn"),
    )


def spearman_pagerank_degree(graph: LinkGraph, *, iterations: int = 10) -> DataFrame:
    """Spearman rank correlation between PageRank and undirected degree
    — "does link endorsement follow raw popularity?", the standard
    sanity scalar before trusting either centrality at crawl scale.

    Ranks are total orders (ascending value, ties broken by node_id —
    deterministic tie-broken ranks, not fractional averaged Spearman),
    assigned WITHOUT a global window via util.two_phase_rank_by.
    ρ = 1 − 6·Σd² / (n·(n²−1)) with Σd² an exact BIGINT; one division.

    Output: one row ``[n_nodes, sum_d2, spearman]``.
    """
    from dachshund_spark.algorithms.pagerank import pagerank
    from dachshund_spark.util import two_phase_rank_by

    pr = pagerank(graph, fixed_iterations=int(iterations)).select(
        "node_id", F.round("pagerank", 8).alias("_s")
    )
    deg = graph.degrees().select("node_id", F.col("degree").cast("long").alias("_d"))
    j = pr.join(deg, on="node_id")
    j = two_phase_rank_by(j, "_s", "node_id", out_col="rank_pr")
    j = two_phase_rank_by(j, "_d", "node_id", out_col="rank_deg")
    dd = j.select(
        (
            (F.col("rank_pr") - F.col("rank_deg"))
            * (F.col("rank_pr") - F.col("rank_deg"))
        ).cast("long").alias("_d2")
    )
    return dd.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("_d2").cast("long").alias("sum_d2"),
    ).select(
        "n_nodes",
        "sum_d2",
        F.expr(
            "1.0 - CAST(6 * sum_d2 AS DOUBLE) / "
            "CAST(n_nodes * (n_nodes * n_nodes - 1) AS DOUBLE)"
        ).alias("spearman"),
    )


def configuration_model_check(graph: LinkGraph) -> DataFrame:
    """Observed global transitivity vs the configuration-model (degree-
    preserving random graph) expectation — the closed-form null that
    motif_significance estimates empirically via rewiring.

    Expected clustering under the configuration model (Newman 2003):
    ``C_exp = (⟨d²⟩ − ⟨d⟩)² / (n·⟨d⟩³)``, computed here with cleared
    denominators from EXACT integer moments S1 = Σd, S2 = Σd²:
    ``C_exp = (S2 − S1)² · n / S1³``.  Both C values come from one
    deterministic IEEE expression tree over exact integers; the excess
    ratio is one further division of those two doubles.

    Output: one row ``[n_nodes, s1, s2, triangles3, wedges,
    transitivity, c_expected, excess_ratio]``.
    """
    from dachshund_spark.algorithms.triangles import triangle_list

    deg = graph.degrees()
    mom = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("degree").cast("long").alias("s1"),
        F.sum(F.col("degree") * F.col("degree")).cast("long").alias("s2"),
    )
    tri = triangle_list(graph).agg(
        (F.count(F.lit(1)) * 3).cast("long").alias("triangles3")
    )
    out = mom.crossJoin(tri).withColumn(
        "wedges", F.expr("(s2 - s1) DIV 2").cast("long")
    )
    c_obs = F.expr("CAST(triangles3 AS DOUBLE) / CAST(wedges AS DOUBLE)")
    c_exp = F.expr(
        "CAST((s2 - s1) AS DOUBLE) * CAST((s2 - s1) AS DOUBLE) "
        "* CAST(n_nodes AS DOUBLE) / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE))"
    )
    return out.select(
        "n_nodes",
        "s1",
        "s2",
        "triangles3",
        "wedges",
        c_obs.alias("transitivity"),
        c_exp.alias("c_expected"),
        (c_obs / c_exp).alias("excess_ratio"),
    )


def degree_entropy(graph: LinkGraph) -> DataFrame:
    """Shannon entropy of the degree distribution — the one-scalar
    heterogeneity summary beside the power-law alpha (uniform-degree
    graphs → 0; heavy-tailed webs → high).

    H = −Σ_k (n_k/n)·ln(n_k/n) = (Σ_k n_k·(ln n − ln n_k)) / n.
    Each ln is pre-rounded to an e8 BIGINT (the Adamic-Adar trick —
    sums of raw libm outputs are NOT engine-stable, pre-rounded integer
    terms are), the weighted sum is exact, and the final entropy is one
    division.  Output: ``[n_nodes, n_distinct_degrees, h_e8_sum,
    entropy]``.
    """
    hist = (
        graph.degrees()
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    tot = hist.agg(F.sum("n_k").cast("long").alias("n"))
    e8ln = lambda c: F.round(F.log(c.cast("double")) * F.lit(100000000.0), 0).cast(
        "long"
    )
    j = hist.crossJoin(F.broadcast(tot))
    terms = j.select(
        "n",
        (F.col("n_k") * (e8ln(F.col("n")) - e8ln(F.col("n_k")))).alias("_term"),
    )
    return terms.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_degrees"),
        F.sum("_term").cast("long").alias("h_e8_sum"),
    ).select(
        F.col("n").alias("n_nodes"),
        "n_distinct_degrees",
        "h_e8_sum",
        (
            F.col("h_e8_sum").cast("double")
            / (F.col("n").cast("double") * F.lit(100000000.0))
        ).alias("entropy"),
    )



def core_periphery(graph: LinkGraph) -> DataFrame:
    """Borgatti–Everett discrete core–periphery split via Lip's exact
    degree-prefix reduction — one row per graph:
    ``[g?, k_star, boundary_degree, z2_min, n_nodes, degree_total]``.

    Order nodes by (degree desc, id asc) and core = the top-k prefix.
    The BE ideal-pattern error count (missing core-core edges plus
    present periphery-periphery edges) reduces to degrees only
    (Lip 2011): with cum(k) = Σ of the top-k degrees and D = Σ degrees,

        Z2(k) = 2·Z(k) = k·(k−1) + D − 2·cum(k).

    Within a same-degree block [a..b] (all nodes of degree d),
    cum(k) is linear so Z2 is a convex parabola with vertex at
    d + 1/2 — the block minimum is at a, b, or the clamped vertex
    neighbors: ≤4 candidate k per DISTINCT degree.  The whole argmin
    therefore runs on the degree histogram (O(#distinct degrees) rows,
    the same bounded frame :func:`rich_club` / :func:`degree_gini`
    window over — never a global sort of the node table), and every
    quantity is an exact BIGINT so the argmin is engine-stable.
    Tie-break: smallest k (the sparsest core among equal-error splits).

    Reference has no core-periphery op; engine addition in the
    rich-club family (same hub-dominance diagnostic surface).
    """
    from pyspark.sql import Window

    g = gcols(graph.edges)
    deg = graph.degrees()
    hist = deg.groupBy(*g, F.col("degree").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.desc("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = hist.select(
        *g,
        "d",
        F.sum("cnt").over(w).cast("long").alias("b"),
        (F.sum("cnt").over(w) - F.col("cnt")+ 1).cast("long").alias("a"),
        (F.sum(F.col("d") * F.col("cnt")).over(w)
         - F.col("d") * F.col("cnt")).cast("long").alias("cum_prev"),
    )
    totals = deg.groupBy(*g).agg(
        F.sum("degree").cast("long").alias("degree_total"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )
    clamp = lambda x: F.greatest(F.col("a"), F.least(F.col("b"), x))
    cand = (
        blocks.select(
            *g, "d", "a", "b", "cum_prev",
            F.array(
                F.col("a"), F.col("b"),
                clamp(F.col("d").cast("long")),
                clamp((F.col("d") + 1).cast("long")),
            ).alias("_ks"),
        )
        .select(*g, "d", "a", "cum_prev", F.explode("_ks").alias("k"))
        .distinct()
    )
    if g:
        z = cand.join(totals, on=g)
    else:
        z = cand.join(F.broadcast(totals))
    z = z.select(
        *g,
        "k",
        F.col("d").alias("boundary_degree"),
        "n_nodes",
        "degree_total",
        (
            F.col("k") * (F.col("k") - 1)
            + F.col("degree_total")
            - 2 * (F.col("cum_prev") + (F.col("k") - F.col("a") + 1) * F.col("d"))
        ).cast("long").alias("z2"),
    )
    zmin = z.groupBy(*g).agg(F.min("z2").alias("_zmin"))
    if g:
        best = z.join(zmin, on=g)
    else:
        best = z.join(F.broadcast(zmin))
    return (
        best.where(F.col("z2") == F.col("_zmin"))
        .groupBy(*g, "z2", "n_nodes", "degree_total")
        .agg(
            F.min("k").cast("long").alias("k_star"),
            F.min_by("boundary_degree", "k").cast("long").alias("boundary_degree"),
        )
        .select(*g, "k_star", "boundary_degree",
                F.col("z2").alias("z2_min"), "n_nodes", "degree_total")
    )


def oddball_ego(graph: LinkGraph) -> DataFrame:
    """OddBall egonet features (Akoglu et al., PAKDD 2010):
    ``[g?, node_id, n_ego, e_ego, tri, density]`` for every node.

    The 1-hop egonet of u has N = deg(u)+1 nodes and E = deg(u) +
    tri(u) edges (each triangle through u contributes exactly one
    neighbor–neighbor edge), so BOTH anomaly axes fall out of tables
    the engine already maintains — no egonet materialization, no
    subgraph extraction: near-stars sit at E ≈ N−1 (tri ≈ 0),
    near-cliques at E ≈ N(N−1)/2.  ``density`` = 2E/(N(N−1)) is one
    IEEE division of exact integers (engine-stable; NULL for isolated
    conventions never arise since degree ≥ 1 on an edge list).
    """
    from dachshund_spark.algorithms.triangles import triangle_counts

    g = gcols(graph.edges)
    deg = graph.degrees()
    tri = triangle_counts(graph)
    n_ego = (F.col("degree") + 1).cast("long")
    e_ego = (F.col("degree") + F.col("triangles")).cast("long")
    return (
        deg.join(tri, on=g + ["node_id"])
        .select(
            *g,
            "node_id",
            n_ego.alias("n_ego"),
            e_ego.alias("e_ego"),
            F.col("triangles").cast("long").alias("tri"),
            (
                F.lit(2.0)
                * e_ego.cast("double")
                / (n_ego.cast("double") * F.col("degree").cast("double"))
            ).alias("density"),
        )
    )


def directed_assortativity(graph: LinkGraph) -> DataFrame:
    """The four directed degree-assortativity modes (Foster et al.,
    PNAS 2010): ``[g?, mode, assortativity]`` with mode ∈ {in-in,
    in-out, out-in, out-out} — Pearson correlation of (α-degree of
    source, β-degree of target) over deduped directed edges.

    Web graphs are famously DISassortative in out-in (hubs link to
    low-in-degree pages) while near-neutral in other modes; the four
    numbers together are the standard fingerprint.  One degrees
    groupBy + two dictionary joins + ONE 13-moment aggregation covers
    all four modes (integer-valued double sums are exact below 2^53,
    so the moments are order-independent and the four correlations are
    scalar expression trees — engine-stable; sqrt is correctly rounded,
    unlike ln/exp).  Degenerate marginals (zero variance) yield NULL.
    """
    g = gcols(graph.edges)
    e = (
        graph.edges.select(*g, "src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    outd = e.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ind = e.groupBy(*g, F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    degs = outd.join(ind, on=g + ["node_id"], how="full").select(
        *g,
        "node_id",
        F.coalesce("outdeg", F.lit(0)).cast("double").alias("outdeg"),
        F.coalesce("indeg", F.lit(0)).cast("double").alias("indeg"),
    )
    ends = e.join(
        degs.select(*g, F.col("node_id").alias("src"),
                    F.col("outdeg").alias("so"), F.col("indeg").alias("si")),
        on=g + ["src"],
    ).join(
        degs.select(*g, F.col("node_id").alias("dst"),
                    F.col("outdeg").alias("do"), F.col("indeg").alias("di")),
        on=g + ["dst"],
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("m")]
    for c in ("si", "so", "di", "do"):
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for a in ("si", "so"):
        for b in ("di", "do"):
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"x_{a}_{b}"))
    mo = ends.groupBy(*g).agg(*aggs) if g else ends.agg(*aggs)

    def r(a: str, b: str) -> F.Column:
        ma = F.col(f"s_{a}") / F.col("m")
        mb = F.col(f"s_{b}") / F.col("m")
        cov = F.col(f"x_{a}_{b}") / F.col("m") - ma * mb
        va = F.col(f"ss_{a}") / F.col("m") - ma * ma
        vb = F.col(f"ss_{b}") / F.col("m") - mb * mb
        return F.when(
            (va > 0.0) & (vb > 0.0), cov / (F.sqrt(va) * F.sqrt(vb))
        )

    modes = F.explode(
        F.array(
            F.struct(F.lit("in-in").alias("mode"), F.round(r("si", "di"), 8).alias("assortativity")),
            F.struct(F.lit("in-out").alias("mode"), F.round(r("si", "do"), 8).alias("assortativity")),
            F.struct(F.lit("out-in").alias("mode"), F.round(r("so", "di"), 8).alias("assortativity")),
            F.struct(F.lit("out-out").alias("mode"), F.round(r("so", "do"), 8).alias("assortativity")),
        )
    )
    return mo.select(*g, modes.alias("_m")).select(
        *g, F.col("_m.mode").alias("mode"),
        F.col("_m.assortativity").alias("assortativity")
    )


def forman_curvature(graph: LinkGraph) -> DataFrame:
    """Augmented Forman-Ricci curvature per canonical edge:
    ``[graph_id?, src, dst, tri, curvature]`` with
    ``curvature = 4 - deg(u) - deg(v) + 3*t(u,v)``.

    The discrete-geometry edge score (Forman 2003; Samal et al. 2018,
    triangle-augmented form): negatively curved edges are community
    *boundaries* (high-degree endpoints, no shared support) and
    positively curved edges sit inside dense cores — the standard
    curvature-based alternative to edge betweenness for locating web
    community seams, at triangle-pass cost instead of Brandes.

    All-integer arithmetic; one degree-oriented triangle enumeration
    (shared with the support/truss family) plus two degree joins — no
    per-node state, no fixpoint, safe at crawl scale.
    """
    from dachshund_spark.algorithms.triangles import triangle_list

    g = gcols(graph.edges)
    canon = graph.canonical_edges()
    tris = triangle_list(graph, persist=False)
    pair = F.explode(
        F.array(
            F.struct(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d")),
            F.struct(F.least("a", "c").alias("s"), F.greatest("a", "c").alias("d")),
            F.struct(F.least("b", "c").alias("s"), F.greatest("b", "c").alias("d")),
        )
    )
    per_edge = (
        tris.select(*g, pair.alias("e"))
        .select(*g, F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .groupBy(*g, "src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    deg = graph.degrees()
    return (
        canon.join(per_edge, on=g + ["src", "dst"], how="left")
        .join(
            deg.select(*g, F.col("node_id").alias("src"),
                       F.col("degree").alias("_du")),
            on=g + ["src"],
        )
        .join(
            deg.select(*g, F.col("node_id").alias("dst"),
                       F.col("degree").alias("_dv")),
            on=g + ["dst"],
        )
        .select(
            *g,
            "src",
            "dst",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            (
                F.lit(4)
                - F.col("_du")
                - F.col("_dv")
                + F.lit(3) * F.coalesce(F.col("tri"), F.lit(0))
            ).cast("long").alias("curvature"),
        )
    )


def erdos_gallai(graph: LinkGraph) -> DataFrame:
    """Erdős–Gallai graphicality constraints of the degree sequence at
    its strong distinct-degree boundaries: ``[g?, k, d, lhs, rhs, ok]``
    with ``lhs = Σ_{i≤k} d_i`` and ``rhs = k(k−1) + Σ_{i>k} min(d_i, k)``.

    The configuration-model pre-check: a non-increasing degree sequence
    is realizable as a simple graph iff Σd is even and lhs ≤ rhs for
    all k — and it suffices to check at boundaries where the degree
    strictly drops AND d_k ≥ k (Zverovich & Zverovich 1992), which is
    exactly the ``d ≥ k`` rows emitted here.  That filter also bounds
    every term: k ≤ d_max, so ``k·(k−1)`` never overflows BIGINT at any
    realistic crawl scale (an unfiltered k ~ n = 10^10 would).

    Sort-free: both prefix sums are window cumsums over the degree
    HISTOGRAM (O(#distinct degrees) rows — the exact_quantiles /
    degree_gini machinery), and the min(d_i, k) tail is a histogram ×
    boundaries broadcast range join, never a pass over nodes.
    """
    from pyspark.sql import Window

    g = gcols(graph.edges)
    deg = graph.degrees()
    hist = deg.groupBy(*g, F.col("degree").alias("val")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(F.desc("val"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bounds = hist.select(
        *g,
        F.col("val").alias("d"),
        F.sum("cnt").over(w).cast("long").alias("k"),
        F.sum(F.col("val") * F.col("cnt")).over(w).cast("long").alias("lhs"),
    ).where(F.col("d") >= F.col("k"))
    h2 = hist.select(
        *[F.col(c).alias(f"_h_{c}") for c in g],
        F.col("val").alias("_hval"),
        F.col("cnt").alias("_hcnt"),
    )
    cond = F.col("_hval") < F.col("d")
    for c in g:
        cond = cond & (F.col(c) == F.col(f"_h_{c}"))
    tail = (
        bounds.join(F.broadcast(h2), on=cond, how="left")
        .groupBy(*g, "d", "k", "lhs")
        .agg(
            F.coalesce(
                F.sum(F.col("_hcnt") * F.least(F.col("_hval"), F.col("k"))),
                F.lit(0),
            )
            .cast("long")
            .alias("_tail")
        )
    )
    return tail.select(
        *g,
        "k",
        "d",
        "lhs",
        (F.col("k") * (F.col("k") - 1) + F.col("_tail")).cast("long").alias("rhs"),
        (
            F.col("lhs") <= F.col("k") * (F.col("k") - 1) + F.col("_tail")
        ).alias("ok"),
    )


def degree_centralization(graph: LinkGraph) -> DataFrame:
    """Freeman degree centralization: ``[g?, n_nodes, max_degree,
    cent_num, cent_den, centralization]`` with
    ``C = Σᵥ(d_max − d_v) / ((n−1)(n−2))`` — the classic 0-to-1 dial
    from ring lattice (0) to star (1): how hub-dominated is the graph
    as a WHOLE, complementing the per-node degree table.

    Exact integer numerator/denominator (one aggregation over the
    degree table), single engine-stable division; degenerate n ≤ 2
    yields NULL.
    """
    g = gcols(graph.edges)
    deg = graph.degrees()
    agg = [
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("degree").cast("long").alias("max_degree"),
        F.sum("degree").cast("long").alias("_sum_deg"),
    ]
    mo = deg.groupBy(*g).agg(*agg) if g else deg.agg(*agg)
    num = (F.col("n_nodes") * F.col("max_degree") - F.col("_sum_deg")).cast(
        "long"
    )
    den = ((F.col("n_nodes") - 1) * (F.col("n_nodes") - 2)).cast("long")
    return mo.select(
        *g,
        "n_nodes",
        "max_degree",
        num.alias("cent_num"),
        den.alias("cent_den"),
        F.when(
            F.col("n_nodes") > 2, num.cast("double") / den.cast("double")
        ).alias("centralization"),
    )
