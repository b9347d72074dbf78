"""Skew handling: explicit salting + two-phase aggregation.

Web graphs are power-law: a handful of hub urls receive a large share
of all in-links, so any ``groupBy(dst)`` concentrates their messages on
one reducer.  Spark's hash aggregate already performs map-side partial
aggregation (phase 1 per input partition, phase 2 after the shuffle),
which covers algebraic aggregates like sum/count; the explicit salted
path below additionally bounds the *reduce-side* key width when a
single key's partials still dominate (e.g. when upstream is a join that
re-expands the key), and is the documented strategy required by the
north rule ("two-phase aggregation and explicit salting").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT = "_salt"


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    out: str,
    num_salts: int = 16,
    hub_flag: str | Column | None = None,
) -> DataFrame:
    """Two-phase sum: partial sum per (key, salt), final sum per key.

    Exactly equivalent to ``df.groupBy(keys).agg(sum(value))`` — the
    equivalence is unit-tested — but the first shuffle spreads each hot
    key over ``num_salts`` reducers.

    ``hub_flag`` (a boolean column of ``df``, e.g. pre-joined from
    :func:`top_degree_hubs` ONCE into a static table) routes only hot
    keys through the salted path; the long tail keeps salt 0 and
    aggregates in a single pass — degree-aware routing that avoids
    inflating the reduce key space ``num_salts``-fold for the (vast)
    majority of cold keys.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    if hub_flag is not None:
        flag = F.col(hub_flag) if isinstance(hub_flag, str) else hub_flag
        salt = F.when(flag, salt).otherwise(F.lit(0).cast("long"))
    salted = df.withColumn(SALT, salt)
    partial = salted.groupBy(*keys, SALT).agg(F.sum(value_col).alias(out))
    return partial.groupBy(*keys).agg(F.sum(out).alias(out))


def salted_count(
    df: DataFrame,
    keys: list[str],
    out: str,
    num_salts: int = 16,
    hub_flag: str | Column | None = None,
) -> DataFrame:
    """Two-phase count per key — the count twin of :func:`salted_sum`,
    with the same degree-aware ``hub_flag`` routing (cold keys keep
    salt 0 and pay no reduce-key blowup)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    if hub_flag is not None:
        flag = F.col(hub_flag) if isinstance(hub_flag, str) else hub_flag
        salt = F.when(flag, salt).otherwise(F.lit(0).cast("long"))
    salted = df.withColumn(SALT, salt)
    partial = salted.groupBy(*keys, SALT).agg(F.count("*").alias(out))
    return partial.groupBy(*keys).agg(F.sum(out).alias(out))


def top_degree_hubs(degrees: DataFrame, threshold: int) -> DataFrame:
    """Degree-aware hub id set (broadcastable) for routing decisions.
    Keeps every key column of ``degrees`` except the degree itself
    (multi-graph frames carry graph_id through)."""
    keep = [c for c in degrees.columns if c != "degree"]
    return degrees.where(F.col("degree") >= threshold).select(*keep)


def sample_edges_per_node(
    edges: DataFrame,
    k: int,
    seed: int = 42,
    key: str = "src",
) -> DataFrame:
    """Deterministic uniform-without-replacement sample of ≤ ``k``
    out-edges per node: md5(seed, src, dst) ranks each node's edges in
    a pseudo-random but reproducible order and keeps the first k.

    The standard degree-capping primitive (walk starts, neighbor
    subsampling à la GraphSAGE, debug slices of a hub's 10^6 edges)
    — deterministic across runs/engines, unlike ``rand()``.  One
    window per ``key`` partition: O(deg log deg) per node, no
    collect_list blowup; the output keeps ``sample_rank`` (1-based) so
    callers can take nested prefixes (rank ≤ j for any j ≤ k) without
    resampling.
    """
    from pyspark.sql import Window

    from dachshund_spark.util import gcols

    order = F.md5(
        F.concat_ws("|", F.lit(int(seed)), F.col("src"), F.col("dst"))
    )
    # partition by (graph_id?, key): a multi-graph frame must get a
    # full k-cap PER GRAPH, not one pooled cap per node id
    w = Window.partitionBy(*gcols(edges), key).orderBy(order, "src", "dst")
    return (
        edges.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= F.lit(int(k)))
    )


def khop_neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (4, 4),
    seed: int = 42,
) -> DataFrame:
    """GraphSAGE-style minibatch sampling: per-hop capped neighbor
    expansion from a seed set. Returns [g?, hop, src, dst] — the union
    of sampled edges per hop; the hop-(h+1) frontier is the distinct
    dst set of hop h.

    Node-wise sampling (the GraphSAGE estimator): each frontier node's
    out-edges are capped once per hop via the deterministic md5 rank
    of :func:`sample_edges_per_node` (hop h uses ``seed·31 + h`` so
    hops draw independent samples). Work per hop is
    O(frontier-adjacency), never O(seeds × degree) — a hub shared by
    a million seeds is still sampled once — and the frontier semi-join
    prunes the edge scan before the rank window runs.
    """
    from dachshund_spark.util import gcols

    g = gcols(edges)
    seed_col = [c for c in seeds.columns if c not in g][0]
    frontier = seeds.select(*g, F.col(seed_col).alias("src")).distinct()
    out = None
    for h, k in enumerate(fanouts, start=1):
        hop_edges = edges.join(frontier, on=g + ["src"], how="left_semi")
        sampled = sample_edges_per_node(hop_edges, k=k, seed=seed * 31 + h).select(
            *g, F.lit(h).alias("hop"), "src", "dst"
        )
        out = sampled if out is None else out.unionByName(sampled)
        frontier = sampled.select(*g, F.col("dst").alias("src")).distinct()
    return out
