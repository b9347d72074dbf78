"""SCAN structural clustering (Xu et al., KDD 2007).

Clusters a graph by *structural similarity* instead of raw modularity:
σ(u,v) = |Γ(u)∩Γ(v)| / sqrt(|Γ(u)|·|Γ(v)|) over closed neighborhoods,
so for an edge (u,v) with t common (open) neighbors and degrees du, dv:
σ = (t + 2) / sqrt((du+1)(dv+1)).  A node is a *core* when at least
``mu`` members of its closed neighborhood (itself included) pass
σ ≥ ε; clusters are the connected components of the core-core ε-edges;
non-core nodes ε-adjacent to a core join that core's cluster as
*border* nodes; the rest are *hubs* (plain-adjacent to ≥2 clusters) or
*outliers*.

The reference has no community operator beyond CNM modularity
(/root/reference/src/dachshund/algorithms/cnm_communities.rs); SCAN is
the web-native complement — it isolates hubs and spam bridges instead
of absorbing them, which is exactly what link-farm analysis wants.

Exactness: ε is a rational eps_num/eps_den and the σ ≥ ε test is the
cross-multiplied integer comparison
  ((t+2)·eps_den)² ≥ (eps_num·(du+1))·(eps_num·(dv+1))
computed in decimal(38,0) so full-range degrees can't overflow under
ANSI mode — bit-identical in any engine, no sqrt anywhere.

Scale shape: one triangle enumeration (degree-oriented, O(m^1.5)
shuffle-optimal), one degree join, a hash-min CC fixpoint restricted
to core ε-edges (strictly smaller than the input graph), and two
label-assignment joins.  No collects, no windows over unbounded
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.algorithms.components import connected_components
from dachshund_spark.algorithms.triangles import triangle_list
from dachshund_spark.graph import LinkGraph
from dachshund_spark.util import gcols


def edge_similarity(
    graph: LinkGraph, *, eps_num: int = 1, eps_den: int = 2
) -> DataFrame:
    """Canonical edges with triangle support and the ε-test verdict:
    ``[graph_id?, src, dst, support, eps_ok]``."""
    canon = graph.canonical_edges()
    g = gcols(canon)
    tris = triangle_list(graph, persist=False)
    pair = F.explode(
        F.array(
            F.struct(
                F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d")
            ),
            F.struct(
                F.least("a", "c").alias("s"), F.greatest("a", "c").alias("d")
            ),
            F.struct(
                F.least("b", "c").alias("s"), F.greatest("b", "c").alias("d")
            ),
        )
    )
    supp = (
        tris.select(*g, pair.alias("e"))
        .select(*g, F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .groupBy(*g, "src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    deg = graph.degrees()
    e = (
        canon.join(supp, on=g + ["src", "dst"], how="left")
        .withColumn("support", F.coalesce("support", F.lit(0)))
        .join(
            deg.select(*g, F.col("node_id").alias("src"), F.col("degree").alias("_du")),
            on=g + ["src"],
        )
        .join(
            deg.select(*g, F.col("node_id").alias("dst"), F.col("degree").alias("_dv")),
            on=g + ["dst"],
        )
    )
    lhs = ((F.col("support") + 2) * F.lit(int(eps_den))).cast("decimal(19,0)")
    rhs_u = (F.lit(int(eps_num)) * (F.col("_du") + 1)).cast("decimal(19,0)")
    rhs_v = (F.lit(int(eps_num)) * (F.col("_dv") + 1)).cast("decimal(19,0)")
    return e.select(
        *g,
        "src",
        "dst",
        "support",
        (lhs * lhs >= rhs_u * rhs_v).alias("eps_ok"),
    )


def scan_clusters(
    graph: LinkGraph,
    *,
    eps_num: int = 1,
    eps_den: int = 2,
    mu: int = 3,
    max_iterations: int = 50,
) -> DataFrame:
    """Per-node SCAN labels: ``[graph_id?, node_id, cluster, role]``.

    ``cluster`` is the smallest core node id of the cluster (NULL for
    hubs/outliers); ``role`` ∈ {core, border, hub, outlier}.  Border
    nodes ε-adjacent to several clusters take the smallest cluster
    label (deterministic stand-in for SCAN's arbitrary choice).
    """
    nodes = graph.nodes()
    g = gcols(nodes)
    eps_edges = (
        edge_similarity(graph, eps_num=eps_num, eps_den=eps_den)
        .where(F.col("eps_ok"))
        .select(*g, "src", "dst")
        .persist()
    )
    eps_sym = eps_edges.unionByName(
        eps_edges.select(
            *g, F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    # |N_ε(v)| = 1 (self: σ(v,v)=1 ≥ ε always) + passing neighbors
    eps_counts = eps_sym.groupBy(*g, F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("_k")
    )
    core = (
        nodes.join(eps_counts, on=g + ["node_id"], how="left")
        .where(F.coalesce("_k", F.lit(0)) + 1 >= F.lit(int(mu)))
        .select(*g, "node_id")
        .persist()
    )
    core_edges = eps_edges.join(
        core.withColumnRenamed("node_id", "src"), on=g + ["src"], how="left_semi"
    ).join(core.withColumnRenamed("node_id", "dst"), on=g + ["dst"], how="left_semi")
    comp = connected_components(
        LinkGraph(core_edges.select(*g, "src", "dst")),
        renumber=False,
        nodes=core,
        max_iterations=max_iterations,
    ).select(*g, "node_id", F.col("component").alias("cluster"))
    border = (
        eps_sym.join(
            core.withColumnRenamed("node_id", "src"),
            on=g + ["src"],
            how="left_anti",
        )
        .join(
            comp.select(*g, F.col("node_id").alias("dst"), "cluster"),
            on=g + ["dst"],
        )
        .groupBy(*g, F.col("src").alias("node_id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = comp.select(*g, "node_id", "cluster", F.lit("core").alias("role")).unionByName(
        border.select(*g, "node_id", "cluster", F.lit("border").alias("role"))
    )
    und = graph.undirected_edges()
    nbr_clusters = (
        und.join(
            assigned.select(*g, F.col("node_id").alias("dst"), "cluster"),
            on=g + ["dst"],
        )
        .groupBy(*g, F.col("src").alias("node_id"))
        .agg(F.countDistinct("cluster").alias("_nc"))
    )
    rest = (
        nodes.join(assigned, on=g + ["node_id"], how="left_anti")
        .join(nbr_clusters, on=g + ["node_id"], how="left")
        .select(
            *g,
            "node_id",
            F.lit(None).cast("long").alias("cluster"),
            F.when(F.coalesce("_nc", F.lit(0)) >= 2, F.lit("hub"))
            .otherwise(F.lit("outlier"))
            .alias("role"),
        )
    )
    return assigned.unionByName(rest)
