"""Reference-compatible TSV I/O.

Input formats of the reference binaries:
- simple 3-col ``graph_key\\tsrc\\tdst`` (line_processor.rs:28-40) —
  arbitrary string graph keys are remapped to dense i64 ids in
  first-seen order (:49-59); distributed remap uses the *minimum input
  line number* per key as the order criterion so it is deterministic
  regardless of partitioning.
- typed 6-col ``graph_id\\tcore\\tnon_core\\tcore_type\\tedge_type\\t
  non_core_type`` (typed_graph_line_processor.rs:28-43); rows with
  empty cols 4-6 are clique-seed rows ``graph_id\\tnode\\tnode_type``
  (:44-83).

Output formats:
- ``as_input_rows``: each undirected edge once with src < dst
  (simple_undirected_graph.rs:81-96)
- miner wide row: counts + JSON arrays + densities
  (candidate.rs:264-304), long format (candidate.rs:332-359)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dachshund_spark.graph import LinkGraph


def read_simple_tsv(
    spark: SparkSession, path: str, parity_order: bool = False
) -> DataFrame:
    """3-col TSV → edges [graph_id, src, dst] with dense graph ids.

    Dense graph ids follow first-seen order of the graph key.  The
    default order criterion is (file name, monotonically_increasing_id),
    which is deterministic for single-split files (sorted by name) but
    can deviate from strict line order when one file is read as
    multiple splits — the split-to-partition assignment is planner
    territory.  Pass ``parity_order=True`` to force a single input
    partition and get the reference's exact sequential first-seen
    numbering (line_processor.rs:49-59); only use it for parity runs on
    small inputs, since it serializes the read.
    """
    text = spark.read.text(path)
    if parity_order:
        text = text.coalesce(1)
    raw = (
        text
        .select(
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_line"),
            F.split(F.rtrim(F.col("value")), "\t").alias("c"),
        )
        .select(
            "_file",
            "_line",
            F.col("c")[0].alias("graph_key"),
            F.col("c")[1].cast("long").alias("src"),
            F.col("c")[2].cast("long").alias("dst"),
        )
    )
    first_seen = raw.groupBy("graph_key").agg(
        F.min(F.struct("_file", "_line")).alias("_first")
    )
    # Global window over DISTINCT graph keys only (not edge rows): the
    # reference's remap is sequential by first appearance
    # (line_processor.rs:49-59), so the dense numbering is inherently
    # order-serial.  Bounded by the graph-batch count of one TSV input
    # (CLI fixture scale); the web-graph ingestion path
    # (pages_to_edges) never goes through here.
    w = Window.orderBy("_first")
    keys = first_seen.withColumn(
        "graph_id", (F.dense_rank().over(w) - 1).cast("long")
    ).select("graph_key", "graph_id")
    return (
        raw.join(F.broadcast(keys), "graph_key")
        .select("graph_id", "src", "dst")
    )


def read_typed_tsv(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """6-col TSV → (typed_edges, seed_rows).

    typed_edges: [graph_id, core_id, non_core_id, core_type, edge_type,
    non_core_type]; seed_rows: [graph_id, node_id, node_type] for lines
    whose cols 4-6 are empty."""
    raw = spark.read.text(path).select(F.split(F.col("value"), "\t").alias("c"))
    parsed = raw.select(
        F.col("c")[0].cast("long").alias("graph_id"),
        F.col("c")[1].cast("long").alias("core_id"),
        F.col("c")[2].alias("col2"),
        F.col("c")[3].alias("core_type"),
        F.col("c")[4].alias("edge_type"),
        F.col("c")[5].alias("non_core_type"),
    )
    is_seed = (
        (F.col("core_type") == "") & (F.col("edge_type") == "")
        & (F.col("non_core_type") == "")
    ) | F.col("edge_type").isNull()
    edges = parsed.where(~is_seed).select(
        "graph_id",
        "core_id",
        F.col("col2").cast("long").alias("non_core_id"),
        "core_type",
        "edge_type",
        "non_core_type",
    )
    seeds = parsed.where(is_seed).select(
        "graph_id",
        F.col("core_id").alias("node_id"),
        F.col("col2").alias("node_type"),
    )
    return edges, seeds


def graph_to_tsv_rows(graph: LinkGraph, graph_key: str = "0") -> DataFrame:
    """Serialize a graph back to 3-col TSV lines (each undirected edge
    once, src < dst — simple_undirected_graph.rs:81-96)."""
    can = graph.canonical_edges()
    return can.select(
        F.concat_ws("\t", F.lit(graph_key), F.col("src"), F.col("dst")).alias("value")
    )


def miner_result_wide_rows(results: DataFrame) -> DataFrame:
    """Miner results → the reference's wide TSV line per clique
    (candidate.rs:264-304): graph_id, |core|, |non_core|, [cores],
    [non_cores], [types], cliqueness, [core densities], [type densities].

    Requires the extended result frame from
    :func:`dachshund_spark.clique.miner.mine_cliques_detailed`.
    """
    return results.select(
        F.concat_ws(
            "\t",
            F.col("graph_id"),
            F.size("core_ids"),
            F.size("non_core_ids"),
            F.to_json("core_ids"),
            F.to_json("non_core_ids"),
            F.to_json("non_core_types"),
            F.col("cliqueness"),
            F.to_json("core_densities"),
            F.to_json("non_core_densities"),
        ).alias("value")
    )


def miner_result_long_rows(results: DataFrame, core_type: str) -> DataFrame:
    """Long format: one ``graph_id\\tnode_id\\ttype`` line per member
    (candidate.rs:332-359), cores first in sorted order."""
    cores = results.select(
        "graph_id",
        F.explode("core_ids").alias("node_id"),
        F.lit(core_type).alias("node_type"),
    )
    non_cores = results.select(
        "graph_id",
        F.explode(F.arrays_zip("non_core_ids", "non_core_types")).alias("z"),
    ).select(
        "graph_id",
        F.col("z.non_core_ids").alias("node_id"),
        F.col("z.non_core_types").alias("node_type"),
    )
    return cores.union(non_cores).select(
        F.concat_ws("\t", "graph_id", "node_id", "node_type").alias("value")
    )
