"""CSR-style bucketed adjacency tables.

At web scale every iterative superstep joins the (huge, static) edge
table on ``src``.  Written as a plain parquet file, that join reshuffles
the edges EVERY superstep — the dominant cost of PageRank/CC/LPA runs.
Writing the edge table once with ``bucketBy(N, "src").sortBy("src",
"dst")`` is the Spark analog of a CSR adjacency layout:

- rows are hash-clustered by src into N physical buckets (the CSR row
  partition) and sorted by (src, dst) within each bucket (the CSR
  column index order),
- any join or aggregation keyed on ``src`` reads the bucket layout as
  its partitioning — the planner drops the edges-side Exchange, so a
  10-superstep PageRank shuffles only the (tiny) rank state per
  superstep, never the edges.

Bucket metadata lives in the session catalog (Hive metastore or
Iceberg's bucket-transform partitioning on a real deployment; the
sandbox uses the in-memory catalog, so tables must be re-registered
per session via :func:`register_bucketed_edges`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dachshund_spark.graph import LinkGraph


def write_bucketed_edges(
    edges: DataFrame,
    table_name: str,
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist an edge table bucketed+sorted by src (CSR layout).

    ``path`` makes it an external table (required under the sandbox's
    in-memory catalog if you want the files to outlive the session).
    """
    writer = (
        edges.write.mode(mode)
        .bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def register_bucketed_edges(
    spark: SparkSession,
    table_name: str,
    path: str,
    num_buckets: int,
    schema: str = "src LONG, dst LONG",
) -> None:
    """Re-attach an existing bucketed parquet dir to a fresh session's
    catalog (the in-memory catalog forgets tables between sessions)."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    spark.sql(
        f"CREATE TABLE {table_name} ({schema}) USING parquet "
        f"OPTIONS (path '{path}') "
        f"CLUSTERED BY (src) SORTED BY (src, dst) INTO {num_buckets} BUCKETS"
    )


def bucketed_graph(spark: SparkSession, table_name: str) -> LinkGraph:
    """LinkGraph over a bucketed edge table; pass the result to
    iterative ops with ``dedupe_edges=False`` so the superstep plan
    keeps the bucket partitioning (a ``.distinct()`` re-partitions and
    forfeits the layout).

    ``cache_edges`` composes with bucketing: persisting the bucketed
    scan PRESERVES its hash-partitioning (InMemoryTableScan reuses the
    cached plan's outputPartitioning — verified by a zero-Exchange plan
    test), so ``cache_edges=True`` gives no-shuffle AND no re-scan per
    superstep when the table fits cluster RAM; at 100 TB leave it False
    and the per-superstep parquet re-read is still Exchange-free."""
    return LinkGraph(spark.table(table_name))


def morton_key(src, dst, bits: int = 16):
    """Z-order (Morton) interleave of the low ``bits`` bits of src and
    dst — the locality-preserving 2-D sort key for edge-table layout.

    Sorting/bucketing edges by this key tiles the adjacency matrix:
    any contiguous key range touches a bounded square of (src, dst)
    space, so range scans stay local in BOTH dimensions — the layout
    trick behind WebGraph tiles and Delta/Iceberg Z-ORDER clustering.
    Pure integer column algebra (codegen, oracle-replayable)."""
    s = F.col(src) if isinstance(src, str) else src
    d = F.col(dst) if isinstance(dst, str) else dst
    key = F.lit(0).cast("long")
    for i in range(int(bits)):
        key = key + F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        key = key + F.shiftleft(F.shiftright(d, i).bitwiseAND(F.lit(1)), 2 * i)
    return key


def zorder_layout_stats(edges, bits: int = 16, bucket_bits: int = 8):
    """Per-bucket locality profile of the Z-ordered edge table:
    ``[bucket, n_edges, n_src, n_dst]`` for the top-``bucket_bits``
    Morton buckets. Each bucket is a 2-D tile, so n_src/n_dst stay
    bounded by the tile side — the measurable locality win over
    src-only layouts (whose dst spread is unbounded)."""
    key = morton_key("src", "dst", bits=bits)
    b = F.shiftright(key, 2 * bits - bucket_bits).alias("bucket")
    return (
        edges.select(b, "src", "dst")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("src").cast("long").alias("n_src"),
            F.countDistinct("dst").cast("long").alias("n_dst"),
        )
    )


def hilbert_key_frame(edges, bits: int = 10):
    """Edge table with a ``hilbert`` column: the Hilbert-curve index of
    (src, dst) over the low ``bits`` bits of each endpoint.

    The Hilbert curve is the strictly better space-filling layout than
    Morton: consecutive keys are always ADJACENT cells (no Z-jumps
    across tile boundaries), so a contiguous key range touches an even
    tighter (src, dst) square — the difference matters exactly at the
    range-scan boundaries a clustered 100 TB edge table serves.  The
    classic iterative xy→d fold (rotate-and-reflect per bit level,
    Hamilton's convention) is unrolled here into ``bits`` chained
    integer projections — pure codegen column algebra, no UDF, and the
    identical CASE chain replays in SQL.
    """
    df = edges.select(
        "src",
        "dst",
        F.col("src").bitwiseAND(F.lit((1 << bits) - 1)).alias("_x"),
        F.col("dst").bitwiseAND(F.lit((1 << bits) - 1)).alias("_y"),
        F.lit(0).cast("long").alias("_d"),
    )
    for i in range(int(bits) - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_x"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_y"), i).bitwiseAND(F.lit(1))
        refl = (ry == 0) & (rx == 1)
        tx = F.when(refl, F.lit(s - 1) - F.col("_x")).otherwise(F.col("_x"))
        ty = F.when(refl, F.lit(s - 1) - F.col("_y")).otherwise(F.col("_y"))
        df = df.select(
            "src",
            "dst",
            F.when(ry == 0, ty).otherwise(tx).alias("_x"),
            F.when(ry == 0, tx).otherwise(ty).alias("_y"),
            (
                F.col("_d")
                + F.lit(s)
                * F.lit(s)
                * (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
            ).alias("_d"),
        )
    return df.select("src", "dst", F.col("_d").alias("hilbert"))


def hilbert_layout_stats(edges, bits: int = 10, bucket_bits: int = 6):
    """Per-bucket locality profile of the Hilbert-ordered edge table:
    ``[bucket, n_edges, n_src, n_dst]`` — the zorder_layout_stats
    companion for the curve without Z-jumps."""
    keyed = hilbert_key_frame(edges, bits=bits)
    return (
        keyed.select(
            F.shiftright(F.col("hilbert"), 2 * bits - bucket_bits).alias("bucket"),
            "src",
            "dst",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("src").cast("long").alias("n_src"),
            F.countDistinct("dst").cast("long").alias("n_dst"),
        )
    )
