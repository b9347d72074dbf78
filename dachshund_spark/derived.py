"""Derived edge table over the driver-provided TPC-H-ish parquet.

The driver's correctness gate compares our Spark queries against DuckDB
oracles on the tables under ``/root/testdata/sf*``.  The graph queries
all run over one canonical derived edge table so the Spark and SQL
sides are trivially aligned:

    edges(src, dst) = (l_orderkey % N, l_partkey % N) from lineitem

This produces a dense pseudo-random directed multigraph (~60k edges on
1024 nodes at sf 0.01, diameter 2-3) — good for exercising joins,
aggregations, and fixpoint convergence in few supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dachshund_spark.graph import LinkGraph

N_NODES = 1024

EDGES_SQL = f"SELECT l_orderkey % {N_NODES} AS src, l_partkey % {N_NODES} AS dst FROM lineitem WHERE l_orderkey % {N_NODES} <> l_partkey % {N_NODES}"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        (F.col("l_orderkey") % N_NODES).alias("src"),
        (F.col("l_partkey") % N_NODES).alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst"))


def derived_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    return LinkGraph(derived_edges(spark, sf_dir))
