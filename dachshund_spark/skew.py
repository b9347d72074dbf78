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
) -> DataFrame:
    """Two-phase sum: partial sum per (key, salt), final sum per key.

    Exactly equivalent to ``df.groupBy(keys).agg(sum(value))`` — the
    equivalence is unit-tested — but the first shuffle spreads each hot
    key over ``num_salts`` reducers.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, SALT).agg(F.sum(value_col).alias(out))
    return partial.groupBy(*keys).agg(F.sum(out).alias(out))


def salted_count(df: DataFrame, keys: list[str], out: str, num_salts: int = 16) -> DataFrame:
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, SALT).agg(F.count("*").alias(out))
    return partial.groupBy(*keys).agg(F.sum(out).alias(out))


def top_degree_hubs(degrees: DataFrame, threshold: int) -> DataFrame:
    """Degree-aware hub id set (broadcastable) for routing decisions."""
    return degrees.where(F.col("degree") >= threshold).select("node_id")
