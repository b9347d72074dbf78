"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GRAPH_ID = "graph_id"


def hinted(df: DataFrame, join_hint: str | None) -> DataFrame:
    """Apply an explicit join-side strategy for superstep joins.

    - None ("auto"): let Catalyst/AQE pick — right default for
      correctness runs.
    - "broadcast": small-state graphs (state ≪ executor memory); kills
      the per-superstep sort/shuffle entirely.
    - "shuffle_hash": web-scale states that don't fit a broadcast —
      hash join against pre-partitioned edges without sorting the big
      side every superstep.
    """
    if join_hint == "broadcast":
        return F.broadcast(df)
    if join_hint == "shuffle_hash":
        return df.hint("shuffle_hash")
    return df


def gcols(df: DataFrame) -> list[str]:
    """Grouping prefix: [`graph_id`] when the frame is multi-graph.

    The reference processes one graph per batch keyed by graph_id
    (/root/reference/src/dachshund/transformer_base.rs:58-77); we keep
    the key as an ordinary column so every join/agg is per-graph when
    present and zero-overhead when absent (single web graph).
    """
    return [GRAPH_ID] if GRAPH_ID in df.columns else []
