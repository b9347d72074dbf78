"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

GRAPH_ID = "graph_id"


def gcols(df: DataFrame) -> list[str]:
    """Grouping prefix: [`graph_id`] when the frame is multi-graph.

    The reference processes one graph per batch keyed by graph_id
    (/root/reference/src/dachshund/transformer_base.rs:58-77); we keep
    the key as an ordinary column so every join/agg is per-graph when
    present and zero-overhead when absent (single web graph).
    """
    return [GRAPH_ID] if GRAPH_ID in df.columns else []
