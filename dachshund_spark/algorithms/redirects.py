"""Redirect-chain resolution by pointer doubling.

A crawl frontier is full of 3xx hops: url -> url redirects form a
functional graph (at most one outgoing pointer per node).  Resolving
every chain to its terminal url is the canonical pre-step before edge
extraction and PageRank — otherwise rank mass parks on vanity/shortener
urls instead of the canonical page.  Dachshund has no redirect layer
(its loaders assume resolved ids, /root/reference/src/dachshund/
simple_transformer.rs:27-52); this is engine polish for the web tier.

Pointer doubling (a.k.a. path halving): each round every unresolved
node replaces its pointer with its pointer's pointer, so chain distance
halves — a length-L chain resolves in ceil(log2 L) + 1 supersteps
instead of L sequential lookups.  Each superstep is ONE equi-join of
the state against itself on ``ptr = node`` (shuffle on the pointer
key); hop counts compose additively under doubling, so the output
carries the exact original chain length without ever walking it
step-by-step.

Redirect *loops* (a -> b -> a) never reach a terminal; after the round
budget they are flagged ``is_loop`` instead of looping forever — the
crawler drops them.  Everything is deterministic: fixed rounds replay
exactly in SQL (see ``_redirects_sql`` in ``__spark_entry__``).

Scale notes: state has one row per *redirecting* url (3xx sources only,
a small slice of the corpus).  The self-join key ``ptr`` skews toward
popular terminal targets, but rows whose pointer hits NO state row
(already-terminal pointers) resolve via the left join's null branch and
drop out of subsequent rounds' shuffle — the hot keys disappear after
round one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.checkpoint import CheckpointManager
from dachshund_spark.iterate import run_fixpoint
from dachshund_spark.util import gcols


def resolve_redirects(
    redirects: DataFrame,
    *,
    max_rounds: int = 16,
    manager: CheckpointManager | None = None,
    resume: bool = True,
) -> DataFrame:
    """Resolve every redirect chain to its terminal target.

    ``redirects`` is a functional edge table ``[graph_id?, src, dst]``
    — at most one row per src (one Location header per url).  Returns
    ``[graph_id?, src, final, hops, is_loop]`` with one row per
    redirecting src: ``final`` is the first non-redirecting url reached
    (or the last pointer inspected when the chain is a loop),
    ``hops`` the exact number of redirects followed, and ``is_loop``
    true when the chain never terminates within ``2**max_rounds`` hops.

    ``max_rounds`` supersteps resolve chains up to ``2**max_rounds``
    long — 16 rounds covers 65k-hop chains, far beyond any crawler's
    follow limit.
    """
    g = gcols(redirects)
    state0 = redirects.select(
        *g,
        F.col("src").alias("node"),
        F.col("dst").alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
        F.lit(False).alias("done"),
    )

    def step(state: DataFrame, superstep: int) -> DataFrame:
        nxt = state.select(
            *g,
            F.col("node").alias("ptr"),
            F.col("ptr").alias("nxt_ptr"),
            F.col("hops").alias("nxt_hops"),
            F.col("done").alias("nxt_done"),
        )
        # pending rows jump to their pointer's pointer; a pointer with
        # no state row is a terminal url -> done this round
        return (
            state.join(nxt, on=g + ["ptr"], how="left")
            .select(
                *g,
                "node",
                F.when(F.col("done") | F.col("nxt_ptr").isNull(), F.col("ptr"))
                .otherwise(F.col("nxt_ptr"))
                .alias("ptr"),
                F.when(F.col("done") | F.col("nxt_ptr").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("nxt_hops"))
                .alias("hops"),
                (
                    F.col("done")
                    | F.col("nxt_ptr").isNull()
                    | F.coalesce(F.col("nxt_done"), F.lit(False))
                ).alias("done"),
            )
        )

    def converged(prev: DataFrame, new: DataFrame) -> tuple[bool, dict]:
        pending = new.where(~F.col("done")).count()
        return pending == 0, {"pending": pending}

    final, _ = run_fixpoint(
        state0,
        step,
        converged=converged,
        max_iterations=max_rounds,
        manager=manager,
        resume=resume,
    )
    return final.select(
        *g,
        F.col("node").alias("src"),
        F.col("ptr").alias("final"),
        "hops",
        (~F.col("done")).alias("is_loop"),
    )
