"""Driver-side fixpoint loop shared by all iterative algorithms.

Spark has no native fixpoint operator, so PageRank / hash-min CC /
LPA / peeling loops all run supersteps from the driver.  Design rules
learned the hard way (and enforced here):

1. **Materialize every superstep.** Step plans reference the previous
   state more than once (self-join + union, contribution + dangling
   scan, …); left lazy, the expanded plan — and the work — doubles per
   superstep.  ``localCheckpoint(eager=True)`` after every step keeps
   each superstep O(1) jobs and truncates lineage (no analysis blowup,
   no stack overflow at 50+ supersteps).
2. **Convergence checks run on materialized frames.** ``step_fn`` must
   build plans only; the optional ``converged(prev, new) -> (done,
   metrics)`` callback runs after materialization, so its actions scan
   cached data instead of recomputing the superstep.
3. **Durable resume.** With a :class:`~dachshund_spark.checkpoint.
   CheckpointManager`, the state is additionally committed to parquet
   snapshots every ``durable_checkpoint_every`` supersteps; a killed
   run resumes from the last committed snapshot.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from dachshund_spark.checkpoint import CheckpointManager


def _stats_barrier(df: DataFrame) -> DataFrame:
    """Reset Catalyst size estimates on a checkpointed frame.

    ``localCheckpoint`` copies the origin plan's size-in-bytes estimate
    into the new LogicalRDD (``LogicalRDD.rewriteStatsAndConstraints``),
    and join estimates are PRODUCTS of their inputs — so a superstep
    that references the state more than once compounds the estimate
    multiplicatively every iteration.  The estimate is a BigInt: its
    digit count grows geometrically, and after ~10 supersteps the
    driver burns minutes per superstep on Toom-Cook multiplication of
    million-digit integers inside stats propagation (observed first on
    the trussness fixpoint; jstack showed 100% driver CPU in
    ``SizeInBytesOnlyStatsPlanVisitor`` / ``BigInteger.multiply``).

    Rebuilding the frame from the already-materialized InternalRow RDD
    produces a fresh LogicalRDD whose stats fall back to the constant
    ``defaultSizeInBytes`` — no recompute (the checkpoint blocks back
    the scan), and AQE still broadcasts small sides from *runtime*
    sizes, so join quality is unaffected.
    """
    try:
        spark = df.sparkSession
        jdf = df._jdf
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jnew, spark)
    except Exception:  # private API moved — degrade to inherited stats
        return df

# step_fn(state, superstep) -> new_state   (plan building only, no actions)
StepFn = Callable[[DataFrame, int], DataFrame]
# converged(prev_state, new_state) -> (done, metrics); both materialized
ConvergedFn = Callable[[DataFrame, DataFrame], tuple[bool, dict]]


def run_fixpoint(
    state: DataFrame,
    step_fn: StepFn,
    *,
    converged: ConvergedFn | None = None,
    max_iterations: int = 100,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> tuple[DataFrame, int]:
    """Iterate ``step_fn`` until ``converged`` (or the iteration budget).

    Returns ``(final_state, supersteps_executed)``.
    """
    start = 0
    if manager is not None and resume:
        latest = manager.latest()
        if latest is not None:
            start, state, _meta = latest
            start += 1
    state = _stats_barrier(state.localCheckpoint(eager=True))

    superstep = start
    for superstep in range(start, start + max_iterations):
        new_state = _stats_barrier(
            step_fn(state, superstep).localCheckpoint(eager=True)
        )
        done, metrics = converged(state, new_state) if converged else (False, {})
        if manager is not None and (
            done
            or superstep == start + max_iterations - 1
            or (superstep + 1) % durable_checkpoint_every == 0
        ):
            new_state = manager.commit(superstep, new_state, metrics)
        state.unpersist()
        state = new_state
        if done:
            return state, superstep + 1 - start
    return state, superstep + 1 - start
