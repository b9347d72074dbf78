"""Driver-side fixpoint loop shared by all iterative algorithms.

Spark has no native fixpoint operator, so PageRank / hash-min CC /
LPA / peeling loops all run supersteps from the driver.  Two problems
this helper solves uniformly:

1. **Lineage blowup** — every superstep's plan references the previous
   one; after a few dozen iterations analysis time and stack depth
   explode.  We truncate via ``localCheckpoint(eager=True)`` every
   ``local_checkpoint_every`` supersteps (cheap, cluster-local), and
2. **Durable resume** — optionally commit the superstep state to a
   :class:`~dachshund_spark.checkpoint.CheckpointManager` every
   ``durable_checkpoint_every`` supersteps, so a killed run resumes
   from the last committed snapshot instead of superstep 0.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from dachshund_spark.checkpoint import CheckpointManager

# step_fn(state, superstep) -> (new_state, done, metrics)
StepFn = Callable[[DataFrame, int], tuple[DataFrame, bool, dict]]


def run_fixpoint(
    state: DataFrame,
    step_fn: StepFn,
    *,
    max_iterations: int = 100,
    local_checkpoint_every: int = 3,
    manager: CheckpointManager | None = None,
    durable_checkpoint_every: int = 5,
    resume: bool = True,
) -> tuple[DataFrame, int]:
    """Iterate ``step_fn`` until it reports convergence.

    Returns ``(final_state, supersteps_executed)``.
    """
    start = 0
    if manager is not None and resume:
        latest = manager.latest()
        if latest is not None:
            start, state, _meta = latest
            start += 1

    state = state.persist()
    prev = state
    superstep = start
    for superstep in range(start, start + max_iterations):
        new_state, done, metrics = step_fn(state, superstep)
        new_state = new_state.persist()
        if (superstep + 1) % local_checkpoint_every == 0:
            # eager localCheckpoint both materializes and truncates lineage
            new_state = new_state.localCheckpoint(eager=True)
        if manager is not None and (
            done or (superstep + 1) % durable_checkpoint_every == 0
        ):
            new_state = manager.commit(superstep, new_state, metrics)
        prev.unpersist()
        prev = new_state
        state = new_state
        if done:
            return state, superstep + 1 - start
    return state, superstep + 1 - start
