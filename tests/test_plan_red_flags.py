"""Plan red-flag gate as a pytest (VERDICT r3 #5).

tools/explain_audit.py catches CartesianProduct / BatchEvalPython /
un-allowlisted SinglePartition across contract plans, but only when run
manually.  This promotes the core-query set into the suite so a plan
regression fails CI, plus a canary test proving the detector actually
fires on an injected crossJoin.
"""
import sys

import pytest

sys.path.insert(0, ".")

from tools.explain_audit import CORE, HARD_FLAGS, _flag_single_partition  # noqa: E402


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.slow
@pytest.mark.parametrize("name", CORE)
def test_core_plan_clean(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    flags = [f for f in HARD_FLAGS if f in plan]
    if _flag_single_partition(plan):
        flags.append("Exchange SinglePartition")
    assert not flags, f"{name}: {flags}\n{plan[:4000]}"


@pytest.mark.quick
def test_detector_fires_on_cross_join(spark):
    """Canary: an injected crossJoin must be flagged, proving the
    detector isn't vacuously green."""
    # both sides must exceed the broadcast threshold or Catalyst plans a
    # BroadcastNestedLoopJoin instead of a CartesianProduct
    a = spark.range(10**7)
    b = spark.range(10**7).withColumnRenamed("id", "id2")
    plan = _plan(a.crossJoin(b))
    assert any(f in plan for f in HARD_FLAGS), plan


@pytest.mark.quick
def test_detector_fires_on_python_udf(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    plan = _plan(spark.range(10).select(slow("id")))
    assert "BatchEvalPython" in plan, plan


@pytest.mark.quick
def test_detector_fires_on_unbounded_single_partition(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.orderBy("id")  # global window, no partitionBy
    df = spark.range(100).select(F.row_number().over(w).alias("rn"))
    assert _flag_single_partition(_plan(df))


@pytest.mark.quick
def test_detector_allows_global_agg_finish(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).agg(F.sum("id").alias("s"))
    assert not _flag_single_partition(_plan(df))


@pytest.mark.quick
def test_detector_fires_on_global_window_without_new_exchange(spark):
    """Canary for the WindowExec check: a global Window.orderBy over an
    ALREADY single-partition child inserts no fresh Exchange
    SinglePartition, so the Exchange check alone misses the funnel —
    the Window-node check must fire."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tools.explain_audit import _flag_global_window

    df = (
        spark.range(100)
        .coalesce(1)
        .select(F.row_number().over(Window.orderBy("id")).alias("rn"))
    )
    assert _flag_global_window(_plan(df))


@pytest.mark.quick
def test_window_detector_allows_partitioned_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tools.explain_audit import _flag_global_window

    w = Window.partitionBy((F.col("id") % 4).alias("p")).orderBy("id")
    df = spark.range(100).select(F.row_number().over(w).alias("rn"))
    assert not _flag_global_window(_plan(df))
