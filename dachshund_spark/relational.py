"""Relational / windowed operators over the auxiliary tables.

These show the engine's non-graph surface (windows, sessionization,
pricing aggregates) expressed declaratively so Catalyst plans them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize_events(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Per-user session stats: [user_id, n_sessions, max_session_events].

    A session breaks when the gap to the previous event (ordered by
    ts, event_id) exceeds ``gap_seconds`` — the classic lag + running
    sum sessionization, fully window-based (one shuffle on user_id).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0).alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(run))
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count("*").alias("cnt"))
    return per_sess.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"),
        F.max("cnt").alias("max_session_events"),
    )


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts per event type:
    [event_type, hour_epoch, n_events, sum_value_cents]."""
    return (
        events.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # per-row rounding to cents keeps the sum integer-exact and
            # order-independent (float sums are not)
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "sum_value_cents"
            ),
        )
    )


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary with integer-cent exact sums."""
    cents = lambda c: F.round(c * 100, 0).cast("long")  # noqa: E731
    return (
        lineitem.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
                ).cast("long")
            ).alias("sum_disc_price_e4"),
            F.count("*").alias("count_order"),
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition table over per-user event streams:
    ``[src_type, dst_type, c, prob]``.

    Consecutive event_type pairs (ordered by ts, event_id per user —
    unique event_id makes the order total) are counted, then
    conditioned on the source row marginal: prob = c / Σc(src).  The
    window shuffles once on user_id; the two aggregations are
    vocabulary-sized.  ``prob`` is a single raw IEEE division of two
    exact counts (never ROUND a division — .5e-8 boundaries split
    engines; see pipeline/lm.py).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    trans = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    marg = trans.groupBy("src_type").agg(F.sum("c").alias("_tot"))
    return trans.join(F.broadcast(marg), on="src_type").select(
        "src_type",
        "dst_type",
        "c",
        (F.col("c") / F.col("_tot")).alias("prob"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: top-k unshipped orders of a
    market segment by revenue — ``[l_orderkey, revenue_e4,
    o_orderdate, o_orderpriority]``.

    Revenue is summed as per-row e4-scaled integers (same convention
    as :func:`pricing_summary`) so the aggregate is order-independent
    and engine-exact.  Plan shape: the segment-filtered customer dim
    broadcasts into orders, lineitem joins on the orders key (one
    shuffle), top-k is a distributed TakeOrderedAndProject.
    """
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < date).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.where(F.col("l_shipdate") > date).select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
        )
        .cast("long")
        .alias("_rev"),
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("_rev").alias("revenue_e4"))
        .orderBy(
            F.desc("revenue_e4"), F.asc("o_orderdate"), F.asc("l_orderkey")
        )
        .limit(int(k))
        .select("l_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority")
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped local supplier volume: revenue per nation from
    orders whose customer and line-supplier sit in the same nation of
    one region — ``[n_name, revenue_e4]``.

    Star-schema plan shape: region→nation→supplier dims fold into one
    broadcast; the only shuffles are the two fact joins
    (lineitem⋈orders on orderkey, +customer on custkey); the
    same-nation predicate runs as a cheap post-join filter. Revenue is
    summed as per-row e4 integers (order-independent, engine-exact).
    """
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    l = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("_rev").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("n_name"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: per user, the deepest step prefix
    completed in strictly increasing time — ``[user_id, reached]``
    (0 = never did step 1; k = first k steps done in order, each
    strictly after the previous).

    One aggregation per step over only that step's events (the
    type filter prunes the scan); no windows, no per-user event
    arrays — a hub user with 10^6 events costs one min() per step.
    """
    reached = events.select(F.col(user_col).alias("u")).distinct().select(
        "u", F.lit(0).alias("reached")
    )
    prev = None  # [u, _t] = earliest completion time of the prefix
    for i, s in enumerate(steps, start=1):
        ev = events.where(F.col(type_col) == s).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev
        else:
            cur = ev.join(prev, on="u").where(F.col("_ts") > F.col("_t"))
        prev = cur.groupBy("u").agg(F.min("_ts").alias("_t"))
        reached = reached.unionByName(
            prev.select("u", F.lit(i).alias("reached"))
        )
    return (
        reached.groupBy("u")
        .agg(F.max("reached").alias("reached"))
        .select(F.col("u").alias(user_col), "reached")
    )


def retention_cohorts(
    events: DataFrame,
    *,
    anchor: str = "2024-01-01",
    weeks: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted as retained in week offsets 0..weeks-1 —
    ``[cohort_week, week_offset, n_users]``.

    All integer arithmetic (day index via datediff from the anchor
    date, week = day DIV 7), two aggregations, no windows.

    Events BEFORE the anchor are dropped: truncating DIV would
    otherwise fold days −6..−1 into week 0 and map earlier activity to
    negative cohort weeks, silently polluting the week-0 cohort
    (ADVICE r3).  Pick an anchor at or before the data's start to keep
    every event.
    """
    uw = events.where(
        F.expr(f"CAST({ts_col} AS DATE) >= DATE '{anchor}'")
    ).select(
        F.col(user_col).alias("u"),
        F.expr(
            f"CAST(datediff(CAST({ts_col} AS DATE), DATE '{anchor}') AS BIGINT) DIV 7"
        ).alias("week"),
    ).distinct()
    first = uw.groupBy("u").agg(F.min("week").alias("cohort_week"))
    j = uw.join(first, on="u").select(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
    )
    return (
        j.where(F.col("week_offset") < weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def gap_fill_hourly(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Dense hourly series per event type with explicit zero rows for
    silent hours — ``[event_type, hour, n_events]`` over the full
    [min hour, max hour] span.

    The grid is hours × types built from two broadcast-sized frames
    (one row per hour, one per type), so the fill never shuffles the
    fact table twice; missing cells coalesce to 0. The dashboards /
    anomaly-detection shape downstream of ``hourly_rollup``.
    """
    hc = (
        events.select(
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
            F.col(type_col).alias("event_type"),
        )
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    rng = hc.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    hours = rng.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = events.select(F.col(type_col).alias("event_type")).distinct()
    grid = hours.crossJoin(F.broadcast(types))
    return grid.join(hc, on=["hour", "event_type"], how="left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )


def decayed_counts(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_age: int = 40,
) -> DataFrame:
    """Exponentially time-decayed counters per type (half-life one
    day, reference point = corpus max timestamp) —
    ``[event_type, n_events, decayed_e40]``.

    The decayed weight 2^−age is kept as the exact BIGINT
    2^(40−min(age, 40)) so the aggregate is an order-independent
    integer sum; summing float 2^−age silently drops low bits
    whenever old and new events meet in one partial sum. Divide by
    2^40 at read time for the float counter. The batch twin of a
    decayed streaming sketch: mergeable (integer +) and re-scalable
    to a new 'now' by a power-of-two shift.
    """
    now = events.agg(F.max(ts_col).alias("_now"))
    ag = events.crossJoin(F.broadcast(now)).select(
        F.col(type_col).alias("event_type"),
        F.least(
            F.datediff(F.col("_now").cast("date"), F.col(ts_col).cast("date")),
            F.lit(int(max_age)),
        ).alias("_age"),
    )
    return ag.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        # column shift amounts need F.expr (F.shiftleft only takes a
        # literal numBits)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {int(max_age)} - _age)"))
        .cast("long")
        .alias("decayed_e40"),
    )


def interevent_burstiness(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-key burstiness B = (σ−μ)/(σ+μ) of inter-event gaps
    (Goh & Barabási 2008): B→−1 periodic, ≈0 Poisson, →1 bursty.

    Gaps are floor-second integers (deltas of a per-key lag window);
    moments (n, Σd, Σd²) stay exact BIGINTs, and B is evaluated with
    one fixed IEEE expression tree — n·Σd²−(Σd)² under the radical, so
    no float cancellation can drive the variance negative — making the
    double output engine-stable (sqrt is correctly rounded, unlike
    ln/exp).  Keys need ≥ 2 gaps and a positive gap sum (σ+μ > 0).
    """
    sec = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    d = (sec - F.lag(sec).over(w)).alias("d")
    gaps = events.select(F.col(key_col), d).where(F.col("d").isNotNull())
    m = gaps.groupBy(key_col).agg(
        F.count("d").alias("n"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    sigma = F.sqrt(
        (n * q - s * s).cast("double") / (n * n).cast("double")
    )
    mu = s.cast("double") / n.cast("double")
    return m.where((n >= 2) & (s > 0)).select(
        F.col(key_col),
        n.cast("long").alias("n_gaps"),
        s.cast("long").alias("sum_gap"),
        ((sigma - mu) / (sigma + mu)).alias("burstiness"),
    )


def revenue_forecast(
    lineitem: DataFrame,
    *,
    year: int = 1996,
    discount_min: float = 0.05,
    discount_max: float = 0.07,
    quantity: int = 24,
) -> DataFrame:
    """TPC-H Q6-shaped forecasting revenue change: the revenue lift
    from dropping discounts in a band — ``[n_items, revenue_e4]``.

    SUM(l_extendedprice · l_discount) over one year of shipments with
    discount inside [discount_min, discount_max] and quantity under
    the cap.  The band bounds are taken verbatim (NOT computed as
    target ± 0.01 — float subtraction would move the comparison
    boundary off the literal the SQL oracle uses).  Per-row e4-scaled
    integer rounding keeps the aggregate order-independent and
    engine-exact; the whole query is a single scan-filter-aggregate —
    predicate pushdown reaches the parquet reader and the global sum
    finishes on one bounded row.
    """
    lo, hi = discount_min, discount_max
    f = lineitem.where(
        (F.col("l_shipdate") >= f"{year}-01-01")
        & (F.col("l_shipdate") < f"{year + 1}-01-01")
        & (F.col("l_discount") >= lo)
        & (F.col("l_discount") <= hi)
        & (F.col("l_quantity") < quantity)
    )
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000, 0)
            .cast("long")
        ).alias("revenue_e4"),
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost per customer
    to returned lineitems (``l_returnflag = 'R'``) in a one-quarter
    order window, with the customer's nation — top-k by revenue.

    Revenue sums per-row e4-scaled integers (the :func:`pricing_summary`
    convention) so the aggregate is order-independent and engine-exact;
    ``c_acctbal`` passes through untouched (no float arithmetic).

    Plan shape: quarter-filtered orders join lineitem on the order key
    (the one big shuffle), customers join on custkey, the 25-row nation
    dim broadcasts; top-k is a TakeOrderedAndProject, never a global
    sort.
    """
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    l = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    )
    c = customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    n = nation.select("n_nationkey", "n_name")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("_rev").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(int(k))
        .select("c_custkey", "c_name", "revenue_e4", "c_acctbal", "n_name")
    )


def priority_shipments(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4/Q12-shaped priority census: per ship year, how many
    lineitems belong to high-priority orders (1-URGENT / 2-HIGH) vs the
    rest — the two-bucket conditional-count aggregate shape.

    Pure integer counts; plan shape: lineitem joins the order-priority
    column on the order key (one shuffle), then one groupBy(year) with
    map-side combinable conditional sums.
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = orders.select("o_orderkey", hi.alias("_hi"))
    l = lineitem.select(
        "l_orderkey", F.year(F.col("l_shipdate").cast("date")).alias("ship_year")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("ship_year")
        .agg(
            F.sum(F.when(F.col("_hi"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("_hi"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


def event_markov_stationary(
    events: DataFrame, *, iterations: int = 8, scale: int = 10**12
) -> DataFrame:
    """Fixed-point stationary distribution of the first-order event
    Markov chain (the power iteration behind "where do sessions end
    up"), in EXACT integer arithmetic.

    State is e12-scaled BIGINT mass per event type; one superstep is
    ``s'(j) = Σ_i (s_i · c_ij) DIV r_i`` — per-term truncating integer
    division (Spark ``DIV`` == DuckDB ``//``), so every round is
    engine-exact and the unrolled oracle replays it bit-for-bit.
    Types with no outgoing transitions drop their mass (dangling mass
    is not redistributed — documented semantics, deterministic).

    Scale shape: the transition table is vocabulary-sized (|types|²);
    each round is one broadcast join + one groupBy — the classic
    power-iteration profile with a tiny state.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    trans = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    marg = trans.groupBy("src_type").agg(F.sum("c").cast("long").alias("r"))
    tr = trans.join(marg, on="src_type").persist()
    types = (
        pairs.select(F.col("src_type").alias("t"))
        .unionByName(pairs.select(F.col("dst_type").alias("t")))
        .distinct()
        .persist()
    )
    n_types = types.count()
    state = types.select("t", F.lit(int(scale) // n_types).cast("long").alias("s"))
    for _ in range(int(iterations)):
        state = (
            state.join(tr, on=F.col("t") == F.col("src_type"))
            .select(
                F.col("dst_type").alias("t"),
                F.expr("(s * c) DIV r").cast("long").alias("_m"),
            )
            .groupBy("t")
            .agg(F.sum("_m").cast("long").alias("s"))
        )
    out = (
        types.join(state, on="t", how="left")
        .select(
            F.col("t").alias("event_type"),
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("stationary_e12"),
        )
    )
    out = out.localCheckpoint(eager=True)
    tr.unpersist()
    types.unpersist()
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_id: str = "event_id",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the LATEST right row of
    the same ``on`` key with ``right_time ≤ left_time`` (and within
    ``tolerance_s`` when given) — the click→conversion attribution /
    quote→trade alignment primitive Spark lacks natively.

    Implemented as union + one per-key window carrying
    ``MAX(struct(epoch, id))`` over right rows seen so far — windowed
    MAX over a struct behaves identically in Spark and DuckDB, NULLs
    (left rows) are ignored by MAX, and the (time, kind, id) ordering
    is total, so the match is deterministic.  NO non-equi range join:
    cost is one shuffle on the key + a per-key sort, the scalable
    formulation (a range join would rescan right per left row).

    Right rows at exactly ``left_time`` DO match (≤, kind-ordered
    right-before-left at equal times).

    Time arithmetic is in EXACT epoch MICROSECONDS (``unix_micros`` ==
    DuckDB ``epoch_us``) — second-granular epochs floor in Spark but
    round in DuckDB on sub-second timestamps, so micros are the only
    engine-stable unit; ``gap_s`` is the truncated whole-second gap.

    Returns the left rows with ``matched_{right_id}`` (nullable) and
    ``gap_s`` (left_time − matched right_time, whole seconds, nullable).
    """
    lt = F.col(left_time).cast("timestamp")
    rt = F.col(right_time).cast("timestamp")
    l = left.select(
        F.col(on).alias("_k"),
        F.unix_micros(lt).alias("_t"),
        F.lit(1).alias("_kind"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
        F.lit(None).cast("long").alias("_rid"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.unix_micros(rt).alias("_t"),
        F.lit(0).alias("_kind"),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType)
        .alias("_payload"),
        F.col(right_id).cast("long").alias("_rid"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_kind", "_rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn(
        "_last_r",
        F.max(
            F.when(
                F.col("_kind") == 0, F.struct(F.col("_t").alias("t"), F.col("_rid").alias("i"))
            )
        ).over(w),
    )
    out = carried.where(F.col("_kind") == 1)
    match_ok = F.col("_last_r").isNotNull()
    if tolerance_s is not None:
        match_ok = match_ok & (
            F.col("_t") - F.col("_last_r.t") <= F.lit(int(tolerance_s) * 1_000_000)
        )
    gap_s = F.expr("(_t - _last_r.t) DIV 1000000").cast("long")
    return out.select(
        F.col("_payload.*"),
        F.when(match_ok, F.col("_last_r.i")).alias(f"matched_{right_id}"),
        F.when(match_ok, gap_s).alias("gap_s"),
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_a: str = "ASIA",
    region_b: str = "EUROPE",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-12-31",
) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    trade regions per ship year, in both directions —
    ``[supp_region, cust_region, l_year, revenue_e4]``.

    (Region-level rather than Q7's nation pair: the fixture's supplier
    table is sparse across nations, regions are always populated.)
    Revenue sums per-row e4 integers (:func:`pricing_summary`
    convention).  Plan shape: nation⋈region folds into ONE tiny
    nationkey→region dim broadcast twice (supplier side, customer
    side); supplier broadcasts into lineitem; the two real shuffles are
    customer⋈orders (custkey) and orders⋈lineitem (orderkey) — at 100
    TB those are the unavoidable fact-fact joins, everything else is
    map-side.
    """
    ndim = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    s = supplier.join(
        F.broadcast(ndim), supplier.s_nationkey == ndim.n_nationkey
    ).select("s_suppkey", F.col("r_name").alias("supp_region"))
    c = customer.join(
        F.broadcast(ndim), customer.c_nationkey == ndim.n_nationkey
    ).select("c_custkey", F.col("r_name").alias("cust_region"))
    l = lineitem.where(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") <= date_hi)
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    )
    pair = (
        (F.col("supp_region") == region_a) & (F.col("cust_region") == region_b)
    ) | ((F.col("supp_region") == region_b) & (F.col("cust_region") == region_a))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .where(pair)
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(F.sum("_rev").alias("revenue_e4"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


def market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    target_region: str = "EUROPE",
    target_nation: str = "NATION_3",
    ptype: str = "PROMO",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-12-31",
) -> DataFrame:
    """TPC-H Q8-shaped market share: the fraction of a region's revenue
    in one part type supplied by one nation, per order year —
    ``[o_year, nation_rev_e4, total_rev_e4, mkt_share]``.

    Numerator and denominator are both EXACT e4-integer sums; the share
    is one raw IEEE division of the two BIGINTs (never ROUND a
    division — CLAUDE.md float-parity rule).  Part filter pushes into
    the broadcast part dim; customer region restricts via the folded
    nation⋈region dim.
    """
    ndim = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
    p = part.where(F.col("p_type") == ptype).select("p_partkey")
    s = supplier.join(
        F.broadcast(ndim.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = customer.join(
        F.broadcast(ndim.where(F.col("r_name") == target_region)),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    o = orders.where(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") <= date_hi)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    l = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == target_nation, F.col("_rev"))
                .otherwise(F.lit(0))
            ).cast("long").alias("nation_rev_e4"),
            F.sum("_rev").cast("long").alias("total_rev_e4"),
        )
        .select(
            "o_year",
            "nation_rev_e4",
            "total_rev_e4",
            (
                F.col("nation_rev_e4").cast("double")
                / F.col("total_rev_e4").cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, *, exclude_priority: str = "5-LOW"
) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: how many
    customers placed exactly k qualifying orders, INCLUDING the
    zero-order customers — ``[c_count, custdist]``.

    (The fixture has no order comments, so the classic NOT LIKE comment
    filter becomes an order-priority exclusion.)  Left join keeps
    order-less customers (COUNT of the null key is 0); both aggregates
    are exact integers.  Two shuffles: custkey, then the tiny c_count
    histogram.
    """
    o = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def promo_revenue_effect(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    ptype: str = "PROMO",
    date_lo: str = "1997-09-01",
    date_hi: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: the share of one month's
    revenue from promo parts — one row ``[promo_rev_e4, total_rev_e4,
    promo_share_pct]``.

    Both sums exact e4 integers; the percentage is
    ``100.0 * promo / total`` as one shared IEEE expression tree.
    Part dim broadcasts; one map-side-combined global agg.
    """
    l = lineitem.where(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    ).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    )
    p = part.select("p_partkey", "p_type")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == ptype, F.col("_rev")).otherwise(F.lit(0))
            ).cast("long").alias("promo_rev_e4"),
            F.sum("_rev").cast("long").alias("total_rev_e4"),
        )
        .select(
            "promo_rev_e4",
            "total_rev_e4",
            (
                F.lit(100.0)
                * F.col("promo_rev_e4").cast("double")
                / F.col("total_rev_e4").cast("double")
            ).alias("promo_share_pct"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_qty: int = 150,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: top-k orders whose
    total line quantity exceeds a threshold, with their customer —
    ``[c_custkey, c_name, o_orderkey, o_orderdate, totalprice_cents,
    sum_qty]``.

    Quantities are integral doubles in the fixture; cast to BIGINT so
    HAVING and the output are exact.  The quantity rollup shuffles on
    orderkey once (map-side partial agg) and the surviving order set is
    tiny, so the orders/customer joins are broadcast-able at any scale.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > int(min_qty))
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "totalprice_cents"
        ),
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(int(k))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "totalprice_cents", "sum_qty",
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, *, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: yearly revenue that
    would vanish if sub-20%-of-average-quantity orders of one brand
    stopped — one row ``[n_rows, sum_price_cents, avg_yearly]``.

    The correlated ``qty < 0.2 * AVG(qty per part)`` becomes the
    cleared-denominator integer predicate ``5·n·qty < Σqty`` (qty is
    integral; never divide before comparing — CLAUDE.md oracle-float
    rule).  Per-part stats aggregate once on partkey (the same shuffle
    the rows join uses); avg_yearly = cents/700.0 is one shared IEEE
    division.
    """
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    rows = lineitem.join(
        F.broadcast(p), lineitem.l_partkey == p.p_partkey
    ).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("_qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("_cents"),
    )
    st = rows.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_qty").cast("long").alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    return (
        rows.join(st, rows.l_partkey == st._pk)
        .where(F.lit(5) * F.col("_n") * F.col("_qty") < F.col("_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_cents").cast("long").alias("sum_price_cents"),
        )
        .select(
            "n_rows",
            "sum_price_cents",
            (F.col("sum_price_cents").cast("double") / F.lit(700.0)).alias(
                "avg_yearly"
            ),
        )
    )


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shaped discounted revenue: one scalar over a
    disjunction of three (brand, quantity-band, size-band) channels —
    ``[n_rows, revenue_e4]``.

    The OR-of-ANDs predicate evaluates post-join on the broadcast part
    dim (brand/size) and the lineitem row (quantity); at scale the
    partkey join is the only shuffle and Catalyst pushes the three
    brand values into the part scan.
    """
    p = part.select("p_partkey", "p_brand", "p_size")
    j = lineitem.select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("_qty"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    band = lambda b, qlo, qhi, shi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("_qty").between(qlo, qhi)
        & F.col("p_size").between(1, shi)
    )
    return (
        j.where(
            band("Brand#1", 1, 11, 5)
            | band("Brand#2", 10, 20, 10)
            | band("Brand#3", 20, 30, 15)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_rev").cast("long").alias("revenue_e4"),
        )
    )


def sole_late_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    *,
    grace_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-shaped blame census: suppliers who were the ONLY late
    shipper on finished multi-supplier orders — ``[s_name, numwait]``,
    top-k.  (The fixture has no commit/receipt dates, so "late" is
    shipped more than ``grace_days`` after the order date.)

    The EXISTS / NOT EXISTS pair becomes one per-(order, supplier)
    late flag + a per-order count aggregate — two groupBys on the same
    orderkey shuffle, no correlated subqueries, no self-join
    explosion.
    """
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(grace_days)} DAY"),
        F.lit(1),
    ).otherwise(F.lit(0))
    ps = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("_late"))
    )
    agg = ps.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count(F.lit(1)).cast("long").alias("_n_supp"),
        F.sum("_late").cast("long").alias("_n_late"),
    )
    blamed = ps.join(agg, ps.l_orderkey == agg._ok).where(
        (F.col("_late") == 1) & (F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)
    )
    return (
        blamed.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            blamed.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(int(k))
    )


def dormant_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    *,
    nation_keys: tuple = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    since: str = "1999-07-01",
) -> DataFrame:
    """TPC-H Q22-shaped global sales opportunity: per nation, customers
    of a target-nation set whose balance beats the set's positive
    average but who placed NO recent order —
    ``[n_name, numcust, total_acctbal_cents]``.

    (No phone column in the fixture — the country-code substring
    becomes a nationkey set.)  The above-average compare clears the
    denominator: ``cents·n > Σcents`` over exact cent integers; the
    1-row average aggregate broadcasts; dormancy is a left-anti join
    against recent orders (one shuffle on custkey).
    """
    cs = customer.where(
        F.col("c_nationkey").isin(*[int(x) for x in nation_keys])
    ).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("_cents"),
    )
    avg1 = cs.where(F.col("_cents") > 0).agg(
        F.sum("_cents").cast("long").alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    recent = orders.where(F.col("o_orderdate") >= since).select("o_custkey")
    return (
        cs.crossJoin(F.broadcast(avg1))
        .where(F.col("_cents") * F.col("_n") > F.col("_s"))
        .join(recent, cs.c_custkey == recent.o_custkey, "left_anti")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("_cents").cast("long").alias("total_acctbal_cents"),
        )
        .orderBy("n_name")
    )


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped top supplier(s): per-supplier shipped revenue in
    a one-quarter window, returning every supplier tied for the maximum
    (the view + scalar-max-subquery shape, semantics per reference
    query surface; cf. dachshund relational tests).

    Revenue sums per-row e4-scaled integers so both the per-supplier
    totals and the max comparison are engine-exact — a float max would
    make the tie predicate order-dependent.

    Plan shape: one groupBy(l_suppkey) over the window-filtered scan
    (partial aggregation map-side), a 1-row global max cross-joined
    back (broadcast by construction), then a broadcast-sized join to
    the supplier dim for names.
    """
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
        )
        .select(
            "l_suppkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
            .cast("long")
            .alias("_rev"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("_rev").alias("total_revenue_e4"))
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue_e4") == F.col("_mx"))
        .join(supplier.select("s_suppkey", "s_name"), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
        .orderBy("s_suppkey")
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM customer segmentation over the event stream:
    [user_id, recency_days, frequency, monetary_e4, r_score, f_score,
    m_score, rfm] with quartile scores 1-4.

    Recency = whole days between the user's last event and the corpus
    max timestamp (exact integer datediff on dates); frequency = event
    count; monetary = Σ per-row e4-rounded value (order-independent
    BIGINT). Quartile thresholds come from the histogram-cumsum
    exact-quantile machinery (:func:`~dachshund_spark.algorithms.stats
    .exact_quantiles`) — never a global sort or NTILE over all users.
    Scores: f/m are 1 + #(metric > p25,p50,p75); recency scores
    inverted (1 + #(metric < p25,p50,p75)) so fresher users score
    higher. Threshold comparisons are strict, so ties land in the
    lower bucket deterministically in both engines.

    Plan shape: one groupBy(user_id) over the events scan, three
    histogram aggregates over the (bounded, one-row-per-user) metric
    table, thresholds rejoined as a broadcast 1-row frame.
    """
    from dachshund_spark.algorithms.stats import exact_quantiles

    gmax = events.agg(F.max(F.col("ts").cast("date")).alias("_gd"))
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("_ud"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias(
                "monetary_e4"
            ),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff(F.col("_gd"), F.col("_ud")).cast("long").alias("recency_days"),
            "frequency",
            "monetary_e4",
        )
    )
    per_user = per_user.localCheckpoint(eager=True)
    qs = (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))
    thr = None
    for metric in ("recency_days", "frequency", "monetary_e4"):
        t = (
            exact_quantiles(per_user, metric, qs=qs, two_phase_buckets=64)
            .groupBy()
            .pivot("q", ["p25", "p50", "p75"])
            .agg(F.first(metric))
            .select(
                F.col("p25").alias(f"{metric}_p25"),
                F.col("p50").alias(f"{metric}_p50"),
                F.col("p75").alias(f"{metric}_p75"),
            )
        )
        thr = t if thr is None else thr.crossJoin(F.broadcast(t))

    def _score(c: str, invert: bool) -> F.Column:
        cmp = (
            (F.col(c) < F.col(f"{c}_p25")).cast("int")
            + (F.col(c) < F.col(f"{c}_p50")).cast("int")
            + (F.col(c) < F.col(f"{c}_p75")).cast("int")
            if invert
            else (F.col(c) > F.col(f"{c}_p25")).cast("int")
            + (F.col(c) > F.col(f"{c}_p50")).cast("int")
            + (F.col(c) > F.col(f"{c}_p75")).cast("int")
        )
        return (F.lit(1) + cmp).cast("long")

    scored = per_user.crossJoin(F.broadcast(thr)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_e4",
        _score("recency_days", invert=True).alias("r_score"),
        _score("frequency", invert=False).alias("f_score"),
        _score("monetary_e4", invert=False).alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "long"
        ),
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Gaps-and-islands per user over distinct active days:
    [user_id, n_active_days, n_streaks, longest_streak, last_streak_len].

    Island id = active date minus (dense rank within user) days — the
    classic trick: consecutive days share the anchor. All integer date
    arithmetic; windows are partitioned by user_id (no global sort).
    """
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("day").alias("last_day"),
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max_by("len", "last_day").cast("long").alias("last_streak_len"),
    )


def product_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    *,
    name_like: str = "widget",
) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: per (nation, order year),
    Σ revenue − supply cost for parts whose name contains
    ``name_like`` — [n_name, o_year, profit_e4].

    The schema here has no partsupp table, so supply cost is
    ``p_retailprice · l_quantity`` (the price the supplier's nation
    "paid"), keeping the Q9 join tree: lineitem → part (filtered,
    broadcastable) → supplier → nation (broadcast) → orders (year).
    Revenue rounds to e4 per row, cost = retail cents · integral
    quantity · 100 — everything BIGINT before the sum, so the profit
    aggregate is order-independent and engine-exact.
    """
    p = part.where(F.col("p_name").contains(name_like)).select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("_cents"),
    )
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
        .cast("long")
        .alias("_rev"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("_qty"),
    )
    s = supplier.select("s_suppkey", "s_nationkey")
    n = nation.select("n_nationkey", "n_name")
    o = orders.select(
        "o_orderkey", F.year(F.col("o_orderdate").cast("date")).alias("o_year")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(
            F.sum(F.col("_rev") - F.col("_cents") * F.col("_qty") * 100)
            .cast("long")
            .alias("profit_e4")
        )
    )


def multitouch_attribution(
    events: DataFrame,
    *,
    conv_type: str = "purchase",
    touch_type: str = "click",
    window_seconds: int = 1800,
) -> DataFrame:
    """Linear multi-touch attribution: every ``touch_type`` event in
    the ``window_seconds`` before a same-user ``conv_type`` event
    shares the conversion credit equally —
    ``[conv_id, touch_id, n_touches, credit_e8, is_first, is_last]``.

    Complements the backward as-of join (last-touch only): this is the
    windowed many-to-many variant.  Credit is the exact integer
    ``10^8 div n_touches``; first/last flags compare the packed
    ``epoch·2^20 + event_id`` BIGINT (event ids are unique, so the
    order is total and identical in both engines — no struct-compare
    semantics needed).  Plan shape: one user-keyed equi-join with the
    time-range predicate as a post-join filter, then a conv-keyed
    aggregate rejoined to the pairs.
    """
    p = events.where(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("_u"),
        F.unix_timestamp("ts").alias("_pt"),
    )
    c = events.where(F.col("event_type") == touch_type).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("_u"),
        F.unix_timestamp("ts").alias("_ct"),
    )
    pairs = p.join(c, on="_u").where(
        (F.col("_ct") <= F.col("_pt"))
        & (F.col("_ct") > F.col("_pt") - F.lit(int(window_seconds)))
    )
    key = (F.col("_ct") * F.lit(1048576) + F.col("touch_id")).alias("_k")
    pairs = pairs.select("conv_id", "touch_id", key)
    stats = pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.min("_k").alias("_first"),
        F.max("_k").alias("_last"),
    )
    return pairs.join(stats, on="conv_id").select(
        "conv_id",
        "touch_id",
        "n_touches",
        F.expr("100000000 DIV n_touches").cast("long").alias("credit_e8"),
        (F.col("_k") == F.col("_first")).alias("is_first"),
        (F.col("_k") == F.col("_last")).alias("is_last"),
    )


def cusum_hourly(
    events: DataFrame, *, alarm_factor_num: int = 1, alarm_factor_den: int = 1
) -> DataFrame:
    """CUSUM changepoint scan over hourly event-type counts:
    ``[event_type, n_hours, total, max_s, first_alarm_hour]``.

    Tests each type's hourly counts against its own uniform rate:
    a_t = c_t·H − N (integer excess, ×H to clear the mean N/H), and
    S_t = max(0, S_{t−1} + a_t) via the closed form
    ``S_t = cum_t − least(0, min_{j≤t} cum_j)`` — two windows
    partitioned by event_type, no recursion.  Alarm when
    ``S_t·den > N·num``; ``first_alarm_hour`` is the earliest epoch
    crossing (−1 when none).  All BIGINT until nothing.
    """
    hc = events.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = hc.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    a = hc.join(tot, on="event_type").select(
        "event_type",
        "hour_epoch",
        "total",
        "n_hours",
        (F.col("c") * F.col("n_hours") - F.col("total")).alias("a"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = a.select(
        "event_type",
        "hour_epoch",
        "total",
        "n_hours",
        F.sum("a").over(w).alias("cum"),
    )
    s = cum.select(
        "event_type",
        "hour_epoch",
        "total",
        "n_hours",
        (
            F.col("cum")
            - F.least(F.lit(0).cast("long"), F.min("cum").over(w))
        ).alias("s"),
    )
    alarm = (
        F.col("s") * F.lit(int(alarm_factor_den))
        > F.col("total") * F.lit(int(alarm_factor_num))
    )
    return s.groupBy("event_type", "n_hours", "total").agg(
        F.max("s").cast("long").alias("max_s"),
        F.coalesce(
            F.min(F.when(alarm, F.col("hour_epoch"))), F.lit(-1).cast("long")
        )
        .cast("long")
        .alias("first_alarm_hour"),
    )


def derived_partsupp(lineitem: DataFrame) -> DataFrame:
    """Deterministic part-supplier catalog derived from the observed
    ``(l_partkey, l_suppkey)`` pairs —
    ``[ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_e2]``.

    The fixture has no PARTSUPP table, so the TPC-H Q2/Q11/Q16/Q20
    shapes synthesize one: availqty and supply cost are pure modular
    formulas of the two keys, so Spark and the DuckDB oracle build
    byte-identical rows from the same lineitem scan.  One distinct
    shuffle on the pair key; at 100 TB the distinct is the same
    aggregation the downstream per-(part,supp) rollups need anyway.
    """
    return lineitem.select("l_partkey", "l_suppkey").distinct().select(
        F.col("l_partkey").cast("long").alias("ps_partkey"),
        F.col("l_suppkey").cast("long").alias("ps_suppkey"),
        ((F.col("l_partkey") * 37 + F.col("l_suppkey") * 101) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        ((F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 100000 + 100)
        .cast("long")
        .alias("ps_supplycost_e2"),
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "EUROPE",
    ptype: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for every part of one
    type, every in-region supplier tied for the minimum supply cost —
    ``[p_partkey, min_cost_e2, s_suppkey, s_name, n_name,
    acctbal_cents]``.

    Q2's correlated MIN subquery becomes a groupBy-min plus an
    equi-join back on ``(partkey, cost)`` — the standard decorrelation,
    and the only shuffle is on ``ps_partkey`` (twice over the same
    key, so AQE can reuse the exchange).  Part and supplier dims
    broadcast.  Cost is an exact e2 integer so the tie predicate is
    engine-stable.  Reference semantics: dachshund has no relational
    layer; this is engine-mandate surface.
    """
    ndim = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == region_name)
        .select("n_nationkey", "n_name")
    )
    s = supplier.join(
        F.broadcast(ndim), supplier.s_nationkey == ndim.n_nationkey
    ).select(
        "s_suppkey",
        "s_name",
        "n_name",
        F.round(F.col("s_acctbal") * 100, 0).cast("long").alias("acctbal_cents"),
    )
    p = part.where(F.col("p_type") == ptype).select("p_partkey")
    cand = (
        derived_partsupp(lineitem)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("ps_partkey", "ps_supplycost_e2", "s_suppkey", "s_name",
                "n_name", "acctbal_cents")
    )
    mins = cand.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_e2").alias("min_cost_e2")
    ).withColumnRenamed("ps_partkey", "_mk")
    return (
        cand.join(
            mins,
            (F.col("ps_partkey") == F.col("_mk"))
            & (F.col("ps_supplycost_e2") == F.col("min_cost_e2")),
        )
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            "min_cost_e2",
            "s_suppkey",
            "s_name",
            "n_name",
            "acctbal_cents",
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "EUROPE",
    mult_num: int = 3,
    mult_den: int = 2,
) -> DataFrame:
    """TPC-H Q11-shaped important stock: parts whose in-region stock
    value exceeds ``mult_num/mult_den`` times the per-part average —
    ``[ps_partkey, value_e2]``.

    Q11's scalar subquery becomes a one-row (total, n_parts) aggregate
    cross-joined (broadcast) onto the per-part values.  TPC-H scales
    Q11's fraction by 1/SF so selectivity survives growth; comparing
    against the *average* (``value·n·den > total·num``, exact integer
    cross-multiply, no float) gets the same scale-invariance without a
    tuning knob.  One shuffle on ``ps_partkey``.
    """
    ndim = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == region_name)
        .select("n_nationkey")
    )
    s = supplier.join(
        F.broadcast(ndim), supplier.s_nationkey == ndim.n_nationkey
    ).select("s_suppkey")
    vals = (
        derived_partsupp(lineitem)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_e2") * F.col("ps_availqty")).alias("_v"),
        )
    )
    per_part = vals.groupBy("ps_partkey").agg(
        F.sum("_v").cast("long").alias("value_e2")
    )
    totals = per_part.agg(
        F.sum("value_e2").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    return (
        per_part.join(F.broadcast(totals))
        .where(
            F.col("value_e2") * F.col("_n") * F.lit(int(mult_den))
            > F.col("_total") * F.lit(int(mult_num))
        )
        .select("ps_partkey", "value_e2")
        .orderBy(F.desc("value_e2"), "ps_partkey")
    )


def supplier_part_census(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    *,
    excl_brand: str = "Brand#13",
    excl_mod: int = 7,
) -> DataFrame:
    """TPC-H Q16-shaped parts/supplier relationship census: distinct
    supplier count per ``(p_brand, p_type, p_size)``, excluding one
    brand and the "complaint file" suppliers —
    ``[p_brand, p_type, p_size, supplier_cnt]``.

    Q16's ``NOT IN (complaint suppliers)`` becomes a broadcast
    anti-join; the fixture has no complaint text, so the complaint set
    is the deterministic rule ``s_suppkey % excl_mod == 0``.  The one
    shuffle is the distinct-count aggregation on the brand/type/size
    key.
    """
    bad = supplier.where(
        F.col("s_suppkey") % excl_mod == 0
    ).select("s_suppkey")
    p = part.where(F.col("p_brand") != excl_brand).select(
        "p_partkey",
        "p_brand",
        "p_type",
        F.col("p_size").cast("long").alias("p_size"),
    )
    return (
        derived_partsupp(lineitem)
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def promotion_candidates(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    pname_like: str = "widget",
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    excess_factor: int = 100,
) -> DataFrame:
    """TPC-H Q20-shaped promotion candidates: suppliers holding excess
    stock (availqty > ``excess_factor`` × the year's shipped quantity)
    of matching parts, with how many such parts each holds —
    ``[s_suppkey, s_name, n_name, n_excess_parts]``.

    Q20's doubly-nested correlated subquery becomes: aggregate the
    year's lineitem per ``(partkey, suppkey)``, equi-join the derived
    partsupp on the same composite key, integer cross-multiplied
    compare (``availqty > factor·qty`` — no fractional float; the
    synthetic availqty is uniform 1..9999 so Q20's literal 0.5 keeps
    everything), then a per-supplier count instead of Q20's bare
    EXISTS so the output carries signal.  Two shuffles total (the
    per-pair rollup, then the pair join reuses its partitioning).
    """
    qty = (
        lineitem.where(
            (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("_qty"))
    )
    p = part.where(F.col("p_name").contains(pname_like)).select("p_partkey")
    excess = (
        derived_partsupp(lineitem)
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("_qty") * F.lit(int(excess_factor)))
        .groupBy("ps_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_excess_parts"))
    )
    return (
        supplier.join(
            F.broadcast(excess), F.col("s_suppkey") == F.col("ps_suppkey")
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name", "n_excess_parts")
        .orderBy("s_suppkey")
    )


def kaplan_meier(
    events: DataFrame,
    *,
    death_event: str = "purchase",
    unit_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Kaplan–Meier time-to-event curve over the event stream —
    ``[t, n_risk, n_events, log_surv_e8]``, one row per observed
    duration (in ``unit_us`` units, default hours) from a user's FIRST
    event to their first ``death_event``.

    Users who never emit ``death_event`` are right-censored at their
    last observed event (at risk through that duration, never a
    death) — the textbook KM censoring rule.  Survival is reported in
    LOG space: each time contributes ``ln(1 − d/n)`` pre-rounded to an
    e8 integer and ``log_surv_e8`` is the exact running sum — the
    Adamic-Adar float-parity pattern (never sum raw libm outputs), so
    the curve replays bit-for-bit in SQL; consumers exp() it.  When
    every remaining user converts at once (d = n) survival hits exact
    zero and ``log_surv_e8`` is NULL from that row on.  Time
    arithmetic is exact epoch MICROSECONDS (``unix_micros`` == DuckDB
    ``epoch_us``); the windows run on the DURATION HISTOGRAM
    (≤ #distinct durations rows — bounded like the degree-histogram
    family, never a per-user window).
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(user_col).agg(
        F.min(ts_us).alias("_f"), F.max(ts_us).alias("_l")
    )
    deaths = (
        events.where(F.col(type_col) == death_event)
        .groupBy(user_col)
        .agg(F.min(ts_us).alias("_p"))
    )
    obs = per_user.join(deaths, on=user_col, how="left").select(
        F.expr(
            f"CAST((COALESCE(_p, _l) - _f) DIV {int(unit_us)} AS BIGINT)"
        ).alias("t"),
        F.col("_p").isNotNull().cast("long").alias("_death"),
    )
    hist = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_death").cast("long").alias("n_events"),
    )
    w_desc = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = hist.select(
        "t",
        "n_events",
        F.sum("_n").over(w_desc).cast("long").alias("n_risk"),
    )
    term = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("n_events").cast("double") / F.col("n_risk").cast("double")
            )
            * F.lit(1e8),
            0,
        ).cast("long"),
    )
    w_asc = (
        Window.orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = risk.select(
        "t",
        "n_risk",
        "n_events",
        term.alias("_term"),
        F.max((F.col("n_events") == F.col("n_risk")).cast("int"))
        .over(w_asc)
        .alias("_zero"),
    )
    return stepped.select(
        "t",
        "n_risk",
        "n_events",
        F.when(F.col("_zero") == 0, F.sum("_term").over(w_asc))
        .cast("long")
        .alias("log_surv_e8"),
    ).orderBy("t")


def props_key_stats(events: DataFrame, bucket_width: int = 10) -> DataFrame:
    """Semi-structured payload rollup: ``[bucket, n_events, sum_cents,
    n_users]`` — the JSON ``props.k`` field extracted engine-side,
    bucketed by ``k div bucket_width``, with exact integer money sums.

    The crawl/event-log reality: payloads arrive as JSON strings and
    the extraction must happen inside the scan projection (Spark
    ``get_json_object`` is codegen'd — no Python, no UDF), never via a
    parse-to-map materialization.  ``value`` is summed as e2 cents
    (BIGINT) so the aggregate is order-independent and engine-exact.
    Events whose props lack a numeric ``k`` are dropped (strict-cast
    NULL, not an ANSI error, in both engines).
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select(
            k.alias("_k"),
            F.round(F.col("value") * 100, 0).cast("long").alias("_cents"),
            "user_id",
        )
        .select(
            F.expr(f"_k DIV {int(bucket_width)}").alias("_kb"),
            "_cents",
            "user_id",
        )
        .where(F.col("_kb").isNotNull())
        .groupBy(F.col("_kb").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_cents").cast("long").alias("sum_cents"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


def hourly_uniformity(events: DataFrame) -> DataFrame:
    """Pearson chi-square against the uniform hour-of-day profile, per
    event type: ``[event_type, n, chi2_num, chi2]`` with
    ``chi2 = Σ_{h=0..23} (o_h − n/24)² / (n/24) = chi2_num / (24·n)``
    and ``chi2_num = Σ_h (24·o_h − n)²`` — the periodicity detector
    (is this event type clocked or organic?) in exact integers.

    Empty hour bins contribute n² each; they are folded in as
    ``(24 − bins_present)·n²`` so no 24-row scaffold join is needed.
    The single division producing ``chi2`` happens once per type on
    two exact BIGINTs (engine-stable raw IEEE).
    """
    hourly = events.groupBy(
        "event_type", F.hour("ts").alias("_h")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    per_type = hourly.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("_present"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("_oo"),
    )
    # Σ_h (24·o − n)² over ALL 24 bins = 576·Σo² − 48·n·Σo + 24·n²
    #   (present bins) ... with Σo = n and the (24 − present) empty
    #   bins adding n² each: total = 576·Σo² − 48·n² + present·n²
    #   + (24 − present)·n² = 576·Σo² − 24·n²
    num = (F.lit(576) * F.col("_oo") - F.lit(24) * F.col("n") * F.col("n")).cast(
        "long"
    )
    return per_type.select(
        "event_type",
        "n",
        num.alias("chi2_num"),
        (
            num.cast("double") / (F.lit(24).cast("double") * F.col("n").cast("double"))
        ).alias("chi2"),
    )


def positional_attribution(
    events: DataFrame,
    *,
    conv_type: str = "purchase",
    touch_type: str = "click",
    window_seconds: int = 1800,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution:
    ``[conv_id, touch_id, n_touches, credit_e8]`` — 40% of the
    conversion credit to the first touch, 40% to the last, 20% split
    evenly across the middles (the industry-standard 40-20-40 rule
    next to :func:`multitouch_attribution`'s linear split).

    Degenerate paths follow the standard convention: a single touch
    takes 100%, a two-touch path splits 50/50.  Credit is exact
    integer e8 basis points (middles get ``2·10^7 DIV (n−2)``); the
    first/last identification reuses the packed ``epoch·2^20 +
    event_id`` total order, so both engines agree bit-for-bit.
    """
    p = events.where(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("_u"),
        F.unix_timestamp("ts").alias("_pt"),
    )
    c = events.where(F.col("event_type") == touch_type).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("_u"),
        F.unix_timestamp("ts").alias("_ct"),
    )
    pairs = p.join(c, on="_u").where(
        (F.col("_ct") <= F.col("_pt"))
        & (F.col("_ct") > F.col("_pt") - F.lit(int(window_seconds)))
    )
    key = (F.col("_ct") * F.lit(1048576) + F.col("touch_id")).alias("_k")
    pairs = pairs.select("conv_id", "touch_id", key)
    stats = pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.min("_k").alias("_first"),
        F.max("_k").alias("_last"),
    )
    n = F.col("n_touches")
    endpoint = (F.col("_k") == F.col("_first")) | (F.col("_k") == F.col("_last"))
    credit = (
        F.when(n == 1, F.lit(100_000_000))
        .when(n == 2, F.lit(50_000_000))
        .when(endpoint, F.lit(40_000_000))
        .otherwise(F.expr("20000000 DIV (n_touches - 2)"))
    )
    return pairs.join(stats, on="conv_id").select(
        "conv_id",
        "touch_id",
        "n_touches",
        credit.cast("long").alias("credit_e8"),
    )


def shrunken_rates(
    df: DataFrame, key_col: str, flag_col: str, alpha: int = 16
) -> DataFrame:
    """Empirical-Bayes rate smoothing per key: ``[<key>, n, s,
    shrunk_num, shrunk_den, shrunk_rate]`` — the per-key success rate
    pulled toward the global rate with prior strength ``alpha``:

        shrunk = (s + α·(P/N)) / (n + α)
               = (s·N + α·P) / (N·(n + α))     (exact integers)

    The denominator-problem fix every per-host/per-domain quality
    board needs: a 2-document host with 2 passes must NOT outrank a
    10 000-document host at 99% — shrinkage makes small-sample keys
    sit near the prior until they earn their evidence (Gelman's
    partial pooling, the standard crawl-scheduler scoreboard).  Exact
    integer numerator/denominator are emitted so the single division
    is engine-stable; one groupBy plus a broadcast of the two global
    scalars.
    """
    flag = F.col(flag_col).cast("int")
    per = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(flag).cast("long").alias("s"),
    )
    tot = df.agg(
        F.count(F.lit(1)).cast("long").alias("_nn"),
        F.sum(flag).cast("long").alias("_pp"),
    )
    a = F.lit(int(alpha))
    return per.crossJoin(F.broadcast(tot)).select(
        key_col,
        "n",
        "s",
        (F.col("s") * F.col("_nn") + a * F.col("_pp"))
        .cast("long")
        .alias("shrunk_num"),
        (F.col("_nn") * (F.col("n") + a)).cast("long").alias("shrunk_den"),
        (
            (F.col("s") * F.col("_nn") + a * F.col("_pp")).cast("double")
            / (F.col("_nn") * (F.col("n") + a)).cast("double")
        ).alias("shrunk_rate"),
    )
