"""Physical-plan red-flag audit over the driver contract.

Runs a set of queries' plans (no execution) and greps the executed
plan for constructs that destroy 100-TB behavior:

* ``CartesianProduct`` — an accidental cross join
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan
* ``Exchange SinglePartition`` — a global funnel (only flagged for
  queries not on the allowlist below; bounded top-k/LIMIT-1 scalar
  handoffs and ≤64-row sweep windows legitimately compile to one)
* unpartitioned ``Window`` (a global ``Window.orderBy`` with no
  partitionBy) — the same funnel wearing a different node: when the
  child is already single-partition no new Exchange is inserted, so
  the Exchange check alone misses it (same allowlist)

Usage: python tools/explain_audit.py [query ...]   (default: core set)
Exit code 1 when any un-allowlisted flag fires.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

CORE = [
    "pagerank_10",
    "cc_components",
    "lpa_5",
    "triangle_counts",
    "kcore_10",
    "coreness_all",
    "scan_clusters",
    "lspar_sparsify",
    "refex_2",
    "wl_hash_3",
    "minhash_lsh_candidates",
    "dedup_exact_groups",
    "host_pagerank_10",
]

# queries whose plans contain a *bounded* single-partition step by
# design (LIMIT-k scalar handoffs, ≤64-row sweep windows, driver-facing
# top-k output, histogram-sized window cumsums) — SinglePartition is
# not flagged for them
SINGLE_PARTITION_OK = {
    "sweep_cut_0",
    "double_sweep_diameter",
    "hub_top20",
    "cms_top20",
    "mutual_links_top20",
    "pmi_top100",
    "crawl_budget_10000",
    "shipping_priority",
    # global window over the distinct-DEGREE histogram (≤ max-degree
    # rows — millions at worst, never edge-scale) by design:
    "rich_club",
    "degree_quantiles",
    "degree_gini",
    "core_periphery",
    "erdos_gallai",
    # lifetime histogram (≤ #distinct day counts rows):
    "kaplan_meier",
    # global window over the per-DISTANCE neighborhood function
    # (≤ diameter+1 rows):
    "effective_diameter_64",
    "distance_summary_64",
    # global rank over LIMIT-20 candidate lists (bounded by
    # construction before the window):
    "rrf_top10",
}

HARD_FLAGS = ("CartesianProduct", "BatchEvalPython")


def _flag_single_partition(plan: str) -> bool:
    """True when a final-plan SinglePartition exchange feeds anything
    OTHER than the last step of a global scalar aggregate.

    ``Exchange SinglePartition`` directly over
    ``HashAggregate(keys=[], functions=[partial_...`` is the standard
    finish of a per-graph/global agg — it moves one partial row per
    upstream partition, bounded at any data scale — so it is never a
    red flag."""
    final = plan.split("== Initial Plan ==")[0]
    lines = final.split("\n")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        # keys=[] with partial_/merge_ functions = one row per upstream
        # partition (count-distinct finals interleave merge_ + partial_;
        # plain count(1) can compile to an EMPTY functions list whose
        # rows are counted downstream — same bounded shape)
        if "HashAggregate(keys=[], functions=[" in child and (
            "partial_" in child
            or "merge_" in child
            or "functions=[], output=[]" in child
        ):
            continue
        return True
    return False


def _window_spec_groups(line: str) -> list[str]:
    """Top-level bracket groups of a ``Window [...], [...](, [...])``
    plan line: [window exprs, partition spec?, order spec?]."""
    i = line.find("Window [")
    if i < 0:
        return []
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in line[i + 7 :]:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _flag_global_window(plan: str) -> bool:
    """True when a final-plan WindowExec has an order spec but no
    partition spec — an all-rows-to-one-task sort funnel even when no
    fresh ``Exchange SinglePartition`` appears (the child may already
    be single-partition).  A partitioned window renders three top-level
    groups (exprs, partition, order); a global ordered one renders two
    with the last being the order spec (ASC/DESC markers)."""
    final = plan.split("== Initial Plan ==")[0]
    for line in final.split("\n"):
        if "Window [" not in line:
            continue
        groups = _window_spec_groups(line)
        if len(groups) == 2 and (
            " ASC" in groups[-1] or " DESC" in groups[-1]
        ):
            return True
    return False


def audit(names: list[str]) -> int:
    import __spark_entry__ as entry
    from dachshund_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    bad = 0
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = [f for f in HARD_FLAGS if f in plan]
        if name not in SINGLE_PARTITION_OK and _flag_single_partition(plan):
            flags.append("Exchange SinglePartition")
        if name not in SINGLE_PARTITION_OK and _flag_global_window(plan):
            flags.append("unpartitioned Window")
        if flags:
            bad += 1
            print(f"FLAG {name}: {', '.join(flags)}")
        else:
            print(f"ok   {name}")
    return 1 if bad else 0


if __name__ == "__main__":
    names = sys.argv[1:] or CORE
    raise SystemExit(audit(names))
