"""Physical-plan red-flag audit over the driver contract.

Runs a set of queries' plans (no execution) and greps the executed
plan for constructs that destroy 100-TB behavior:

* ``CartesianProduct`` — an accidental cross join
* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan
* ``Exchange SinglePartition`` — a global funnel (only flagged for
  queries not on the allowlist below; bounded top-k/LIMIT-1 scalar
  handoffs and ≤64-row sweep windows legitimately compile to one)

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
# top-k output) — SinglePartition is not flagged for them
SINGLE_PARTITION_OK = {
    "sweep_cut_0",
    "double_sweep_diameter",
    "hub_top20",
    "cms_top20",
    "mutual_links_top20",
    "pmi_top100",
    "crawl_budget_10000",
    "shipping_priority",
}

HARD_FLAGS = ("CartesianProduct", "BatchEvalPython")


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
        if name not in SINGLE_PARTITION_OK and "Exchange SinglePartition" in plan:
            # AQE prints final+initial plans; only count the final one
            final = plan.split("== Initial Plan ==")[0]
            if "Exchange SinglePartition" in final:
                flags.append("Exchange SinglePartition")
        if flags:
            bad += 1
            print(f"FLAG {name}: {', '.join(flags)}")
        else:
            print(f"ok   {name}")
    return 1 if bad else 0


if __name__ == "__main__":
    names = sys.argv[1:] or CORE
    raise SystemExit(audit(names))
