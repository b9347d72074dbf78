"""CLI: mine quasi-bicliques from a 6-col typed TSV.

The reference binary reads typed edge rows (and optional seed rows) on
stdin and emits one wide result line per graph
(/root/reference/src/clique_miner.rs:22-108,
src/dachshund/candidate.rs:264-304)::

    python -m dachshund_spark.miner in.tsv out.tsv \
        --typespec '[["author","published_at","conference"]]' \
        --beam-size 20 --alpha 1.0 --global-thresh 1.0 --local-thresh 1.0

``--long-format`` switches to the one-line-per-member output
(candidate.rs:332-359).  Output lines sort by graph id.  Output is
collected to the driver (one or |members| lines per graph); for
cluster-scale graph counts write the frame with ``.write.text``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m dachshund_spark.miner",
        description="Find (quasi-)bicliques in typed graphs from 6-col TSV.",
    )
    ap.add_argument("input", help="input TSV (graph_id\\tcore\\tnon_core\\t"
                                  "core_type\\tedge_type\\tnon_core_type; "
                                  "3-col rows are clique seeds)")
    ap.add_argument("output", help="output TSV path, or - for stdout")
    ap.add_argument("--typespec", required=True,
                    help='JSON array of [core_type, edge_type, non_core_type]')
    ap.add_argument("--beam-size", type=int, default=20)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--global-thresh", type=float, default=1.0)
    ap.add_argument("--local-thresh", type=float, default=1.0)
    ap.add_argument("--num-to-search", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--max-repeated-prior-scores", type=int, default=3)
    ap.add_argument("--min-degree", type=int, default=0)
    ap.add_argument("--long-format", action="store_true",
                    help="one graph_id\\tnode_id\\ttype line per member")
    args = ap.parse_args(argv)

    from dachshund_spark.clique.miner import SearchProblem, mine_cliques_detailed
    from dachshund_spark.io_tsv import (
        miner_result_long_rows,
        miner_result_wide_rows,
        read_typed_tsv,
    )
    from dachshund_spark.session import get_spark

    typespec = json.loads(args.typespec)
    core_type = typespec[0][0]
    problem = SearchProblem(
        beam_size=args.beam_size,
        alpha=args.alpha,
        global_thresh=args.global_thresh,
        local_thresh=args.local_thresh,
        num_to_search=args.num_to_search,
        num_epochs=args.epochs,
        max_repeated_prior_scores=args.max_repeated_prior_scores,
        min_degree=args.min_degree,
    )

    spark = get_spark(app_name="dachshund_miner")
    edges, seed_rows = read_typed_tsv(spark, args.input)
    seeds = None
    if not seed_rows.isEmpty():
        from pyspark.sql import functions as F

        seeds = seed_rows.select(
            "graph_id",
            F.col("node_id").cast("long").alias("node_id"),
            (F.col("node_type") == core_type).alias("is_core"),
        )
    results = mine_cliques_detailed(
        edges, typespec, core_type, problem=problem, seeds=seeds
    )
    rows = (
        miner_result_long_rows(results, core_type)
        if args.long_format
        else miner_result_wide_rows(results)
    )
    # numeric graph-id order (a plain string sort would put "10" < "2")
    lines = sorted(
        (r.value for r in rows.collect()),
        key=lambda l: (int(l.split("\t", 1)[0]), l),
    )
    text = "\n".join(lines) + ("\n" if lines else "")
    if args.output == "-":
        sys.stdout.write(text)
    else:
        with open(args.output, "w") as fh:
            fh.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
