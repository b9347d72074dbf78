"""Headline benchmark: one JSON line for the driver.

Runs the flagship graph queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology (round 3): every query runs REPS times (default 3, override
$SPARK_GRAFT_BENCH_REPS); "queries" reports per-query MEDIANS, and the
per-rep raw numbers ship under "query_reps" — single-run numbers made
round-over-round deltas unresolvable noise (page-cache state moved
medians by seconds between rounds, VERDICT r2).  "value" is the sum of
derived-suite medians, directly comparable to the r01/r02 single-run
sums.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))

    from pyspark.sql import functions as F

    from dachshund_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        transitivity,
        triangle_counts,
    )
    from dachshund_spark.derived import derived_graph, load_table
    from dachshund_spark.pipeline.dedup import minhash_signatures
    from dachshund_spark.pipeline.text import quality_scores, token_stats
    from dachshund_spark.session import get_spark

    spark = get_spark(
        app_name="dachshund_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    g = derived_graph(spark, sf_dir)
    g.persist()
    n_edges = g.edges.count()

    # untimed JVM/codegen warmup: the first fixpoint of a fresh JVM
    # pays 20-30 s of JIT + codegen compilation that belongs to the
    # session, not the query (rep profile without this: [41.7, 26.9,
    # 12.8] — the median reports the compiler, not the algorithm)
    pagerank(g, fixed_iterations=2, join_hint="broadcast").count()

    query_reps: dict[str, list[float]] = {}

    def timed(name, fn, n_reps=reps, before=None):
        # ``before`` runs OUTSIDE the timer (e.g. clearCache so a rep
        # of a persist()-ing operator can't just read the previous
        # rep's cache and report a fake warm number)
        runs = []
        for _ in range(n_reps):
            if before is not None:
                before()
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        query_reps[name] = runs

    timed("pagerank_10", lambda: pagerank(g, fixed_iterations=10, join_hint="broadcast").agg(F.sum("pagerank")).collect())
    timed("cc_hashmin", lambda: connected_components(g, renumber=False, join_hint="broadcast").agg(F.sum("component")).collect())
    timed("lpa_5", lambda: label_propagation(g, iterations=5, join_hint="broadcast").agg(F.sum("label")).collect())
    timed("triangles", lambda: triangle_counts(g).agg(F.sum("triangles")).collect())
    timed("transitivity", lambda: transitivity(g).collect())

    docs = load_table(spark, sf_dir, "documents")
    timed("token_stats", lambda: token_stats(docs).agg(F.sum("n_tokens")).collect())
    timed("quality", lambda: quality_scores(docs).where("passes_quality").count())
    timed("minhash_sigs", lambda: minhash_signatures(docs).agg(F.min("minhash")).collect())

    derived_suite = list(query_reps)

    # ---- round-5 pipeline legs (outside the headline sum — additive
    # visibility for the text/relational families, not a comparator
    # change): C4 line filtering + cross-doc boilerplate over the doc
    # corpus, RFM/attribution/CUSUM over the 100k-row event stream.
    from dachshund_spark.pipeline.text import boilerplate_lines, c4_line_filters
    from dachshund_spark.relational import (
        cusum_hourly,
        multitouch_attribution,
        rfm_segments,
    )

    events = load_table(spark, sf_dir, "events")
    timed("c4_line_filters", lambda: c4_line_filters(docs).where("doc_kept").count())
    timed(
        "boilerplate_lines",
        lambda: boilerplate_lines(docs).agg(F.sum("n_boilerplate_lines")).collect(),
    )
    timed("rfm_segments", lambda: rfm_segments(events).agg(F.sum("rfm")).collect())
    timed(
        "multitouch_attribution",
        lambda: multitouch_attribution(events).agg(F.sum("credit_e8")).collect(),
    )
    timed("cusum_hourly", lambda: cusum_hourly(events).agg(F.max("max_s")).collect())

    # ---- round-5 session-4 legs: seeded Voronoi partition (single
    # packed state, k-independent), the WTF recommendation composite
    # (PPR → SALSA), and the shingle mirror census.
    from dachshund_spark.algorithms.paths import voronoi_cells
    from dachshund_spark.algorithms.hits import wtf_recommendations
    from dachshund_spark.pipeline.dedup import host_overlap_census
    from dachshund_spark.pipeline.text import tokens as _tok

    timed(
        "voronoi_64",
        lambda: voronoi_cells(g, seed_mod=64).groupBy("cell").count().count(),
    )
    timed(
        "wtf_recs",
        lambda: wtf_recommendations(g, [0, 1, 2, 3]).collect(),
    )

    def _mirrors():
        n = 5
        toks = _tok("text")
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        sh = docs.select(
            F.concat(
                F.lit("h"), F.pmod(F.col("doc_id"), F.lit(16)).cast("string")
            ).alias("host"),
            F.explode(grams).alias("gram"),
        )
        return host_overlap_census(sh, text_col="gram").agg(
            F.sum("n_shared")
        ).collect()

    timed("host_mirrors", _mirrors)

    # ---- hub-heavy power-law fixture: stresses per-superstep state and
    # hub reducers (the derived graph is dense/uniform and does not).
    # Parquet-backed so scans are honest, built once per run.
    import shutil
    import tempfile

    from dachshund_spark import LinkGraph
    from dachshund_spark.bucketed import bucketed_graph, write_bucketed_edges

    pl_nodes, pl_edges = 500_000, 5_000_000
    tmp = tempfile.mkdtemp(prefix="bench_pl_")
    try:
        pl_path = f"{tmp}/edges"
        LinkGraph.powerlaw_graph(
            spark, pl_nodes, pl_edges, seed=9
        ).edges.distinct().write.parquet(pl_path)
        pg = LinkGraph(spark.read.parquet(pl_path))
        # every power-law rep starts cold-cache: pagerank persists its
        # edge table internally, so without clearing, reps 2+ of the
        # plain/salted variants would read the previous rep's cache
        # while the bucketed variant (cache_edges=False) re-scans — an
        # apples-to-oranges comparison
        timed(
            "pagerank_powerlaw_5",
            lambda: pagerank(pg, fixed_iterations=5, dedupe_edges=False)
            .agg(F.sum("pagerank")).collect(),
            before=spark.catalog.clearCache,
        )
        timed(
            "pagerank_powerlaw_salted_5",
            lambda: pagerank(
                pg, fixed_iterations=5, dedupe_edges=False,
                num_salts=16, hub_threshold=10_000,
            ).agg(F.sum("pagerank")).collect(),
            before=spark.catalog.clearCache,
        )
        # salted vs plain LPA on the same skewed fixture (VERDICT r3 #7):
        # shows where the salted label-count reduce pays off vs its
        # two-phase overhead on hub-heavy inputs.
        from dachshund_spark.algorithms import label_propagation

        timed(
            "lpa_powerlaw_5",
            lambda: label_propagation(pg, iterations=5)
            .agg(F.countDistinct("label")).collect(),
            before=spark.catalog.clearCache,
        )
        timed(
            "lpa_powerlaw_salted_5",
            lambda: label_propagation(
                pg, iterations=5, num_salts=16, hub_threshold=10_000
            ).agg(F.countDistinct("label")).collect(),
            before=spark.catalog.clearCache,
        )
        write_bucketed_edges(
            spark.read.parquet(pl_path), "bench_pl_bucketed", cpus,
            path=f"{tmp}/bucketed",
        )
        bg = bucketed_graph(spark, "bench_pl_bucketed")
        # cache_edges=True: a persisted bucketed scan KEEPS its
        # hash-partitioning (plan-asserted zero edges-side Exchange in
        # tests/test_plans.py), so this leg measures the real cluster
        # configuration — bucketed layout + cached edges.  clearCache
        # before each rep makes every rep pay its own materialization.
        timed(
            "pagerank_powerlaw_bucketed_5",
            lambda: pagerank(
                bg, fixed_iterations=5, dedupe_edges=False, cache_edges=True
            ).agg(F.sum("pagerank")).collect(),
            before=spark.catalog.clearCache,
        )
        spark.sql("DROP TABLE IF EXISTS bench_pl_bucketed")
        # ---- clique-census family under skew (VERDICT r4 #6): same
        # 500k-node / 5M-edge fixture with 10^4-degree hubs.  Degree
        # orientation bounds the extension fan-out by arboricity, and
        # CPM chain-links triangles per shared edge (T−1, not T²/2) —
        # these legs prove the bounds hold where they matter.  Single
        # rep: the census is deterministic cold-cache work and three
        # reps would add ~5 min of bench wall time for no resolution.
        from dachshund_spark.algorithms.cpm import clique_percolation
        from dachshund_spark.algorithms.triangles import (
            kclique_counts_by_size,
            maximal_clique_counts,
        )

        timed(
            "kclique_census_powerlaw_k4",
            lambda: kclique_counts_by_size(pg, max_k=4).collect(),
            n_reps=1,
            before=spark.catalog.clearCache,
        )
        timed(
            "maximal_cliques_powerlaw_k4",
            lambda: maximal_clique_counts(pg, max_k=4).collect(),
            n_reps=1,
            before=spark.catalog.clearCache,
        )
        timed(
            "cpm_powerlaw_3",
            lambda: clique_percolation(pg)
            .select("community").distinct().count(),
            n_reps=1,
            before=spark.catalog.clearCache,
        )
        # round-5 session-5: Spinner balanced partitioning under hub
        # skew — the per-round (node, part) census is the hub reducer
        # this fixture stresses; single rep (deterministic cold work).
        from dachshund_spark.algorithms.partition import balanced_partition

        timed(
            "balanced_partition_powerlaw_4x4",
            lambda: balanced_partition(pg, k=4, rounds=4)
            .groupBy("part").count().collect(),
            n_reps=1,
            before=spark.catalog.clearCache,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    powerlaw_suite = [k for k in query_reps if k not in derived_suite]

    # ---- round-3 operator additions: reported separately (NOT part of
    # "value") so round-over-round suite totals stay like-for-like
    from dachshund_spark.algorithms.linkpred import cocitation, link_prediction_scores
    from dachshund_spark.pipeline.dedup import drop_common_segments
    from dachshund_spark.pipeline.scoring import linear_scores

    sub = LinkGraph(
        g.edges.where((F.col("src") < 256) & (F.col("dst") < 256))
    )
    timed(
        "linkpred_256",
        lambda: link_prediction_scores(sub).agg(F.sum("cn")).collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "cocitation_256",
        lambda: cocitation(sub).agg(F.sum("weight")).collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "segment_dedup",
        lambda: drop_common_segments(docs, sep=" ", max_doc_frac=0.25)
        .agg(F.sum("n_dropped")).collect(),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    timed(
        "embedding_scores",
        lambda: linear_scores(emb, [((i % 7) - 3) / 4.0 for i in range(64)])
        .where("passes").count(),
    )
    from dachshund_spark.pipeline.retrieval import bm25_topk, chunk_windows

    timed(
        "bm25_top10",
        lambda: bm25_topk(
            docs, ["merge", "scan", "spark", "vector", "window"], k=10
        ).collect(),
    )
    timed(
        "chunk_windows",
        lambda: chunk_windows(docs, window=32, stride=16)
        .agg(F.sum("n_tokens")).collect(),
    )

    # session-5 operators: embeddings, trust, LM stats
    from dachshund_spark.algorithms.fastrp import fastrp_embeddings
    from dachshund_spark.algorithms.trust import sybilrank
    from dachshund_spark.pipeline.lm import bigram_lm_scores, pmi_pairs

    timed(
        "fastrp_8",
        lambda: fastrp_embeddings(g, dim=8, weights=(1, 2), join_hint="broadcast")
        .agg(F.sum("e0")).collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "sybilrank_8",
        lambda: sybilrank(g, [7, 97, 211, 503], rounds=8, join_hint="broadcast")
        .agg(F.sum("trust")).collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "bigram_lm",
        lambda: bigram_lm_scores(docs).agg(F.sum("lp_e8")).collect(),
    )
    timed(
        "pmi_top100",
        lambda: pmi_pairs(docs, min_count=5, top_k=100).collect(),
    )
    from dachshund_spark.algorithms.batch_ppr import batch_personalized_pagerank
    from dachshund_spark.algorithms.matching import maximal_matching

    timed(
        "matching",
        lambda: maximal_matching(g).count(),
        before=spark.catalog.clearCache,
    )
    timed(
        "batch_ppr_4x6",
        lambda: batch_personalized_pagerank(g, [7, 97, 211, 503], iterations=6)
        .agg(F.sum("rank")).collect(),
        before=spark.catalog.clearCache,
    )
    # session-8 operators: WARC ingestion round-trip + GNN sampling
    from dachshund_spark.pages import generate_pages
    from dachshund_spark.pages.warc import pages_to_warc_files, warc_to_pages
    from dachshund_spark.skew import khop_neighbor_sample

    pages = generate_pages(g).persist()
    pages.count()
    timed(
        "warc_ingest",
        lambda: warc_to_pages(
            pages_to_warc_files(pages, num_files=32, gzipped=True)
        ).count(),
    )
    pages.unpersist()
    seeds = (
        g.edges.select(F.col("src").alias("node_id"))
        .distinct()
        .where(F.col("node_id") % 16 == 0)
    )
    timed(
        "khop_sample_2x8",
        lambda: khop_neighbor_sample(
            g.edges.distinct(), seeds, fanouts=(8, 8), seed=7
        ).count(),
    )

    # round-5 session-5 operators: coupled damping sweep (amortization
    # evidence vs pagerank_10 — 4 sweep points for ~the cost of one),
    # parallel-pivot correlation clustering, forest-fire sampling,
    # trigram Stupid Backoff.
    from dachshund_spark.algorithms.correlation import correlation_pivot
    from dachshund_spark.algorithms.pagerank import pagerank_damping_sweep
    from dachshund_spark.pipeline.lm import stupid_backoff_scores
    from dachshund_spark.walks import forest_fire_sample

    timed(
        "damping_sweep_4x10",
        lambda: pagerank_damping_sweep(g, iterations=10)
        .agg(F.sum("pagerank")).collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "correlation_pivot_12",
        lambda: correlation_pivot(g, rounds=12)
        .select("cluster").distinct().count(),
        before=spark.catalog.clearCache,
    )
    timed(
        "forest_fire_8",
        lambda: forest_fire_sample(g, rounds=8, seed_mod=64)
        .groupBy("round_burned").count().collect(),
        before=spark.catalog.clearCache,
    )
    timed(
        "stupid_backoff",
        lambda: stupid_backoff_scores(docs).agg(F.sum("sb_e8")).collect(),
    )

    newop_suite = [
        k for k in query_reps if k not in derived_suite and k not in powerlaw_suite
    ]

    medians = {k: round(statistics.median(v), 3) for k, v in query_reps.items()}
    mins = {k: round(min(v), 3) for k, v in query_reps.items()}
    pl_queries = {k: medians[k] for k in powerlaw_suite}
    newop_queries = {k: medians[k] for k in newop_suite}

    # "value" stays the r01/r02-comparable derived-suite total (now the
    # sum of per-query medians); the power-law skew fixture reports
    # separately so round-over-round comparisons are like-for-like
    total = round(sum(medians[k] for k in derived_suite), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "query_min": mins,
        "query_reps": query_reps,
        "reps": reps,
        "powerlaw_fixture": {
            "edges": pl_edges,
            "nodes": pl_nodes,
            "seconds": round(sum(pl_queries.values()), 3),
            "queries": pl_queries,
        },
        "newop_suite": {
            "seconds": round(sum(newop_queries.values()), 3),
            "queries": newop_queries,
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "edges": n_edges,
        "pagerank_edges_per_sec": round(10 * n_edges / medians["pagerank_10"], 1),
    }
    # Detail line first (full rep arrays — large), compact summary LAST:
    # the driver tail-captures stdout and parses the final line, and r03's
    # single giant line outgrew the capture window (BENCH_r03.json
    # parsed:null). The last line must always fit and always parse.
    detail = dict(result, metric="bench_detail")
    print(json.dumps(detail))
    summary = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "sf": result["sf"],
        "cpus": cpus,
        "edges": n_edges,
        "reps": reps,
        "powerlaw_seconds": result["powerlaw_fixture"]["seconds"],
        "newop_seconds": result["newop_suite"]["seconds"],
        "pagerank_edges_per_sec": result["pagerank_edges_per_sec"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
