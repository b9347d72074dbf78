"""Physical-plan quality checks: pushdown, pruning, codegen, broadcast.

These guard the properties that matter at 100 TB: a regression that
reads the whole pages row for a 2-column projection, or turns the
superstep join into a per-superstep sort, would pass value tests but
destroy scale behavior.
"""

import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.pages import generate_pages, pages_to_edges
from tests.fixtures import KARATE_EDGES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    generate_pages(LinkGraph.from_edgelist(spark, KARATE_EDGES)).write.parquet(path)
    return path


def test_pages_scan_prunes_columns(spark, pages_parquet):
    # pages -> edges must read only (url, html): never text/warc_ts/lang
    pages = spark.read.parquet(pages_parquet)
    edges, _nodes = pages_to_edges(pages)
    plan = plan_of(edges)
    assert "ReadSchema" in plan
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    for line in read_schemas:
        assert "text" not in line and "warc_ts" not in line and "lang" not in line


def test_filter_pushdown_to_parquet(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    q = pages.where(F.col("lang") == "en").select("url")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan


def test_degree_agg_is_codegen_and_partial(spark, pages_parquet):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    deg = g.degrees()
    plan = plan_of(deg)
    # two-phase aggregation: map-side partial_count before the exchange
    assert "partial_count" in plan
    assert plan.count("HashAggregate") >= 2
    # codegen spans appear in the finalized adaptive plan (parquet-backed
    # frame so the scan itself is codegen-friendly)
    pages = spark.read.parquet(pages_parquet)
    q = pages.groupBy("lang").count()
    q.collect()
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in plan_of(q)


def test_small_dim_join_broadcasts(spark):
    # a small dimension joined to a big fact goes broadcast under AQE
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    q = li.join(nation, li.l_suppkey == nation.s_suppkey).groupBy("s_name").count()
    q.collect()  # let AQE finalize
    assert "BroadcastHashJoin" in plan_of(q)


def test_superstep_join_uses_hint(spark):
    from dachshund_spark.util import hinted

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    e = g.undirected_edges()
    state = g.nodes().withColumn("label", F.col("node_id"))
    joined = e.join(
        hinted(state.withColumnRenamed("node_id", "src"), "broadcast"), on=["src"]
    )
    assert "BroadcastHashJoin" in plan_of(joined)
    joined_sh = e.join(
        hinted(state.withColumnRenamed("node_id", "src"), "shuffle_hash"), on=["src"]
    )
    assert "ShuffledHashJoin" in plan_of(joined_sh)


def test_anti_join_for_exclusion(spark):
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    bad = g.nodes().limit(3)
    plan = optimized_of(g.excluding_nodes(bad).edges)
    assert "LeftAnti" in plan


def test_bucketed_edges_eliminate_superstep_shuffle(spark, tmp_path_factory):
    """CSR-style bucketed adjacency: a superstep-shaped join keyed on
    src must read the bucket layout (no edges-side Exchange); only the
    small state side shuffles."""
    from dachshund_spark.bucketed import bucketed_graph, write_bucketed_edges

    d = str(tmp_path_factory.mktemp("bucketed") / "edges")
    edges = (
        spark.range(20_000)
        .select((F.col("id") % 997).alias("src"), ((F.col("id") * 13) % 997).alias("dst"))
        .distinct()
    )
    write_bucketed_edges(edges, "t_bucket_edges", 4, path=d)
    e = bucketed_graph(spark, "t_bucket_edges").edges
    state = spark.range(997).select(
        F.col("id").alias("src"), (F.col("id") * 0.001).alias("rank")
    )
    # the PageRank superstep shape: edges ⋈ state on src → sum by dst
    j = e.join(state.hint("shuffle_hash"), "src").groupBy("dst").agg(
        F.sum("rank").alias("contrib")
    )
    j.collect()
    plan = plan_of(j)
    # AQE renders "== Final Plan ==" then "== Initial Plan ==" — only
    # judge the final one
    plan = plan.split("== Initial Plan ==")[0]
    assert "Bucketed: true" in plan
    # every Exchange must key on dst (the aggregation) or feed the
    # state side — never re-partition the edges scan by src
    scan_side_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(src" in l
    ]
    # exactly one allowed: the state side matching the bucket count
    assert len(scan_side_exchanges) <= 1
    # and the bucketed FileScan must not sit under any src-Exchange:
    # assert by position — the scan line must come before the first
    # src exchange in the tree rendering only if that exchange is on
    # the state branch (state is a Range scan, not a FileScan)
    for line in plan.splitlines():
        if "FileScan parquet" in line and "t_bucket_edges" in line:
            assert "Bucketed: true" in line


def test_hyperball_superstep_partial_merges_sketches(spark):
    """The HyperBall superstep must pre-merge sketches map-side
    (partial_hll_union_agg before the Exchange) so a hub's incoming
    sketch messages combine before the shuffle — the property that
    keeps the superstep hub-safe at web scale."""
    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    # run_fixpoint materializes the state every superstep; mirror that
    # so the plan is the per-superstep plan, not the inlined init
    edges = g.undirected_edges().localCheckpoint(eager=True)
    st = (
        g.nodes()
        .groupBy("node_id")
        .agg(F.hll_sketch_agg("node_id", F.lit(12)).alias("sk"))
        .localCheckpoint(eager=True)
    )
    nbr = edges.join(st.withColumnRenamed("node_id", "dst"), on=["dst"]).select(
        F.col("src").alias("node_id"), "sk"
    )
    new = st.unionByName(nbr).groupBy("node_id").agg(
        F.hll_union_agg("sk").alias("sk")
    )
    plan = plan_of(new)
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_hll_union_agg" in final
    # the merge agg is the superstep's ONLY shuffle
    merge_exchanges = [
        l for l in final.splitlines()
        if "Exchange hashpartitioning(node_id" in l
    ]
    assert len(merge_exchanges) == 1


def test_linkpred_reads_cached_intermediates(spark):
    # deg (3 refs) and adj (both wedge sides) must come from the cache,
    # not re-run the symmetrize-distinct chain per reference
    from dachshund_spark.algorithms.linkpred import link_prediction_scores

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    df = link_prediction_scores(g)
    df.collect()
    plan = plan_of(df)
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    # candidate generation is a wedge equi-join, never a cross product
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cocitation_self_join_is_equi_join(spark):
    from dachshund_spark.algorithms.linkpred import cocitation

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    df = cocitation(g)
    df.collect()
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_linear_scores_plan_is_shuffle_free(spark):
    # broadcast-model inference: one projection over the scan, no
    # Exchange anywhere (the weights are plan literals)
    from dachshund_spark.pipeline.scoring import linear_scores

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = linear_scores(emb, [0.25] * 64)
    plan = plan_of(df)
    assert "Exchange" not in plan
    # and only (vec_id, embedding) leave the parquet scan
    sch = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert sch and "label" not in sch[0]


def test_bm25_term_stats_broadcast_and_filtered_explode(spark, tmp_path_factory):
    """BM25's postings side must (a) filter the exploded tokens to the
    query vocabulary BEFORE the (token, doc) aggregation and (b) join
    the tiny term-stats table by broadcast, never sort-merge."""
    from dachshund_spark.pipeline.retrieval import bm25_topk

    path = str(tmp_path_factory.mktemp("docs") / "d.parquet")
    spark.createDataFrame(
        [(i, "alpha beta gamma " * (i % 3 + 1)) for i in range(100)],
        "doc_id long, text string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    q = bm25_topk(docs, ["alpha", "gamma"], k=5)
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan
    # the IN filter sits below the partial aggregation: the filter
    # operator references token and appears in the same plan as the
    # partial_count (map-side combine preserved)
    assert "partial_count" in plan
    assert "token" in plan and ("alpha" in plan and "gamma" in plan)


def test_chunk_windows_is_shuffle_free(spark, tmp_path_factory):
    """Chunking is pure column algebra: no Exchange anywhere."""
    from dachshund_spark.pipeline.retrieval import chunk_windows

    path = str(tmp_path_factory.mktemp("docs2") / "d.parquet")
    spark.createDataFrame(
        [(i, "w " * 40) for i in range(10)], "doc_id long, text string"
    ).write.parquet(path)
    q = chunk_windows(spark.read.parquet(path), window=8, stride=4)
    plan = plan_of(q)
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final


def test_phrase_matches_joins_are_equi(spark, tmp_path_factory):
    """Phrase search must compile to hash equi-joins on
    (doc_id, start) — no BroadcastNestedLoopJoin / cartesian."""
    from dachshund_spark.pipeline.retrieval import phrase_matches

    path = str(tmp_path_factory.mktemp("docs3") / "d.parquet")
    spark.createDataFrame(
        [(i, "a b c a b") for i in range(50)], "doc_id long, text string"
    ).write.parquet(path)
    q = phrase_matches(spark.read.parquet(path), ["a", "b", "c"])
    plan = plan_of(q)
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_pmi_marginal_joins_broadcast(spark):
    from dachshund_spark.pipeline.lm import pmi_pairs

    docs = spark.createDataFrame(
        [(i, "a b c d e a b c") for i in range(20)], "doc_id long, text string"
    )
    plan = plan_of(pmi_pairs(docs, min_count=1, top_k=10))
    # both marginal joins and the scalar-N join ride broadcasts — the
    # co-occurrence table never reshuffles on the tiny marginal side
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bigram_lm_vocab_is_broadcast_and_no_udf(spark):
    from dachshund_spark.pipeline.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(i, "x y z x y") for i in range(20)], "doc_id long, text string"
    )
    plan = plan_of(bigram_lm_scores(docs))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # pair extraction is array algebra in codegen, never a Python UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fastrp_state_sums_are_partial(spark):
    from dachshund_spark.algorithms.fastrp import fastrp_embeddings

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    plan = plan_of(fastrp_embeddings(g, dim=4, weights=(1, 2)))
    # elementwise sums keep map-side partial aggregation (one shuffle
    # per power, dim columns folded into the same aggregate)
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_registers_partial_agg_and_bounded_shuffle(spark):
    from dachshund_spark.pipeline.sketches import hll_registers

    df = spark.createDataFrame(
        [("k", f"v{i}") for i in range(200)], "k string, v string"
    )
    plan = plan_of(hll_registers(df, ["k"], "v"))
    # the max-merge must combine map-side: the shuffle carries at most
    # 2^p rows per key regardless of input size
    assert "partial_max" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cdc_chunking_is_pure_array_algebra(spark):
    from dachshund_spark.pipeline.dedup import cdc_chunks

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(10)],
        "doc_id long, text string",
    )
    plan = plan_of(cdc_chunks(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # dup-count join rides a broadcast or hash join, never nested-loop
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cached_bucketed_scan_keeps_partitioning(spark, tmp_path_factory):
    """Persisting a bucketed table scan must PRESERVE its bucket
    hash-partitioning: InMemoryTableScan reuses the cached plan's
    outputPartitioning, so a superstep join on src over the CACHED
    bucketed edges still has zero src-Exchange on the edges side —
    this is why pagerank(bucketed_graph(...), cache_edges=True) is the
    recommended cluster configuration when the table fits RAM."""
    from dachshund_spark.bucketed import bucketed_graph, write_bucketed_edges

    d = str(tmp_path_factory.mktemp("bucketed_cached") / "edges")
    edges = (
        spark.range(20_000)
        .select((F.col("id") % 997).alias("src"), ((F.col("id") * 13) % 997).alias("dst"))
        .distinct()
    )
    write_bucketed_edges(edges, "t_bucket_cached", 4, path=d)
    e = bucketed_graph(spark, "t_bucket_cached").edges.persist()
    try:
        e.count()  # materialize the cache
        state = spark.range(997).select(
            F.col("id").alias("src"), (F.col("id") * 0.001).alias("rank")
        )
        j = e.join(state.hint("shuffle_hash"), "src").groupBy("dst").agg(
            F.sum("rank").alias("contrib")
        )
        j.collect()
        plan = plan_of(j).split("== Initial Plan ==")[0]
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
        src_exchanges = [
            l for l in plan.splitlines() if "Exchange hashpartitioning(src" in l
        ]
        # only the state side may shuffle on src (to meet the 4-bucket
        # layout); the cached edge scan itself must not
        assert len(src_exchanges) <= 1
    finally:
        e.unpersist()
        spark.sql("DROP TABLE IF EXISTS t_bucket_cached")


def test_sweep_topk_is_take_ordered_not_global_sort(spark):
    # the sweep's top-64 ranking must compile to a distributed
    # TakeOrderedAndProject; a global Sort over an Exchange
    # SinglePartition would serialize the whole PPR vector
    from dachshund_spark.algorithms.sweep import ppr_push_integer

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    r = ppr_push_integer(g, 1, iterations=2)
    deg = g.degrees()
    keyed = r.join(deg, on="node_id").withColumn(
        "_key", F.expr("(r * 1000000) DIV degree")
    )
    top = keyed.orderBy(F.desc("_key"), F.asc("node_id")).limit(64)
    assert "TakeOrderedAndProject" in plan_of(top)


def test_refex_neighbor_sums_are_partial_aggregated(spark):
    from dachshund_spark.algorithms.roles import refex_features

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    plan = plan_of(refex_features(g, rounds=2))
    # map-side combine on the decimal sums before each shuffle
    assert "partial_sum" in plan


def test_wl_hash_no_sorted_multiset_collection(spark):
    # the WL fold must stay a sum aggregate — collect_list/sort_array
    # (the textbook multiset concat) would explode on hub partitions
    from dachshund_spark.algorithms.wl import wl_graph_hash

    g = LinkGraph.from_edgelist(spark, KARATE_EDGES)
    plan = plan_of(wl_graph_hash(g, rounds=2))
    assert "collect_list" not in plan and "sort_array" not in plan
    assert "partial_sum" in plan


def test_kmeans_centroid_join_is_broadcast(spark):
    from dachshund_spark.pipeline.clustering import quantize_points

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    pts = quantize_points(emb)
    cent = pts.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("cl"), "d", F.col("q").alias("c")
    )
    joined = pts.join(F.broadcast(cent), on="d")
    assert "BroadcastHashJoin" in plan_of(joined)


@pytest.mark.quick
def test_component_renumber_broadcast_gate_both_branches(spark, monkeypatch):
    """_BROADCAST_COMPONENT_GATE picks the join strategy for gluing
    component_id back onto the labels: under the gate the (distinct
    components) side must be an explicit broadcast; past the gate it
    must fall back to a shuffle join (the checkpointed state has
    default-huge stats, so nothing auto-broadcasts)."""
    from dachshund_spark.algorithms import components as comp_mod
    from dachshund_spark.algorithms.components import connected_components

    edges = KARATE_EDGES + [(100, 101), (101, 102)]
    g = LinkGraph.from_edgelist(spark, edges)

    broadcasted = connected_components(g, renumber=True)
    plan_b = plan_of(broadcasted)
    assert "BroadcastHashJoin" in plan_b
    assert "SortMergeJoin" not in plan_b and "ShuffledHashJoin" not in plan_b

    monkeypatch.setattr(comp_mod, "_BROADCAST_COMPONENT_GATE", 0)
    shuffled = connected_components(g, renumber=True)
    plan_s = plan_of(shuffled)
    assert "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s

    # both branches produce identical assignments
    rows_b = sorted(map(tuple, broadcasted.collect()))
    rows_s = sorted(map(tuple, shuffled.collect()))
    assert rows_b == rows_s
