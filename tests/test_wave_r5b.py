"""Round-5 wave-B operators: edge clustering, signed balance,
temporal 3-cycle motifs — value-exact goldens on handcrafted graphs."""

import pytest

from dachshund_spark import LinkGraph
from dachshund_spark.algorithms.temporal import temporal_cycle_count
from dachshund_spark.algorithms.triangles import (
    edge_clustering,
    signed_triangle_balance,
)

pytestmark = pytest.mark.quick


def test_edge_clustering_path_graph(spark):
    # P4 path 0-1-2-3: no triangles; only edge (1,2) has min degree 2,
    # so C3 = (0+1)/(2-1) = 1.0 → score_e9 = 1_000_000_000.
    g = LinkGraph.from_edgelist(spark, [(0, 0, 1), (0, 1, 2), (0, 2, 3)])
    rows = edge_clustering(g).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src, r.dst, r.support, r.score_e9) == (1, 2, 0, 1_000_000_000)


def test_edge_clustering_k4(spark):
    # K4: every edge in 2 triangles, min degree 3 → (2+1)*1e9 // 2.
    edges = [(0, a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    rows = edge_clustering(g).collect()
    assert len(rows) == 6
    assert {(r.support, r.score_e9) for r in rows} == {(2, 1_500_000_000)}


def test_signed_balance_explicit_signs(spark):
    # Two triangles sharing edge (1,2): {0,1,2} and {1,2,3}.
    # Signs: all + except (2,3) → {0,1,2} balanced, {1,2,3} unbalanced.
    g = LinkGraph.from_edgelist(
        spark, [(0, 0, 1), (0, 0, 2), (0, 1, 2), (0, 1, 3), (0, 2, 3)]
    )
    signs = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (1, 2, 1), (1, 3, 1), (2, 3, -1)],
        "src long, dst long, sign int",
    )
    r = signed_triangle_balance(g, signs=signs).collect()[0]
    assert (r.n_triangles, r.n_balanced, r.n_unbalanced) == (2, 1, 1)
    assert r.frac_balanced == 0.5


def test_signed_balance_md5_partition(spark):
    # Default md5 signs: counts must partition the triangle total and be
    # deterministic across invocations.
    edges = [(0, a, b) for a in range(6) for b in range(a + 1, 6)]
    g = LinkGraph.from_edgelist(spark, edges)
    r1 = signed_triangle_balance(g).collect()[0]
    r2 = signed_triangle_balance(g).collect()[0]
    assert r1.n_triangles == 20  # C(6,3)
    assert r1.n_balanced + r1.n_unbalanced == 20
    assert (r1.n_balanced, r1.n_unbalanced) == (r2.n_balanced, r2.n_unbalanced)


def test_temporal_cycles_window(spark):
    # 0→1(t1) 1→2(t2) 2→0(t3): one increasing cycle, span 2.
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (2, 0, 3)], "src long, dst long, t long"
    )
    assert temporal_cycle_count(edges, delta=5).collect()[0].n_cycles == 1
    # span 2 > delta 1 → excluded
    assert temporal_cycle_count(edges, delta=1).collect()[0].n_cycles == 0


def test_temporal_cycles_need_increasing_times(spark):
    # Same structural cycle but times go 3,2,1 in every rotation that
    # closes — no time-respecting ordering exists.
    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 2), (2, 0, 1)], "src long, dst long, t long"
    )
    out = temporal_cycle_count(edges, delta=10).collect()[0]
    assert out.n_cycles == 0
    assert out.n_edges == 3


def test_temporal_cycles_first_contact_dedup(spark):
    # Duplicate contacts collapse to the earliest time: the later
    # (0→1, t=9) observation must not create a second cycle.
    edges = spark.createDataFrame(
        [(0, 1, 1), (0, 1, 9), (1, 2, 2), (2, 0, 3)],
        "src long, dst long, t long",
    )
    out = temporal_cycle_count(edges, delta=10).collect()[0]
    assert (out.n_edges, out.n_cycles) == (3, 1)


def test_mattr_exact(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b a b a"),  # 11 tokens, 2 spans, distinct 2 each
            (1, "x y"),  # shorter than window -> dropped
            (2, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 1 span, all distinct
        ],
        "doc_id long, text string",
    )
    from dachshund_spark.pipeline.text import mattr

    rows = {r.doc_id: r for r in mattr(docs, window=10).collect()}
    assert set(rows) == {0, 2}
    assert (rows[0].n_windows, rows[0].sum_distinct, rows[0].mattr_e8) == (2, 4, 20_000_000)
    assert (rows[2].n_windows, rows[2].sum_distinct, rows[2].mattr_e8) == (1, 10, 100_000_000)


def test_politeness_schedule_shape(spark):
    from dachshund_spark.pipeline.curate import politeness_schedule

    urls = spark.createDataFrame(
        [("h1", f"https://h1/p/{i}", 3) for i in range(5)]
        + [("h2", f"https://h2/p/{i}", 1) for i in range(4)],
        "host string, url string, crawl_delay_s long",
    )
    rows = politeness_schedule(urls).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    # ranks are a permutation 1..n per host; offsets = (rank-1)*delay
    for host, delay, n in (("h1", 3, 5), ("h2", 1, 4)):
        hs = sorted(by_host[host], key=lambda r: r.fetch_rank)
        assert [r.fetch_rank for r in hs] == list(range(1, n + 1))
        assert all(r.fetch_offset_s == (r.fetch_rank - 1) * delay for r in hs)
    # deterministic: same input -> same url order
    again = politeness_schedule(urls).collect()
    assert sorted((r.url, r.fetch_rank) for r in rows) == sorted(
        (r.url, r.fetch_rank) for r in again
    )


def test_mmr_demotes_near_duplicate(spark):
    # b is parallel to a (exact duplicate direction): pure top-k returns
    # (a, b, c); MMR must demote b behind the diverse c.
    from dachshund_spark.pipeline.similarity import mmr_rerank

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 1.0, 0.0, 0.0], 0),  # query
            (1, [2.0, 1.0, 0.0, 0.0], 0),  # a: closest
            (2, [4.0, 2.0, 0.0, 0.0], 0),  # b: exact near-dup of a
            (3, [1.0, 1.0, 1.0, 1.0], 0),  # c: diverse
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = mmr_rerank(vecs, query_id=0, n_candidates=3, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [1, 3, 2]
    assert out[0].mmr_score == out[0].sim_q  # rank 1 is pure relevance
    # near-dup's diversity penalty drives its score negative
    assert out[2].mmr_score < 0 < out[1].mmr_score


def test_recrawl_intervals_mapping(spark):
    from dachshund_spark.algorithms.delta import recrawl_intervals

    def df(rows):
        return spark.createDataFrame(rows, "src long, dst long")

    # page 1: stable across all three; page 2: changes once (s1->s2);
    # page 3: changes both pairs; page 4: appears only in s2 (one change
    # at the s1->s2 boundary, none before? absent->absent counts 0,
    # absent->present counts 1).
    s0 = df([(1, 10), (2, 20), (3, 30)])
    s1 = df([(1, 10), (2, 20), (3, 31)])
    s2 = df([(1, 10), (2, 21), (3, 32), (4, 40)])
    rows = {r.src: r for r in recrawl_intervals([s0, s1, s2]).collect()}
    assert (rows[1].n_changes, rows[1].recrawl_days) == (0, 30)
    assert (rows[2].n_changes, rows[2].recrawl_days) == (1, 7)
    assert (rows[3].n_changes, rows[3].recrawl_days) == (2, 1)
    assert (rows[4].n_changes, rows[4].recrawl_days) == (1, 7)


def test_hll_merge_equals_global(spark):
    # Mergeability: per-bucket sketches max-merged == single-pass sketch.
    from dachshund_spark.pipeline.sketches import hll_registers
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(f"d{i % 3}", f"user{i % 37}") for i in range(500)],
        "day string, u string",
    )
    daily = hll_registers(ev, ["day"], "u")
    merged = daily.groupBy("reg").agg(F.max("rho").alias("rho"))
    glob = hll_registers(ev.select("u"), [], "u")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, glob.collect()))


def test_source_lang_mix_tie_break(spark):
    from dachshund_spark.pipeline.text import source_language_mix

    docs = spark.createDataFrame(
        [(0, "s1", "en"), (1, "s1", "de"), (2, "s1", "de"), (3, "s1", "en"),
         (4, "s2", "fr")],
        "doc_id long, source string, lang string",
    )
    rows = {r.source: r for r in source_language_mix(docs).collect()}
    # s1: en/de tie at 2 -> smallest code 'de'; share 2/4
    assert (rows["s1"].top_lang, rows["s1"].top_share_e8) == ("de", 50_000_000)
    assert (rows["s1"].n_docs, rows["s1"].n_langs) == (4, 2)
    assert (rows["s2"].top_lang, rows["s2"].top_share_e8) == ("fr", 100_000_000)


def test_event_markov_two_cycle(spark):
    # A<->B deterministic 2-cycle: masses swap exactly each round and
    # the e12 stationary state stays a perfect 50/50 split.
    from dachshund_spark.relational import event_markov_stationary
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(3):
        for i in range(6):
            rows.append(
                (u * 10 + i, t0 + datetime.timedelta(minutes=i), u,
                 "A" if i % 2 == 0 else "B")
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.event_type: r.stationary_e12
           for r in event_markov_stationary(ev, iterations=8).collect()}
    assert out == {"A": 500_000_000_000, "B": 500_000_000_000}


def test_event_markov_dangling_mass_drops(spark):
    # A->B only; B never transitions: round 1 moves all mass to B,
    # round 2 drops it (documented dangling semantics).
    from dachshund_spark.relational import event_markov_stationary
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 7, "A"), (2, t0 + datetime.timedelta(minutes=1), 7, "B")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {r.event_type: r.stationary_e12
           for r in event_markov_stationary(ev, iterations=8).collect()}
    assert out == {"A": 0, "B": 0}


def test_spearman_in_star_graph(spark):
    # K1,3 with all edges INTO the center: directed PageRank puts the
    # center highest (it receives all three links) and undirected degree
    # does too; leaves tie at the teleport value and at degree 1, broken
    # by node_id identically in both ranks -> rho exactly 1.
    from dachshund_spark.algorithms.stats import spearman_pagerank_degree

    g = LinkGraph.from_edgelist(spark, [(0, 1, 0), (0, 2, 0), (0, 3, 0)])
    r = spearman_pagerank_degree(g, iterations=10).collect()[0]
    assert (r.n_nodes, r.sum_d2, r.spearman) == (4, 0, 1.0)


def test_spearman_out_star_graph(spark):
    # Same star with edges OUT of the center: the hub now has the LOWEST
    # directed PageRank but the highest degree — rank_pr = (1 for hub,
    # 2..4 for leaves), rank_deg = (4 for hub, 1..3 for leaves), so
    # sum_d2 = 9+1+1+1 = 12 and rho = 1 - 6*12/(4*15) = -0.2.
    from dachshund_spark.algorithms.stats import spearman_pagerank_degree

    g = LinkGraph.from_edgelist(spark, [(0, 0, 1), (0, 0, 2), (0, 0, 3)])
    r = spearman_pagerank_degree(g, iterations=10).collect()[0]
    assert (r.n_nodes, r.sum_d2) == (4, 12)
    assert abs(r.spearman - (-0.2)) < 1e-12


def test_config_model_k4(spark):
    from dachshund_spark.algorithms.stats import configuration_model_check

    edges = [(0, a, b) for a in range(4) for b in range(a + 1, 4)]
    g = LinkGraph.from_edgelist(spark, edges)
    r = configuration_model_check(g).collect()[0]
    assert (r.n_nodes, r.s1, r.s2, r.triangles3, r.wedges) == (4, 12, 36, 12, 12)
    assert r.transitivity == 1.0
    assert abs(r.c_expected - 4.0 / 3.0) < 1e-12
    assert abs(r.excess_ratio - 0.75) < 1e-12


def test_asof_join_semantics(spark):
    import datetime

    from dachshund_spark.relational import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            # user 1: click@0, click@100, purchase@130 -> matches click 11
            (10, ts(0), 1, "click"),
            (11, ts(100), 1, "click"),
            (12, ts(130), 1, "purchase"),
            # purchase@2000: latest click@100 is 1900s back -> outside 1800s
            (13, ts(2000), 1, "purchase"),
            # user 2: purchase with no prior click at all
            (20, ts(50), 2, "purchase"),
            # user 3: click exactly AT purchase time -> matches (<=)
            (30, ts(500), 3, "click"),
            (31, ts(500), 3, "purchase"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = asof_join(
        ev.where("event_type = 'purchase'"),
        ev.where("event_type = 'click'"),
        on="user_id",
        tolerance_s=1800,
    )
    rows = {r.event_id: r for r in out.collect()}
    assert rows[12].matched_event_id == 11 and rows[12].gap_s == 30
    assert rows[13].matched_event_id is None and rows[13].gap_s is None
    assert rows[20].matched_event_id is None
    assert rows[31].matched_event_id == 30 and rows[31].gap_s == 0


def test_degree_entropy_uniform_zero(spark):
    from dachshund_spark.algorithms.stats import degree_entropy

    # 4-cycle: every node degree 2 -> single histogram bucket -> H = 0
    g = LinkGraph.from_edgelist(spark, [(0, 0, 1), (0, 1, 2), (0, 2, 3), (0, 3, 0)])
    r = degree_entropy(g).collect()[0]
    assert (r.n_nodes, r.n_distinct_degrees, r.h_e8_sum) == (4, 1, 0)
    assert r.entropy == 0.0


def test_degree_entropy_two_classes(spark):
    import math

    from dachshund_spark.algorithms.stats import degree_entropy

    # star K1,3: one node degree 3, three nodes degree 1 -> H(1/4, 3/4)
    g = LinkGraph.from_edgelist(spark, [(0, 0, 1), (0, 0, 2), (0, 0, 3)])
    r = degree_entropy(g).collect()[0]
    expect = -(0.25 * math.log(0.25) + 0.75 * math.log(0.75))
    assert abs(r.entropy - expect) < 1e-6
