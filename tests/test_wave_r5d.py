"""Round-5 wave D: RFM/streaks/Q15 relational ops, C4-style line
filters + mojibake census, Levenshtein name near-dups, outlink host
entropy, feature propagation, grid-DBSCAN.

Semantics pins the oracles can't express as crisply: streak merges
across month boundaries, RFM strict-compare tie bucketing, the C4
last-line (no terminal punct) drop, feature-prop carry vs fill, and
DBSCAN core/border/noise role boundaries on a hand-built grid.
"""

import datetime

import pytest

pytestmark = pytest.mark.quick


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, m, d, h), u, "t", v, "{}")
            for i, (u, m, d, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_activity_streaks_month_boundary_and_gaps(spark):
    from dachshund_spark.relational import activity_streaks

    # user 1: Jan 30, 31, Feb 1 = one 3-day streak across the month
    # boundary; then Feb 5 alone. user 2: two events same day = 1 day.
    ev = _events(
        spark,
        [
            (1, 1, 30, 1, 0.0),
            (1, 1, 31, 2, 0.0),
            (1, 2, 1, 3, 0.0),
            (1, 2, 5, 4, 0.0),
            (2, 1, 10, 1, 0.0),
            (2, 1, 10, 9, 0.0),
        ],
    )
    out = {r["user_id"]: r for r in activity_streaks(ev).collect()}
    assert out[1]["n_active_days"] == 4
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[1]["last_streak_len"] == 1  # Feb 5 is the latest island
    assert out[2]["n_active_days"] == 1
    assert out[2]["longest_streak"] == 1


def test_rfm_strict_compare_ties_land_low(spark):
    from dachshund_spark.relational import rfm_segments

    # four users, all identical metrics -> every threshold equals the
    # metric, strict > / < all false -> every score is exactly 1.
    ev = _events(
        spark,
        [(u, 1, 10, 1, 5.0) for u in (1, 2, 3, 4)],
    )
    rows = rfm_segments(ev).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r["r_score"], r["f_score"], r["m_score"]) == (1, 1, 1)
        assert r["rfm"] == 111
        assert r["recency_days"] == 0
        assert r["monetary_e4"] == 50000


def test_top_supplier_returns_all_ties(spark):
    from dachshund_spark.relational import top_revenue_suppliers

    supplier = spark.createDataFrame(
        [(1, "s1", 0.0), (2, "s2", 0.0), (3, "s3", 0.0)],
        "s_suppkey long, s_name string, s_acctbal double",
    )
    d = datetime.datetime(1996, 2, 1)
    li = spark.createDataFrame(
        [
            (1, 10.0, 0.0, d),
            (2, 5.0, 0.0, d),
            (2, 5.0, 0.0, d),
            (3, 1.0, 0.0, d),
            (1, 99.0, 0.0, datetime.datetime(1995, 1, 1)),  # outside window
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    out = top_revenue_suppliers(supplier, li).collect()
    assert [(r["s_suppkey"], r["total_revenue_e4"]) for r in out] == [
        (1, 100000),
        (2, 100000),
    ]


def test_c4_line_filters_rules(spark):
    from dachshund_spark.pipeline.text import c4_line_filters

    # ' the ' injection makes 3 lines; the final line never has
    # terminal punctuation so it is always dropped; short lines drop.
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six the a b c d e f the tail"),
            (2, "tiny the also tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filters(docs).collect()}
    assert out[1]["n_lines"] == 3
    # line 1 'one..six' (6 words, kept), line 2 'the a b c d e f'
    # (7 words, kept), line 3 'the tail' = last -> dropped
    assert out[1]["n_kept"] == 2
    assert out[1]["doc_kept"] is False  # needs >= 3 kept lines
    assert out[2]["n_kept"] == 0


def test_mojibake_census_flags_only_corrupted(spark):
    from dachshund_spark.pipeline.text import inject_mojibake, mojibake_census

    docs = spark.createDataFrame(
        [(7, "banana"), (8, "banana")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in mojibake_census(inject_mojibake(docs, every=7)).collect()
    }
    assert out[7]["n_moji_markers"] == 3 and out[7]["moji_flag"] is True
    assert out[7]["n_nonascii"] == 6  # 3 x 'Ã¡'
    assert out[8]["n_moji_markers"] == 0 and out[8]["moji_flag"] is False
    assert out[8]["ascii_ratio_e8"] == 100000000


def test_name_neardups_blocked_on_last_token(spark):
    from dachshund_spark.pipeline.dedup import name_neardup_pairs

    df = spark.createDataFrame(
        [("cold widget",), ("bold widget",), ("cold bolt",), ("cold widget",)],
        "p_name string",
    )
    out = name_neardup_pairs(df, "p_name", max_dist=6, topk=20).collect()
    # only the widget pair shares a block; dist(b->c old widget)=1;
    # duplicates collapse via distinct
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in out] == [
        ("bold widget", "cold widget", 1)
    ]


def test_feature_propagation_fill_and_carry(spark):
    from dachshund_spark.algorithms.featprop import feature_propagation
    from dachshund_spark.graph import LinkGraph

    # path 1-2-3-4: feats known at 1 (=100) and 4 (=400); 2 and 3 fill
    # from both sides over rounds; isolated 5 never fills.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    feats = spark.createDataFrame(
        [(1, 100), (4, 400), (2, None), (3, None), (5, None), (6, None)],
        "node_id long, feat_e8 long",
    )
    out = {
        r["node_id"]: r
        for r in feature_propagation(LinkGraph(edges), feats, rounds=3).collect()
    }
    assert out[1]["feat_e8"] == 100 and out[1]["known"] is True
    assert out[4]["feat_e8"] == 400
    # round1: 2 <- avg(100) = 100, 3 <- avg(400) = 400
    # round2: 2 <- avg(100, 400) = 250, 3 <- avg(100, 400) = 250
    # round3: 2 <- avg(100, 250) = 175, 3 <- avg(250, 400) = 325
    assert out[2]["feat_e8"] == 175 and out[2]["filled"] is True
    assert out[3]["feat_e8"] == 325
    assert out[5]["feat_e8"] is None and out[5]["filled"] is False


def test_grid_dbscan_roles(spark):
    from dachshund_spark.pipeline.clustering import grid_dbscan

    # cluster of 4 mutually-close points (all within eps of each
    # other -> all core, min_pts=4 incl self), one border point within
    # eps of exactly one core, one far noise point. eps_e6=20000.
    def v(x, y):
        return [x, y] + [0.0] * 62

    emb = spark.createDataFrame(
        [
            (1, v(0.000, 0.000)),
            (2, v(0.010, 0.000)),
            (3, v(0.000, 0.010)),
            (4, v(0.010, 0.010)),
            (5, v(0.028, 0.000)),  # within eps of 2 only
            (6, v(0.500, 0.500)),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in grid_dbscan(emb, min_pts=4).collect()}
    for pid in (1, 2, 3, 4):
        assert out[pid]["role"] == "core" and out[pid]["cluster"] == 1
    assert out[5]["role"] == "border" and out[5]["cluster"] == 1
    assert out[6]["role"] == "noise" and out[6]["cluster"] == -1


def test_outlink_host_entropy_uniform_vs_concentrated(spark):
    from dachshund_spark.pages.extract import outlink_host_entropy

    import math

    nodes = spark.createDataFrame(
        [(i, f"https://h{i}.ex.com/p/{i}") for i in range(5)],
        "node_id long, url string",
    )
    # h0 links to h1..h4 once each (uniform, entropy ln 4);
    # h1 links to h2 three times (entropy 0).
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 2), (1, 2)],
        "src long, dst long",
    )
    out = {r["src_host"]: r for r in outlink_host_entropy(edges, nodes).collect()}
    assert out["h0.ex.com"]["n_dst_hosts"] == 4
    assert abs(out["h0.ex.com"]["entropy"] - math.log(4)) < 1e-6
    assert out["h1.ex.com"]["entropy"] == 0.0


def test_seeded_label_prop_pins_seeds_and_breaks_ties_low(spark):
    from dachshund_spark.algorithms.lpa import seeded_label_propagation
    from dachshund_spark.graph import LinkGraph

    # star: center 0 sees one neighbor of cls 2 and one of cls 1 ->
    # tie on count, takes the SMALLER class; leaf 3 takes center's
    # class next round; seed labels never move.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1, 2), (2, 1)], "node_id long, cls long")
    out = {
        r["node_id"]: r
        for r in seeded_label_propagation(
            LinkGraph(edges), seeds, iterations=2
        ).collect()
    }
    assert out[1]["cls"] == 2 and out[1]["is_seed"] is True
    assert out[2]["cls"] == 1
    assert out[0]["cls"] == 1  # tie 1-vs-1 -> min class
    assert out[3]["cls"] == 1 and out[3]["is_seed"] is False


def test_multitouch_attribution_window_and_flags(spark):
    from dachshund_spark.relational import multitouch_attribution

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, etype, mins):
        return (eid, base + datetime.timedelta(minutes=mins), 1, etype, 0.0, "{}")

    events = spark.createDataFrame(
        [
            ev(1, "click", -25),
            ev(2, "click", -10),
            ev(3, "click", -35),   # outside the 30 min window
            ev(4, "purchase", 0),
            ev(5, "click", 5),     # after the conversion
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = multitouch_attribution(events).collect()
    assert len(rows) == 2
    by_touch = {r["touch_id"]: r for r in rows}
    assert set(by_touch) == {1, 2}
    for r in rows:
        assert r["n_touches"] == 2 and r["credit_e8"] == 50000000
    assert by_touch[1]["is_first"] is True and by_touch[1]["is_last"] is False
    assert by_touch[2]["is_last"] is True


def test_greedy_max_coverage_picks_and_gains(spark):
    from dachshund_spark.algorithms.coverage import greedy_max_coverage
    from dachshund_spark.graph import LinkGraph

    # hub 1 -> {2,3,4}; node 5 -> {6}; 7 isolated-ish via 7->2 (its
    # cover overlaps the hub's). greedy: pick 1 (gain 4: {1,2,3,4}),
    # then 5 (gain 2: {5,6}), then 7 (gain 1: {7}).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 6), (7, 2)], "src long, dst long"
    )
    out = greedy_max_coverage(LinkGraph(edges), k=3).orderBy("round").collect()
    assert [(r["round"], r["seed"], r["gain"], r["covered_total"]) for r in out] == [
        (1, 1, 4, 4),
        (2, 5, 2, 6),
        (3, 7, 1, 7),
    ]


def test_canonical_groups_extracts_and_falls_back(spark):
    from dachshund_spark.pages.extract import canonical_groups

    def page(nid, canon):
        link = (
            f'<link rel="canonical" href="{canon}">' if canon else ""
        )
        html = f"<html><head>{link}</head><body>x</body></html>"
        return (f"https://node{nid}.example.com", bytearray(html.encode()))

    pages = spark.createDataFrame(
        [page(1, "https://node0.example.com"),
         page(2, "https://node0.example.com"),
         page(9, None)],
        "url string, html binary",
    )
    out = {r["canonical_url"]: r for r in canonical_groups(pages).collect()}
    g = out["https://node0.example.com"]
    assert g["n_pages"] == 2 and g["keeper_id"] == 1
    # no canonical -> page groups under its own url
    assert out["https://node9.example.com"]["n_pages"] == 1


def test_wav_energy_windows_ragged_tail_and_silence(spark):
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_windows,
        encode_wav,
    )

    # 10 samples, window 8 -> one full frame + a ragged 2-sample tail.
    samples = [100, -100, 0, 0, 0, 0, 0, 0, 30000, -30000]
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, samples)))],
        "media_id long, payload binary",
    )
    out = {
        r["win"]: r
        for r in decode_audio_windows(
            media, window=8, silence_sq=1000000
        ).collect()
    }
    assert out[0]["n"] == 8 and out[0]["sum_sq"] == 20000
    assert out[0]["peak"] == 100
    # cross-multiplied threshold: 20000*8 < 1000000*8 -> silent
    assert out[0]["silent"] is True
    assert out[1]["n"] == 2 and out[1]["sum_sq"] == 2 * 30000 * 30000
    assert out[1]["silent"] is False
    # malformed payload is skipped, not fatal
    bad = spark.createDataFrame(
        [(2, bytearray(b"not a wav"))], "media_id long, payload binary"
    )
    assert decode_audio_windows(bad).count() == 0


def test_boilerplate_lines_threshold(spark):
    from dachshund_spark.pipeline.text import boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha beta. shared footer", "s1"),
            (2, "gamma delta. shared footer", "s1"),
            (3, "epsilon zeta. shared footer", "s1"),
            (4, "unique line here", "s1"),
            (5, "other corpus", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in boilerplate_lines(docs).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 4
    # 'shared footer' appears on 3/4 docs (75% >= 50%) -> boilerplate;
    # every other line is unique.
    assert s1["n_boilerplate_lines"] == 1
    assert out["s2"]["n_boilerplate_lines"] == 1  # 1/1 doc = 100%


def test_cusum_hourly_detects_burst(spark):
    from dachshund_spark.relational import cusum_hourly

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # type 'flat': 2 events/hour for 6 hours -> a_t = 0 always, S = 0.
    for h in range(6):
        for _ in range(2):
            rows.append((eid, base + datetime.timedelta(hours=h), 1, "flat", 0.0, "{}"))
            eid += 1
    # type 'burst': 1/hour for 5 hours then 13 in hour 5.
    for h in range(5):
        rows.append((eid, base + datetime.timedelta(hours=h), 1, "burst", 0.0, "{}"))
        eid += 1
    for _ in range(13):
        rows.append((eid, base + datetime.timedelta(hours=5), 1, "burst", 0.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_type"]: r for r in cusum_hourly(ev).collect()}
    assert out["flat"]["max_s"] == 0
    assert out["flat"]["first_alarm_hour"] == -1
    # burst: N=18, H=6; a = 1*6-18 = -12 for h0..h4 (S pinned at 0),
    # then a = 13*6-18 = 60 at h5 -> S = 60 > N=18 -> alarm at h5.
    b = out["burst"]
    assert b["max_s"] == 60
    assert b["first_alarm_hour"] == int(
        (base + datetime.timedelta(hours=5)).timestamp()
    )
