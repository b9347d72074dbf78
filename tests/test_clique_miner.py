import pytest
from pyspark.sql import functions as F

from dachshund_spark.clique import SearchProblem, mine_cliques, process_typespec

TS2 = [
    ["author", "published_at", "conference"],
    ["author", "published_at", "journal"],
]


def typed_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "graph_id long, core_id long, non_core_id long, core_type string, "
        "edge_type string, non_core_type string",
    )


def test_process_typespec():
    # /root/reference/tests/tests.rs:25-63
    ts = [
        ["author", "published_at", "conference"],
        ["author", "organized", "conference"],
        ["author", "published_at", "journal"],
        ["author", "attended", "conference"],
    ]
    info = process_typespec(ts, "author", ["conference", "journal"])
    assert info["conference"]["type_id"] == 1
    assert info["journal"]["type_id"] == 2
    assert info["conference"]["max_edge_count"] == 3
    assert info["journal"]["max_edge_count"] == 1


def test_single_row(spark):
    # /root/reference/tests/tests.rs:146-155
    df = typed_df(spark, [(0, 1, 2, "author", "published_at", "conference")])
    out = mine_cliques(df, TS2, "author").collect()
    assert len(out) == 1
    assert list(out[0].core_ids) == [1] and list(out[0].non_core_ids) == [2]


def test_small_clique(spark):
    # :157-172
    rows = [
        (0, 1, 3, "author", "published_at", "conference"),
        (0, 2, 3, "author", "published_at", "conference"),
        (0, 1, 4, "author", "published_at", "conference"),
        (0, 2, 4, "author", "published_at", "conference"),
    ]
    out = mine_cliques(typed_df(spark, rows), TS2, "author").collect()[0]
    assert list(out.core_ids) == [1, 2]
    assert list(out.non_core_ids) == [3, 4]
    assert out.cliqueness == 1.0


def test_nonsense_row_tolerated(spark):
    # :174-190 — row with core_type 'conference' is skipped
    rows = [
        (0, 1, 3, "author", "published_at", "conference"),
        (0, 2, 3, "author", "published_at", "conference"),
        (0, 1, 4, "author", "published_at", "conference"),
        (0, 2, 4, "author", "published_at", "conference"),
        (0, 2, 5, "conference", "published_at", "conference"),
    ]
    out = mine_cliques(typed_df(spark, rows), TS2, "author").collect()[0]
    assert list(out.core_ids) == [1, 2] and list(out.non_core_ids) == [3, 4]


def _medium_clique_rows():
    # gen_single_clique(10, [10,10]): cores 0..9, conferences 10..19,
    # journals 20..29, full bipartite via published_at
    # (/root/reference/src/dachshund/test_utils.rs:122-157)
    rows = []
    for c in range(10):
        for n in range(10, 20):
            rows.append((0, c, n, "author", "published_at", "conference"))
        for n in range(20, 30):
            rows.append((0, c, n, "author", "published_at", "journal"))
    return rows


def test_medium_clique(spark):
    # :193-224
    rows = _medium_clique_rows()
    assert len(rows) == 200
    out = mine_cliques(typed_df(spark, rows), TS2, "author").collect()[0]
    assert list(out.core_ids) == list(range(10))
    assert list(out.non_core_ids) == list(range(10, 30))
    assert out.cliqueness == 1.0


def test_medium_clique_insufficient_epochs(spark):
    # :226-259 — 10 epochs from singleton seeds → at most 11 members
    p = SearchProblem(num_epochs=10)
    out = mine_cliques(typed_df(spark, _medium_clique_rows()), TS2, "author", problem=p).collect()[0]
    assert len(out.core_ids) + len(out.non_core_ids) == 11


def test_two_kinds_of_rows(spark):
    # :261-285 — max_edge_count(conference)=2; only node 3 has both
    ts = [
        ["author", "published_at", "conference"],
        ["author", "attended", "conference"],
    ]
    rows = [
        (0, 1, 3, "author", "published_at", "conference"),
        (0, 2, 3, "author", "published_at", "conference"),
        (0, 1, 3, "author", "attended", "conference"),
        (0, 2, 3, "author", "attended", "conference"),
    ]
    out = mine_cliques(typed_df(spark, rows), ts, "author").collect()[0]
    assert list(out.core_ids) == [1, 2] and list(out.non_core_ids) == [3]


def test_another_two_kinds(spark):
    # :287-312 — cores {2,3} have both published+cited to article 5
    ts = [
        ["author", "published", "article"],
        ["author", "cited", "article"],
    ]
    rows = [
        (0, 1, 5, "author", "published", "article"),
        (0, 0, 5, "author", "published", "article"),
        (0, 2, 5, "author", "published", "article"),
        (0, 3, 5, "author", "published", "article"),
        (0, 2, 5, "author", "cited", "article"),
        (0, 4, 5, "author", "published", "article"),
        (0, 3, 5, "author", "cited", "article"),
    ]
    out = mine_cliques(typed_df(spark, rows), ts, "author").collect()[0]
    assert list(out.core_ids) == [2, 3] and list(out.non_core_ids) == [5]


def test_example_txt(spark):
    # /root/reference/example.txt + README.md:25-50 expected output:
    # core [1,2], non-core [3,4], density 1.0
    ts = [["author", "published", "article"]]
    rows = [
        (0, 1, 3, "author", "published", "article"),
        (0, 2, 3, "author", "published", "article"),
        (0, 1, 4, "author", "published", "article"),
        (0, 2, 4, "author", "published", "article"),
        (0, 2, 5, "author", "published", "article"),
    ]
    p = SearchProblem(
        beam_size=20, alpha=0.1, global_thresh=1.0, local_thresh=1.0,
        num_to_search=10, num_epochs=200, max_repeated_prior_scores=3,
        min_degree=1,
    )
    out = mine_cliques(typed_df(spark, rows), ts, "author", problem=p).collect()[0]
    assert list(out.core_ids) == [1, 2]
    assert list(out.non_core_ids) == [3, 4]
    assert out.cliqueness == 1.0


def test_multi_graph_and_seeds(spark):
    rows = [
        (0, 1, 3, "author", "published_at", "conference"),
        (0, 2, 3, "author", "published_at", "conference"),
        (7, 1, 4, "author", "published_at", "journal"),
        (7, 2, 4, "author", "published_at", "journal"),
    ]
    seeds = spark.createDataFrame(
        [(0, 1, True)], "graph_id long, node_id long, is_core boolean"
    )
    out = {r.graph_id: r for r in mine_cliques(typed_df(spark, rows), TS2, "author", seeds=seeds).collect()}
    assert list(out[0].core_ids) == [1, 2] and list(out[0].non_core_ids) == [3]
    assert list(out[7].core_ids) == [1, 2] and list(out[7].non_core_ids) == [4]
