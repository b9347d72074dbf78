import pytest
from pyspark.sql import functions as F

from dachshund_spark import LinkGraph
from dachshund_spark.clique import SearchProblem
from dachshund_spark.clique.miner import mine_cliques_detailed
from dachshund_spark.io_tsv import (
    graph_to_tsv_rows,
    miner_result_long_rows,
    miner_result_wide_rows,
    read_simple_tsv,
    read_typed_tsv,
)


def test_simple_tsv_roundtrip(spark, tmp_path):
    path = tmp_path / "edges.tsv"
    path.write_text("gA\t1\t2\ngA\t2\t3\ngB\t1\t2\ngA\t3\t1\n")
    df = read_simple_tsv(spark, str(path))
    rows = {(r.graph_id, r.src, r.dst) for r in df.collect()}
    # graph keys remapped densely in first-seen order: gA=0, gB=1
    assert rows == {(0, 1, 2), (0, 2, 3), (1, 1, 2), (0, 3, 1)}


def test_graph_to_tsv(spark):
    g = LinkGraph.from_edgelist(spark, [(2, 1), (1, 2), (3, 1)])
    lines = sorted(r.value for r in graph_to_tsv_rows(g, "k").collect())
    assert lines == ["k\t1\t2", "k\t1\t3"]


def test_typed_tsv(spark, tmp_path):
    path = tmp_path / "typed.tsv"
    path.write_text(
        "0\t1\t2\tauthor\tpublished_at\tjournal\n"
        "0\t2\tjournal\t\t\t\n"
        "0\t1\tauthor\t\t\t\n"
    )
    edges, seeds = read_typed_tsv(spark, str(path))
    e = edges.collect()
    assert len(e) == 1 and e[0].core_id == 1 and e[0].non_core_id == 2
    s = {(r.node_id, r.node_type) for r in seeds.collect()}
    assert ("2", "journal") in {(r.node_id, r.node_type) for r in seeds.collect()} or (
        2,
        "journal",
    ) in {(int(r.node_id), r.node_type) for r in seeds.collect()}


def test_wide_row_matches_readme(spark):
    # README.md:40-50: expected wide row for example.txt
    rows = [
        (0, 1, 3, "author", "published", "article"),
        (0, 2, 3, "author", "published", "article"),
        (0, 1, 4, "author", "published", "article"),
        (0, 2, 4, "author", "published", "article"),
        (0, 2, 5, "author", "published", "article"),
    ]
    df = spark.createDataFrame(
        rows,
        "graph_id long, core_id long, non_core_id long, core_type string, "
        "edge_type string, non_core_type string",
    )
    p = SearchProblem(alpha=0.1, num_to_search=10, num_epochs=200, min_degree=1)
    res = mine_cliques_detailed(df, [["author", "published", "article"]], "author", problem=p)
    wide = miner_result_wide_rows(res).first().value
    parts = wide.split("\t")
    assert parts[0] == "0"
    assert parts[1] == "2" and parts[2] == "2"
    assert parts[3] == "[1,2]" and parts[4] == "[3,4]"
    assert parts[5] == '["article","article"]'
    assert float(parts[6]) == 1.0
    assert parts[7] == "[1.0,1.0]" and parts[8] == "[1.0]"

    long_lines = sorted(r.value for r in miner_result_long_rows(res, "author").collect())
    assert long_lines == [
        "0\t1\tauthor",
        "0\t2\tauthor",
        "0\t3\tarticle",
        "0\t4\tarticle",
    ]
