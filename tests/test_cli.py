"""End-to-end CLI tests: TSV in → TSV out, the reference binaries'
shell contract (simple_graph_featurizer.rs:38-48, clique_miner.rs) run
in-process against the live test session."""

import json

from tests.fixtures import KARATE_EDGES


def test_featurizer_cli_karate(spark, tmp_path):
    # /root/reference/tests/simple_graph.rs:257-282: graph_key\t{stats}
    from dachshund_spark.featurizer import main

    in_tsv = tmp_path / "in.tsv"
    in_tsv.write_text(
        "".join(f"zuck\t{u}\t{v}\n" for u, v in KARATE_EDGES)
    )
    out_tsv = tmp_path / "out.tsv"
    assert main([str(in_tsv), str(out_tsv)]) == 0

    lines = out_tsv.read_text().splitlines()
    assert len(lines) == 1
    key, stats_json = lines[0].split("\t", 1)
    assert key == "zuck"
    stats = json.loads(stats_json)
    # reference golden facts (tests/karate_club.rs)
    assert stats["num_edges"] == 78
    assert stats["num_connected_components"] == 1
    assert stats["size_of_largest_cc"] == 34
    assert stats["clust_coef"] == 0.587
    # compact serde-style rendering and reference key order
    assert stats_json.startswith('{"num_edges":78,')
    assert list(stats) == [
        "num_edges", "num_2_cores", "num_4_cores", "num_8_cores",
        "num_16_cores", "num_3_trusses", "num_5_trusses", "num_9_trusses",
        "num_17_trusses", "num_connected_components", "size_of_largest_cc",
        "bet_cent", "evcent", "clust_coef",
    ]


def test_featurizer_cli_multi_graph_sorted(spark, tmp_path):
    from dachshund_spark.featurizer import main

    in_tsv = tmp_path / "in.tsv"
    in_tsv.write_text(
        "b\t1\t2\nb\t2\t3\na\t1\t2\n"
    )
    out_tsv = tmp_path / "out.tsv"
    main([str(in_tsv), str(out_tsv)])
    lines = out_tsv.read_text().splitlines()
    keys = [l.split("\t")[0] for l in lines]
    assert keys == ["a", "b"]
    assert json.loads(lines[0].split("\t", 1)[1])["num_edges"] == 1
    assert json.loads(lines[1].split("\t", 1)[1])["num_edges"] == 2


def test_miner_cli_wide_and_long(spark, tmp_path):
    # 2-core × 1-non-core biclique per graph (test_utils.rs shapes)
    from dachshund_spark.miner import main

    rows = [
        (0, 1, 3, "author", "published_at", "conference"),
        (0, 2, 3, "author", "published_at", "conference"),
        (7, 1, 4, "author", "published_at", "journal"),
        (7, 2, 4, "author", "published_at", "journal"),
    ]
    in_tsv = tmp_path / "in.tsv"
    in_tsv.write_text(
        "".join("\t".join(str(c) for c in r) + "\n" for r in rows)
    )
    ts = json.dumps(
        [["author", "published_at", "conference"],
         ["author", "published_at", "journal"]]
    )
    wide = tmp_path / "wide.tsv"
    assert main([str(in_tsv), str(wide), "--typespec", ts]) == 0
    lines = sorted(wide.read_text().splitlines())
    assert len(lines) == 2
    g0 = lines[0].split("\t")
    # graph_id, |core|, |non_core|, [cores], [non_cores], [types], ...
    assert g0[0] == "0" and g0[1] == "2" and g0[2] == "1"
    assert json.loads(g0[3]) == [1, 2] and json.loads(g0[4]) == [3]

    long = tmp_path / "long.tsv"
    assert main([str(in_tsv), str(long), "--typespec", ts, "--long-format"]) == 0
    members = {tuple(l.split("\t")) for l in long.read_text().splitlines()}
    assert ("0", "1", "author") in members
    assert ("0", "3", "conference") in members
    assert ("7", "4", "journal") in members
