"""Sequence-packing manifest: tiling invariants, doc-spanning splits,
two-phase cumsum correctness vs a driver-side replay, and plan guard
(no single-partition Exchange)."""

from pyspark.sql import functions as F

from dachshund_spark.pipeline.packing import pack_documents


def _docs(spark, texts, ids=None):
    ids = ids if ids is not None else range(len(texts))
    return spark.createDataFrame(
        list(zip(ids, texts)), "doc_id long, text string"
    )


def test_exact_fit_single_sequence(spark):
    docs = _docs(spark, ["a b c d", "e f g h"])  # 4 + 4 = capacity 8
    rows = pack_documents(docs, 8).collect()
    assert {(r.seq_id, r.doc_id, r.seq_offset, r.doc_offset, r.n_tok) for r in rows} == {
        (0, 0, 0, 0, 4),
        (0, 1, 4, 0, 4),
    }


def test_doc_spans_sequences(spark):
    # doc 0: 3 tok, doc 1: 7 tok, capacity 4 -> doc 1 splits 1/4/2
    docs = _docs(spark, ["a b c", "d e f g h i j"])
    rows = sorted(
        pack_documents(docs, 4).collect(),
        key=lambda r: (r.seq_id, r.seq_offset),
    )
    assert [(r.seq_id, r.doc_id, r.seq_offset, r.doc_offset, r.n_tok) for r in rows] == [
        (0, 0, 0, 0, 3),
        (0, 1, 3, 0, 1),
        (1, 1, 0, 1, 4),
        (2, 1, 0, 5, 2),
    ]


def test_tiling_invariants_replay(spark):
    # 40 docs with varying sizes; verify against a python replay
    texts = [" ".join(["t"] * (1 + (i * 7) % 13)) for i in range(40)]
    ids = [i * 3 + 1 for i in range(40)]  # non-contiguous ids
    docs = _docs(spark, texts, ids).repartition(8)
    cap = 16
    rows = pack_documents(docs, cap).collect()
    # python replay
    order = sorted(zip(ids, texts))
    expect, g = [], 0
    for did, t in order:
        n = len(t.split(" "))
        s = g
        while s < g + n:
            seq = s // cap
            e = min(g + n, (seq + 1) * cap)
            expect.append((seq, did, s - seq * cap, s - g, e - s))
            s = e
        g += n
    got = sorted(
        (r.seq_id, r.doc_id, r.seq_offset, r.doc_offset, r.n_tok) for r in rows
    )
    assert got == sorted(expect)
    # per-sequence tiling: offsets+lengths tile [0, cap)
    by_seq = {}
    for seq, _, so, _, n in got:
        by_seq.setdefault(seq, []).append((so, n))
    last = max(by_seq)
    for seq, sp in by_seq.items():
        sp.sort()
        pos = 0
        for so, n in sp:
            assert so == pos
            pos += n
        assert pos == cap or seq == last


def test_no_single_partition_exchange(spark):
    docs = _docs(spark, ["x y z"] * 50).repartition(8)
    plan = pack_documents(docs, 8)._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in final


def test_capacity_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        pack_documents(_docs(spark, ["a"]), 0)
