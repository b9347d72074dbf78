"""Content-defined chunking: replay, shift invariance, coverage."""

import hashlib

from dachshund_spark.pipeline.dedup import cdc_chunks


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(text, w, d):
    toks = text.split(" ")
    n = len(toks)
    pos = [
        i
        for i in range(w, n + 1)
        if _h(" ".join(toks[i - w : i])) % d == 0
    ]
    b = [0] + pos + ([] if pos and pos[-1] == n else [n])
    out = []
    for j in range(len(b) - 1):
        s, e = b[j], b[j + 1]
        out.append((j, s, e - s, _h(" ".join(toks[s:e]))))
    return out


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_python_replay_and_covers_doc(spark):
    texts = [
        "a b c d e f g h i j k l m n o p q r s t",
        "z y x w v u t s r q p o n m",
        "hi",
    ]
    rows = cdc_chunks(_docs(spark, texts), window=3, divisor=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_hash"])
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _replay(t, 3, 4), t
        # chunks tile the document exactly
        assert sum(c[2] for c in got[i]) == len(t.split(" "))


def test_shift_invariance_downstream_chunks_shared(spark):
    base = "a b c d e f g h i j k l m n o p q r s t u v w x y z"
    shifted = "QQ " + base
    rows = cdc_chunks(_docs(spark, [base, shifted]), window=3, divisor=4).collect()
    hashes = {0: set(), 1: set()}
    for r in rows:
        hashes[r["doc_id"]].add(r["chunk_hash"])
    shared = hashes[0] & hashes[1]
    # content-defined boundaries resynchronize after the insertion:
    # the tail chunks are identical even though every token moved
    assert shared, "no resynchronized chunks — CDC property broken"
    for r in rows:
        if r["chunk_hash"] in shared:
            assert r["n_dup_docs"] == 2
