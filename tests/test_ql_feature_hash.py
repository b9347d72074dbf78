"""Dirichlet query-likelihood + hashing-trick feature goldens."""

import hashlib
import math

import pytest

from dachshund_spark.pipeline.retrieval import query_likelihood_topk
from dachshund_spark.pipeline.text import feature_hash


pytestmark = pytest.mark.quick


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ql_matches_hand_computation(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "a")])
    got = {
        r.doc_id: (r.n_matched_terms, r.score_e8)
        for r in query_likelihood_topk(docs, ["a", "c"], k=10, mu=2.0).collect()
    }
    # corpus: C=6 tokens, cf(a)=3, cf(c)=1
    def term(tf, cf, dl, mu=2.0, c=6):
        return round(math.log((tf + mu * (cf / c)) / (dl + mu)) * 1e8)

    exp = {
        1: (1, term(2, 3, 3) + term(0, 1, 3)),
        2: (1, term(0, 3, 2) + term(1, 1, 2)),
        3: (1, term(1, 3, 1) + term(0, 1, 1)),
    }
    assert got == exp


def test_ql_oov_term_dropped(spark):
    docs = _docs(spark, [(1, "a b"), (2, "b b")])
    with_oov = query_likelihood_topk(docs, ["a", "zzz"], k=10, mu=2.0)
    without = query_likelihood_topk(docs, ["a"], k=10, mu=2.0)
    assert sorted(map(tuple, with_oov.collect())) == sorted(
        map(tuple, without.collect())
    )


def test_ql_ranking_prefers_matching_doc(spark):
    docs = _docs(spark, [(1, "x x x x"), (2, "y y y y")])
    top = query_likelihood_topk(docs, ["x"], k=1, mu=100.0).collect()
    assert top[0].doc_id == 1


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_feature_hash_exact(spark):
    docs = _docs(spark, [(1, "x x y"), (2, "y")])
    got = {
        (r.doc_id, r.bucket): r.value
        for r in feature_hash(docs, n_buckets=8).collect()
    }
    exp: dict[tuple[int, int], int] = {}
    for doc_id, text in [(1, "x x y"), (2, "y")]:
        for tok in text.split(" "):
            b = _md5_long("fh#" + tok) % 8
            s = 1 if _md5_long("fs#" + tok) % 2 == 0 else -1
            exp[(doc_id, b)] = exp.get((doc_id, b), 0) + s
    assert got == exp


def test_feature_hash_mass_conserved(spark):
    docs = _docs(spark, [(i, f"t{i} t{i % 3} common") for i in range(20)])
    rows = feature_hash(docs, n_buckets=4).collect()
    # every token contributes exactly ±1: per-doc |Σ value| ≤ 3 tokens
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + abs(r.value)
    assert all(v <= 3 for v in per_doc.values())
    assert len(per_doc) == 20
