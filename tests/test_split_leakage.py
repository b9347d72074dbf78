"""Host-split leakage census: crafted corpus with known leakage."""

import hashlib

from dachshund_spark.pipeline.decontam import split_leakage_census


def _bucket(host, seed=0):
    return int(hashlib.md5(f"spl{seed}#{host}".encode()).hexdigest()[:15], 16) % 10


def test_known_leakage(spark):
    # pick one test host and one train host deterministically
    test_host = next(f"h{i}" for i in range(100) if _bucket(f"h{i}") == 9)
    train_host = next(f"h{i}" for i in range(100) if _bucket(f"h{i}") != 9)
    rows = [
        # doc 1 (test) shares gram "x y z" with doc 10 (train) → leaked
        (1, test_host, "x y z"),
        (1, test_host, "only in test"),
        (2, test_host, "clean gram"),
        (10, train_host, "x y z"),
        (10, train_host, "train only"),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, host string, gram string")
    r = split_leakage_census(sh).collect()[0]
    assert (r.n_test_docs, r.n_contaminated, r.n_shared_grams) == (2, 1, 1)


def test_no_test_docs(spark):
    train_host = next(f"h{i}" for i in range(100) if _bucket(f"h{i}") != 9)
    sh = spark.createDataFrame(
        [(1, train_host, "a b c")], "doc_id long, host string, gram string"
    )
    r = split_leakage_census(sh).collect()[0]
    assert (r.n_test_docs, r.n_contaminated, r.n_shared_grams) == (0, 0, 0)
