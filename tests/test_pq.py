"""Product quantization: codebook/code shapes, ADC semantics, recall."""

import random

import pytest
from pyspark.sql import functions as F

from dachshund_spark.pipeline.clustering import pq_adc_topk, pq_codebook_and_codes

pytestmark = pytest.mark.quick


def _blobs(n=48, dim=8, spread=0.3, seed=3):
    # 4 well-separated blobs in 8-d; blob b centers at 10*e_{2b}
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        b = i % 4
        v = [rng.uniform(-spread, spread) for _ in range(dim)]
        v[2 * b] += 10.0
        rows.append((i, v))
    return rows


def test_pq_code_shape_and_determinism(spark):
    df = spark.createDataFrame(_blobs(), ["vec_id", "embedding"])
    book, codes = pq_codebook_and_codes(df, m=2, k=4, iterations=2)
    assert book.count() == 2 * 4 * 4  # m subspaces x k codes x sub dims
    got = codes.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 2 for r in got) and len(got) == 48
    # deterministic across recomputation
    _, codes2 = pq_codebook_and_codes(df, m=2, k=4, iterations=2)
    assert sorted(map(tuple, codes.collect())) == sorted(map(tuple, codes2.collect()))


def test_pq_adc_recall_on_blobs(spark):
    df = spark.createDataFrame(_blobs(), ["vec_id", "embedding"])
    out = pq_adc_topk(
        df, m=2, k=4, iterations=3, n_queries=4, topk=5
    ).collect()
    assert len(out) == 4 * 5
    for r in out:
        # blobs are 10 units apart with 0.3 spread: every ADC neighbor
        # of query b must come from blob b, and never the query itself
        assert r["vec_id"] % 4 == r["query_id"] % 4
        assert r["vec_id"] != r["query_id"]
    ranks = sorted(
        (r["query_id"], r["rank"]) for r in out
    )
    assert ranks == [(q, k) for q in range(4) for k in range(1, 6)]


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="divisible"):
        pq_codebook_and_codes(df, m=2, k=1, iterations=1)
