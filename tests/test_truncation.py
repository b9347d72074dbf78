"""Matryoshka truncation eval: crafted vectors where the half-dim
neighbor disagrees with the full-dim one."""

from dachshund_spark.pipeline.similarity import truncation_agreement


def test_crafted_disagreement(spark):
    # 4-dim vectors, half = first 2 dims.
    # query 0: half-space favors vec 1, but dims 3-4 flip it to vec 2.
    vecs = [
        (0, [1.0, 0.0, 1.0, 0.0]),
        (1, [1.0, 0.0, -1.0, 0.0]),   # half dot with 0: 1e12; full: 0
        (2, [0.5, 0.0, 1.0, 0.0]),    # half dot with 0: 5e11; full: 1.5e12
        (3, [-1.0, -1.0, -1.0, -1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           truncation_agreement(emb, half_dims=2).collect()}
    assert (out[0].nn_full, out[0].nn_half, out[0].agree) == (2, 1, 0)
    # vec 3 is anti-correlated with everything; its nearest under both
    # metrics is the least-negative dot — exact and deterministic
    assert out[3].agree in (0, 1)
    assert set(out) == {0, 1, 2, 3}


def test_tie_breaks_to_smaller_id(spark):
    # vecs 1 and 2 are identical: query 0's top-1 ties → smaller id
    vecs = [
        (0, [1.0, 1.0]),
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           truncation_agreement(emb, half_dims=1).collect()}
    assert out[0].nn_full == 1 and out[0].nn_half == 1 and out[0].agree == 1
