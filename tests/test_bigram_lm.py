"""Bigram LM scoring: hand-computed probabilities, smoothing, ranking."""

import math

from pyspark.sql import functions as F

from dachshund_spark.pipeline.lm import bigram_counts, bigram_lm_scores


def _e8(x):
    return int(round(x * 1e8))


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_self_scored(spark):
    docs = _docs(spark, ["a b a", "b a"])
    # bigrams: d0 = (a,b),(b,a); d1 = (b,a); c(a,b)=1, c(b,a)=2,
    # h(a)=1, h(b)=2, V=2
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lp_e8"], r["avg_logprob"])
        for r in bigram_lm_scores(docs).collect()
    }
    t_ab = _e8(math.log(2.0 / 3.0))
    t_ba = _e8(math.log(3.0 / 4.0))
    assert got[0] == (2, t_ab + t_ba, (t_ab + t_ba) / 1e8 / 2)
    assert got[1] == (1, t_ba, t_ba / 1e8 / 1)


def test_bigram_counts(spark):
    docs = _docs(spark, ["x y x y", "y x"])
    got = {(r["w1"], r["w2"]): r["c"] for r in bigram_counts(docs).collect()}
    assert got == {("x", "y"): 2, ("y", "x"): 2}


def test_unseen_history_hits_uniform_floor(spark):
    train = _docs(spark, ["a b a b"])
    test = _docs(spark, ["z q"], start=10)
    got = bigram_lm_scores(test, train=train).collect()[0]
    # V = 2 (a, b); unseen history z: P = (0+1)/(0+2)
    assert got["lp_e8"] == _e8(math.log(1.0 / 2.0))
    assert got["n_bigrams"] == 1


def test_short_docs_omitted(spark):
    docs = _docs(spark, ["only", "two tokens"])
    got = {r["doc_id"] for r in bigram_lm_scores(docs).collect()}
    assert got == {1}


def test_fluent_beats_shuffled(spark):
    train = _docs(spark, ["the cat sat on the mat"] * 5)
    test = _docs(spark, ["the cat sat on the mat", "mat the on sat cat the"], start=100)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_lm_scores(test, train=train).collect()
    }
    assert got[100] > got[101]


def test_unigram_kl_hand_computed(spark):
    import math
    from dachshund_spark.pipeline.lm import unigram_kl_scores

    docs = _docs(spark, ["a a b", "b b b"])
    # corpus: a=2, b=4, N=6, V=2; q_a=3/8, q_b=5/8
    got = {
        r["doc_id"]: (r["n_tokens"], r["kl_e8"], r["kl"])
        for r in unigram_kl_scores(docs).collect()
    }
    t = lambda c, n, cc: _e8((c / n) * math.log((c / n) / ((cc + 1) / 8)))
    exp0 = t(2, 3, 2) + t(1, 3, 4)
    exp1 = t(3, 3, 4)
    assert got[0] == (3, exp0, exp0 / 1e8)
    assert got[1] == (3, exp1, exp1 / 1e8)


def test_unigram_kl_outlier_ranks_higher(spark):
    from dachshund_spark.pipeline.lm import unigram_kl_scores

    train = _docs(spark, ["the cat sat on the mat"] * 10)
    test = _docs(spark, ["the cat sat", "zx qy wv"], start=100)
    got = {
        r["doc_id"]: r["kl"]
        for r in unigram_kl_scores(test, train=train).collect()
    }
    assert got[101] > got[100]


def test_zipf_alpha_hand_computed(spark):
    import math
    from dachshund_spark.pipeline.lm import zipf_alpha

    # frequencies: a=6, b=3, c=2 -> tail (fmin=2) = {6, 3, 2}
    docs = _docs(spark, ["a a a b c", "a a a b b c"])
    row = zipf_alpha(docs, fmin=2).collect()[0]
    terms = sum(_e8(math.log(f / 1.5)) for f in (6, 3, 2))
    assert (row["fmin"], row["n_tail"]) == (2, 3)
    assert row["alpha"] == round(1.0 + 3 / (terms / 1e8), 8)


def test_kneser_ney_hand_corpus(spark):
    from dachshund_spark.pipeline.lm import kneser_ney_bigrams

    # corpus bigrams: (a b) x3, (b a) x1, (c b) x1
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "c b")], "doc_id long, text string"
    )
    out = {(r["w1"], r["w2"]): r for r in kneser_ney_bigrams(docs, topk=10).collect()}
    r = out[("a", "b")]
    # c12=3, c1(a)=3, N1+(a.)=1, N1+(.b)=2, types=3
    assert (r["c12"], r["c1"], r["n1f"], r["n1b"], r["n_types"]) == (3, 3, 1, 2, 3)
    assert r["p_kn"] == (3 - 0.75) / 3 + (0.75 * 1 / 3) * (2 / 3)
    # probabilities over continuations of 'a' stay <= 1
    assert 0.0 < out[("b", "a")]["p_kn"] <= 1.0


def test_ccnet_buckets_fixed_cutoffs(spark):
    from dachshund_spark.pipeline.lm import ccnet_buckets

    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "a b"), (2, "x y z w q r")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ccnet_buckets(docs).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        # bucket is a pure function of (lp_e8, n_bigrams) vs the cutoffs
        avg = r["lp_e8"] / r["n_bigrams"]
        expect = (
            "head" if avg > -339_000_000
            else "middle" if avg > -342_000_000
            else "tail"
        )
        assert r["bucket"] == expect, r
