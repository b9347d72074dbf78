"""RAKE keyword phrases: stopword-delimited runs, deg/freq scores."""

from dachshund_spark.pipeline.text import rake_keywords


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_rake_phrases_and_scores(spark):
    docs = _docs(spark, ["deep learning of deep graphs"])
    out = rake_keywords(docs, stopwords=["of"], topk=10).collect()
    rows = {r.phrase: r for r in out}
    # deep: deg 4 (two len-2 phrases), freq 2 -> 2.0; learning/graphs: 2.0
    assert rows["deep learning"].score_e8 == 400_000_000
    assert rows["deep graphs"].score_e8 == 400_000_000
    # equal scores tie-break by phrase text
    assert [r.phrase for r in out] == ["deep graphs", "deep learning"]


def test_rake_counts_repeated_phrases(spark):
    docs = _docs(spark, ["big data is big data", "big data"])
    out = rake_keywords(docs, stopwords=["is"], topk=10).collect()
    (r,) = out
    assert r.phrase == "big data" and r.n_occurrences == 3
    # big: deg 6, freq 3 -> 2.0; data same -> phrase score 4.0
    assert r.score_e8 == 400_000_000


def test_rake_stopword_only_doc_yields_nothing(spark):
    docs = _docs(spark, ["the of and", "alpha beta"])
    out = rake_keywords(docs, topk=10).collect()
    assert [r.phrase for r in out] == ["alpha beta"]
