"""Property-based checks (hypothesis): the distributed operators must
agree with direct Python set/dict models on arbitrary small inputs.

Each example runs Spark jobs, so example counts are deliberately small
(the value here is adversarial input shapes — empty sides, self-pairs,
duplicate rows — not volume).
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from dachshund_spark.algorithms.delta import snapshot_delta
from dachshund_spark.pipeline.dedup import drop_common_segments
from dachshund_spark.pipeline.text import vocabulary

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge = st.tuples(st.integers(0, 6), st.integers(0, 6))
edge_sets = st.lists(edge, max_size=25)


@settings(**_SETTINGS)
@given(old=edge_sets, new=edge_sets)
def test_snapshot_delta_matches_set_model(spark, old, new):
    o_set, n_set = set(old), set(new)
    o_df = spark.createDataFrame(old or [(0, 0)], "src long, dst long")
    n_df = spark.createDataFrame(new or [(0, 0)], "src long, dst long")
    if not old:
        o_df = o_df.where("src < 0")
    if not new:
        n_df = n_df.where("src < 0")
    rows = {r.src: r for r in snapshot_delta(o_df, n_df).collect()}
    srcs = {s for s, _ in o_set | n_set}
    assert set(rows) == srcs
    for s in srcs:
        o_out = {d for (x, d) in o_set if x == s}
        n_out = {d for (x, d) in n_set if x == s}
        r = rows[s]
        assert r.n_added == len(n_out - o_out)
        assert r.n_removed == len(o_out - n_out)
        assert r.n_stable == len(o_out & n_out)
        assert abs(r.jaccard - len(o_out & n_out) / len(o_out | n_out)) < 1e-12


words = st.text(alphabet="abcd", min_size=1, max_size=3)
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=6), min_size=1, max_size=6
)


@settings(**_SETTINGS)
@given(docs=docs_strategy)
def test_vocabulary_matches_dict_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: (r.tf, r.df) for r in vocabulary(df).collect()}
    tf: dict[str, int] = {}
    dfc: dict[str, set] = {}
    for i, toks in enumerate(docs):
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
            dfc.setdefault(t, set()).add(i)
    assert got == {t: (tf[t], len(dfc[t])) for t in tf}


@settings(**_SETTINGS)
@given(docs=docs_strategy, frac=st.sampled_from([0.25, 0.5, 0.75]))
def test_drop_common_segments_matches_model(spark, docs, frac):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in drop_common_segments(df, sep=" ", max_doc_frac=frac).collect()
    }
    n_docs = len(docs)
    dfc: dict[str, set] = {}
    for i, toks in enumerate(docs):
        for t in toks:
            dfc.setdefault(t, set()).add(i)
    thr = max(2, frac * n_docs)
    dropped = {t for t, s in dfc.items() if len(s) >= thr}
    for i, toks in enumerate(docs):
        keep = [t for t in toks if t not in dropped]
        assert out[i].text == " ".join(keep)
        assert out[i].n_dropped == sum(1 for t in toks if t in dropped)
