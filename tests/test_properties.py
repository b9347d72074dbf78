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


@settings(**_SETTINGS)
@given(edges=edge_sets)
def test_matching_properties_on_arbitrary_graphs(spark, edges):
    from dachshund_spark.algorithms.matching import maximal_matching
    from dachshund_spark.graph import LinkGraph

    simple = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    g = LinkGraph(
        spark.createDataFrame(
            [(u, v) for u, v in edges] or [(0, 0)], "src long, dst long"
        )
    )
    got = {(r["u"], r["v"]) for r in maximal_matching(g).collect()}
    assert got <= simple
    nodes = [x for e in got for x in e]
    assert len(nodes) == len(set(nodes))  # a matching
    matched = set(nodes)
    for u, v in simple:  # maximal
        assert u in matched or v in matched


@settings(**_SETTINGS)
@given(edges=st.lists(edge, min_size=1, max_size=15))
def test_redirect_resolution_matches_walk_model(spark, edges):
    from dachshund_spark.algorithms.redirects import resolve_redirects

    # functional graph: last write wins per src (dict semantics)
    ptr = {u: v for u, v in edges}
    df = spark.createDataFrame(list(ptr.items()), "src long, dst long")
    got = {
        r["src"]: (r["final"], r["hops"], r["is_loop"])
        for r in resolve_redirects(df, max_rounds=8).collect()
    }
    for s in ptr:
        cur, hops, seen = s, 0, set()
        while cur in ptr and cur not in seen and hops <= 256:
            seen.add(cur)
            cur = ptr[cur]
            hops += 1
        if cur in ptr:  # walked into a loop
            assert got[s][2] is True
        else:
            assert got[s] == (cur, hops, False)
