"""BPE merge learning vs an in-test reference implementation
(Sennrich-style greedy left-to-right merging, overlaps counted)."""

from dachshund_spark.pipeline.lm import bpe_merges


def _py_bpe(freqs, n):
    vocab = {w: list(w) for w in freqs}
    merges = []
    for r in range(n):
        cnt = {}
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, a, b, c))
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges


def _docs_from_freqs(spark, freqs):
    texts = []
    for w, f in freqs.items():
        texts.extend([w] * f)
    # pack several words per doc to exercise tokenization
    rows = [(i, " ".join(texts[i::7])) for i in range(7)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_matches_reference_impl(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = _docs_from_freqs(spark, freqs)
    got = [
        (r.rank, r.a, r.b, r.pair_count)
        for r in bpe_merges(docs, 6).orderBy("rank").collect()
    ]
    assert got == _py_bpe(freqs, 6)


def test_bpe_overlap_greedy(spark):
    docs = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    got = [
        (r.rank, r.a, r.b, r.pair_count)
        for r in bpe_merges(docs, 2).orderBy("rank").collect()
    ]
    # round 1: (a,a) count 3 (overlaps), merge greedily -> [aa, aa]
    # round 2: (aa,aa) count 1
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_exhausts_gracefully(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    got = bpe_merges(docs, 5).collect()
    # after (a,b) -> ab the word is a single symbol: only 1 merge exists
    assert len(got) == 1 and (got[0].a, got[0].b) == ("a", "b")


def test_bpe_encode_counts_shrink_with_merges(spark):
    docs = spark.createDataFrame(
        [(0, "aaab aaab abab"), (1, "xy")],
        "doc_id long, text string",
    )
    from dachshund_spark.pipeline.lm import bpe_encode_counts

    zero = {r.doc_id: r for r in bpe_encode_counts(docs, n_merges=0).collect()}
    # 0 merges: every char is a token
    assert zero[0].n_words == 3 and zero[0].n_bpe_tokens == 12
    assert zero[1].n_words == 1 and zero[1].n_bpe_tokens == 2
    some = {r.doc_id: r for r in bpe_encode_counts(docs, n_merges=2).collect()}
    assert some[0].n_bpe_tokens < zero[0].n_bpe_tokens
    assert some[0].n_bpe_tokens >= some[0].n_words
