"""Lexical retrieval over a document corpus: inverted postings,
tf-idf term ranking, BM25 top-k, and sliding-window token chunking.

This is the indexing/ranking layer a webtext training pipeline needs
around the corpus: decontamination lookups, eval-set retrieval, quality
probes ("which documents best match this query"), and fixed-window
chunking for sequence packing.  The reference engine has no retrieval
layer; these are engine additions in the spirit of SURVEY.md §2.12.

Scale shape: everything is explode → groupBy (map-side combinable) or
a broadcast of per-term statistics (the query vocabulary is tiny by
construction).  No per-row Python anywhere.

Oracle parity: every libm term (ln-based idf) is rounded to a
1e-8-scaled BIGINT *before* any aggregation or cross-term arithmetic,
so document scores are exact integer sums and the DuckDB oracle matches
bit-for-bit (see CLAUDE.md float-parity notes).  BM25's k1/b default to
exactly-representable doubles (1.5, 0.75) for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.pipeline.text import md5_long, tokens

E8 = 100_000_000


def postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Inverted index postings ``[token, doc_id, tf]``.

    One explode + one groupBy(token, doc_id) — partial aggregation
    combines map-side, so the shuffle carries distinct (token, doc)
    pairs, not raw token occurrences.
    """
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    return toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def _n_docs(docs: DataFrame) -> DataFrame:
    return docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """Per-document top-``k`` terms by tf-idf:
    ``[doc_id, token, tf, score_e8, rank]``.

    idf = ln(N / df) is rounded to a 1e-8-scaled BIGINT per *token*
    (one libm call per vocabulary entry, never summed as a float), and
    the document-level score is the exact integer ``tf * idf_e8`` —
    ranking is therefore engine-independent.  Ties break on token text.

    Plan: postings → token-level df (second agg reuses the same
    shuffle key prefix) → broadcast-joined back (vocabulary ≪ corpus)
    → per-doc window top-k.  The window partitions by doc_id, so no
    global sort.
    """
    post = postings(docs, text_col)
    df_tbl = post.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    df_tbl = df_tbl.crossJoin(F.broadcast(_n_docs(docs)))
    df_tbl = df_tbl.select(
        "token",
        "df",
        F.round(F.log(F.col("_n") / F.col("df")) * E8, 0)
        .cast("long")
        .alias("idf_e8"),
    )
    scored = post.join(df_tbl.hint("broadcast"), on="token").select(
        "doc_id",
        "token",
        "tf",
        (F.col("tf") * F.col("idf_e8")).alias("score_e8"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_e8"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(int(k)))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-``k`` documents for a bag-of-words query:
    ``[doc_id, n_matched_terms, score_e8]``.

    Robertson/Sparck-Jones idf with the +1 floor:
    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)``, rounded to a
    1e-8-scaled BIGINT per term; the per-(doc, term) weight
    ``w = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`` is pure double
    arithmetic (no libm), so ``round(idf_e8 · w)`` is bit-stable and
    per-doc scores are exact integer sums.

    Plan: the token explode is filtered to the query vocabulary before
    the (token, doc) aggregation — Catalyst pushes the IN filter below
    the shuffle, so the index side only materializes matching postings.
    Term stats (df, idf) and the avgdl scalar are broadcast.  Final
    top-k is orderBy+limit (TakeOrdered — no global sort shuffle).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    post = (
        toks.where(F.col("token").isin(*terms))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = docs.select(
        "doc_id", F.size(tokens(text_col)).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("_avgdl"),
    )
    df_tbl = (
        post.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.round(
                F.log(
                    (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * E8,
                0,
            )
            .cast("long")
            .alias("idf_e8"),
            "_avgdl",
        )
    )
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    w = (F.col("tf") * (k1l + 1.0)) / (
        F.col("tf")
        + k1l * (1.0 - bl + bl * (F.col("dl") / F.col("_avgdl")))
    )
    scored = (
        post.join(df_tbl.hint("broadcast"), on="token")
        .join(dl, on="doc_id")
        .select(
            "doc_id",
            F.round(F.col("idf_e8") * w, 0).cast("long").alias("term_e8"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
            F.sum("term_e8").cast("long").alias("score_e8"),
        )
        .orderBy(F.desc("score_e8"), F.asc("doc_id"))
        .limit(int(k))
    )


def retrieval_eval(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Ranking-quality metrics of the BM25 ranker against term-overlap
    relevance judgments: ``[query_id, dcg_e8, idcg_e8, ndcg,
    first_rel_rank, rr]`` — nDCG@k and reciprocal rank per query.

    Relevance is derived, not annotated (the pipeline's proxy-judgment
    eval): ``rel(q, d) = max(0, |terms(q) ∩ d| - 1)`` — a doc matching
    a single query term is noise (rel 0), two terms rel 1, all terms
    rel 2; ``gain = 2^rel - 1 ∈ {0, 1, 3}``.  The ranking under eval
    is the exact ``bm25_topk`` scorer (same e8-integer expression
    tree), ranked ``score_e8 DESC, doc_id ASC``.

    Oracle parity: the only irrational in nDCG is the 1/log2(rank+1)
    discount — it is baked as 1e-8-scaled integer LITERALS (one Python
    ``round`` feeds both engines), so DCG/IDCG are exact BIGINT sums of
    gain·disc products and ``ndcg = dcg_e8 / idcg_e8`` is a single
    engine-stable division.  No runtime libm beyond the idf (which is
    pre-rounded per term, the bm25_topk policy).

    Plan: postings filtered to the union query vocabulary before the
    (token, doc) aggregation; the query table and per-term stats are
    broadcast; per-query ranking windows partition by query_id (never
    a single global partition).
    """
    import math

    if not queries:
        raise ValueError("queries must be non-empty")
    disc = {r: int(round(E8 / math.log2(r + 1))) for r in range(1, k + 1)}
    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [(int(q), t) for q, ts in queries.items() for t in sorted(set(ts))],
        "query_id long, token string",
    )
    all_terms = sorted({t for ts in queries.values() for t in ts})

    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    post = (
        toks.where(F.col("token").isin(*all_terms))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = docs.select(
        "doc_id", F.size(tokens(text_col)).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("_avgdl"),
    )
    df_tbl = (
        post.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.round(
                F.log(
                    (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * E8,
                0,
            )
            .cast("long")
            .alias("idf_e8"),
            "_avgdl",
        )
    )
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    w = (F.col("tf") * (k1l + 1.0)) / (
        F.col("tf")
        + k1l * (1.0 - bl + bl * (F.col("dl") / F.col("_avgdl")))
    )
    term = (
        post.join(df_tbl.hint("broadcast"), on="token")
        .join(dl, on="doc_id")
        .select(
            "token",
            "doc_id",
            F.round(F.col("idf_e8") * w, 0).cast("long").alias("term_e8"),
        )
    )
    qd = (
        F.broadcast(qt)
        .join(term, on="token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("term_e8").cast("long").alias("score_e8"),
        )
        .withColumn(
            # rel = matched terms − 1, gain = 2^rel − 1, for ANY query
            # length (the old mapping hardcoded the 3-term case and
            # capped 4-of-4 matches at gain 3).  m is bounded by the
            # query's term count, so the shift can't overflow.
            "gain",
            (
                F.expr("shiftleft(1L, cast(m - 1 as int))") - F.lit(1)
            ).cast("long"),
        )
    )
    from pyspark.sql import Window

    disc_expr = F.create_map(
        *[F.lit(x) for r, d in disc.items() for x in (r, d)]
    )
    by_score = Window.partitionBy("query_id").orderBy(
        F.desc("score_e8"), F.asc("doc_id")
    )
    by_rel = Window.partitionBy("query_id").orderBy(
        F.desc("gain"), F.asc("doc_id")
    )
    ranked = qd.select(
        "query_id",
        "doc_id",
        "gain",
        F.row_number().over(by_score).alias("rank"),
        F.row_number().over(by_rel).alias("ideal_rank"),
    )
    agg = ranked.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("rank") <= k,
                F.col("gain") * disc_expr[F.col("rank")],
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("dcg_e8"),
        F.sum(
            F.when(
                F.col("ideal_rank") <= k,
                F.col("gain") * disc_expr[F.col("ideal_rank")],
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("idcg_e8"),
        F.min(
            F.when(
                (F.col("rank") <= k) & (F.col("gain") >= 1), F.col("rank")
            )
        )
        .cast("long")
        .alias("_first"),
    )
    return agg.select(
        "query_id",
        "dcg_e8",
        "idcg_e8",
        F.when(
            F.col("idcg_e8") > 0,
            F.col("dcg_e8").cast("double") / F.col("idcg_e8").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        F.coalesce(F.col("_first"), F.lit(0)).cast("long").alias(
            "first_rel_rank"
        ),
        F.when(F.col("_first").isNotNull(), 1.0 / F.col("_first"))
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )


def chunk_windows(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunks for sequence packing:
    ``[doc_id, chunk_idx, start_token, n_tokens, chunk_hash]``.

    Windows of ``window`` tokens every ``stride`` tokens; the final
    window may be shorter (it still covers the tail).  ``chunk_hash``
    is the md5-derived bigint of the space-joined window, so chunks are
    directly joinable against dedup/decontamination tables.

    Pure column algebra: one `sequence` per doc (chunk count is
    O(n_tokens/stride)), `slice` per chunk — no shuffle at all until a
    downstream consumer aggregates.  ANSI-safe: the sequence bound is
    clamped ≥ 0 via greatest().
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(text_col)
    base = docs.select("doc_id", toks.alias("_toks"))
    n = F.size("_toks")
    # number of extra chunks past the first: ceil(max(n - window, 0) / stride)
    extra = F.floor(
        (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    idx = F.sequence(F.lit(0), extra)
    out = base.select(
        "doc_id", "_toks", F.explode(idx).alias("chunk_idx")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("long").alias("start_token"),
        F.slice(
            "_toks", F.col("chunk_idx") * stride + 1, F.lit(window)
        ).alias("_win"),
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        "start_token",
        F.size("_win").cast("long").alias("n_tokens"),
        md5_long(F.concat_ws(" ", "_win")).alias("chunk_hash"),
    )


def positional_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Positional inverted index ``[token, doc_id, pos]`` (0-based
    token offsets) — the structure phrase and proximity queries need;
    one posexplode, no aggregation (positions are already unique)."""
    return docs.select(
        "doc_id", F.posexplode(tokens(text_col)).alias("pos", "token")
    ).select("token", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_matches(
    docs: DataFrame, phrase: list[str], text_col: str = "text"
) -> DataFrame:
    """Exact phrase search: ``[doc_id, n_occurrences]`` for documents
    containing the tokens of ``phrase`` consecutively.

    Each term at offset k contributes candidate start positions
    ``pos − k``; an occurrence is a start position present in every
    term's set, so the plan is k−1 equi-joins on (doc_id, start) —
    no window functions, no per-row Python, and the token filter
    pushes into the scan.  Overlapping occurrences count separately
    (standard positional-index semantics).
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    post = positional_postings(docs, text_col).where(
        F.col("token").isin(*sorted(set(phrase)))
    )
    cur = post.where(F.col("token") == phrase[0]).select(
        "doc_id", F.col("pos").alias("start")
    )
    for k, term in enumerate(phrase[1:], start=1):
        nxt = post.where(F.col("token") == term).select(
            "doc_id", (F.col("pos") - F.lit(k)).alias("start")
        )
        cur = cur.join(nxt, on=["doc_id", "start"])
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack/Clarke/Buettcher 2009):
    ``score(d) = Σ_lists 1/(k + rank_list(d))`` — the standard way to
    combine heterogeneous retrievers (BM25 + dense + ...) without score
    calibration.  Returns ``[<id_col>, n_lists, rrf_e8, rrf]``.

    Each list's contribution ``floor(1e8/(k+rank))`` is an exact
    BIGINT, so the fused score is an exact integer sum (any list count,
    any aggregation order) and ``rrf`` is the single closing division —
    engine-replayable.  Input frames must carry a 1-based ``rank_col``;
    they are top-k lists, so the union is tiny regardless of corpus
    size.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    contribs = [
        r.select(
            id_col,
            F.floor(
                F.lit(100000000.0)
                / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            )
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    out = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("_c").cast("long").alias("rrf_e8"),
    ).select(
        id_col,
        "n_lists",
        "rrf_e8",
        (F.col("rrf_e8").cast("double") / F.lit(1e8)).alias("rrf"),
    )
    if topk is not None:
        out = out.orderBy(F.desc("rrf_e8"), F.asc(id_col)).limit(int(topk))
    return out


def doc_similarity_topk(
    docs: DataFrame,
    k: int = 3,
    max_df: int = 32,
    query_max_id: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Sparse lexical doc-doc similarity (tf-idf dot product) via the
    inverted-index self-join — ``[doc_id, sim_id, score_e8, rank]``,
    top-``k`` neighbors per query doc (doc_id < ``query_max_id``).

    The pair generation is postings-driven (join on token), never
    all-pairs; tokens with df > ``max_df`` are dropped first — the
    standard prefix-filter that bounds each token's join fanout at
    df² and removes stopword-dominated pairs. Scores are exact
    BIGINTs: idf pre-rounded per TOKEN to 1e-4 nats, the pair score
    Σ tf₁·tf₂·idf_e4² (e4 — not e8 — so a few-hundred-token overlap
    stays far below 2^63 under ANSI)."""
    p = postings(docs, text_col)
    n = _n_docs(docs)
    dfs = (
        p.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .where(F.col("_df") <= int(max_df))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.round(F.log(F.col("_n") / F.col("_df")) * 10000.0, 0)
            .cast("long")
            .alias("idf_e4"),
        )
    )
    from pyspark.sql import Window

    pw = p.join(dfs, on="token")
    q = pw.where(F.col("doc_id") < int(query_max_id)).select(
        "token", F.col("doc_id").alias("_a"), F.col("tf").alias("_tfa"), "idf_e4"
    )
    d = pw.select("token", F.col("doc_id").alias("_b"), F.col("tf").alias("_tfb"))
    pairs = (
        q.join(d, on="token")
        .where(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(
            F.sum(
                F.col("_tfa") * F.col("_tfb") * F.col("idf_e4") * F.col("idf_e4")
            ).alias("score_e8")
        )
    )
    w = Window.partitionBy("_a").orderBy(F.desc("score_e8"), F.asc("_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(
            F.col("_a").alias("doc_id"),
            F.col("_b").alias("sim_id"),
            "score_e8",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def query_likelihood_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: float = 100.0,
    text_col: str = "text",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-``k`` (Ponte & Croft
    1998; Zhai & Lafferty 2004): ``[doc_id, n_matched_terms,
    score_e8]`` with

    ``score = Σ_w ln((tf(w,d) + μ·cf(w)/|C|) / (dl(d) + μ))``

    — the third classical ranker next to tf-idf and BM25.  Unlike
    BM25, smoothing scores EVERY document for every query term (a
    zero-tf term still contributes the collection prior), so the
    scored relation is docs × query-vocab — bounded by the query
    length, not the corpus.

    Oracle parity: each per-(doc, term) log term is pre-rounded to a
    1e-8-scaled BIGINT and the per-doc score is an exact integer sum
    (the repo-wide policy for sums of libm outputs).  Query terms
    absent from the corpus are dropped (their smoothed probability is
    0 ⇒ ln undefined; a real ranker treats them as OOV no-ops).

    Plan: the posting explode is filtered to the query vocabulary
    before aggregating; collection stats (cf, |C|) are a |q|-row
    broadcast; the docs×terms fan-out is a broadcast nested-loop over
    a |q|-row side, then one left join against postings.  Final top-k
    is orderBy+limit (TakeOrdered).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    dl = docs.select(
        "doc_id", F.size(tokens(text_col)).cast("long").alias("dl")
    )
    ctot = toks.agg(F.count(F.lit(1)).cast("long").alias("ctot"))
    cf = (
        toks.where(F.col("token").isin(*terms))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
        .crossJoin(F.broadcast(ctot))
    )
    post = (
        toks.where(F.col("token").isin(*terms))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    mu_l = F.lit(float(mu))
    pairs = dl.crossJoin(F.broadcast(cf))
    scored = pairs.join(post, on=["token", "doc_id"], how="left").select(
        "doc_id",
        F.when(F.col("tf").isNotNull(), 1).otherwise(0).alias("m"),
        F.round(
            F.log(
                (
                    F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                    + mu_l
                    * (F.col("cf").cast("double") / F.col("ctot").cast("double"))
                )
                / (F.col("dl").cast("double") + mu_l)
            )
            * E8,
            0,
        )
        .cast("long")
        .alias("term_e8"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_matched_terms"),
            F.sum("term_e8").cast("long").alias("score_e8"),
        )
        .orderBy(F.desc("score_e8"), F.asc("doc_id"))
        .limit(int(k))
    )
