"""Corpus-trained bigram language-model scoring (CCNet-style quality).

The canonical web-corpus quality filter (Wenzek et al. 2020, CCNet;
also Gopher's KenLM stage) scores each document by its per-token
log-probability under a language model trained on a trusted corpus and
drops the high-perplexity tail.  Full KenLM is out of scope for a pure
Spark engine; an add-one-smoothed bigram model captures the same
pipeline shape — train = two grouped counts over the corpus, score =
two equi-joins + one grouped sum — and is strong enough to separate
fluent text from shuffled-token spam (pinned by tests).

Float parity (the oracle discipline from linkpred's Adamic-Adar): each
bigram's log-probability ln((c+1)/(h+V)) is pre-rounded to a 1e-8-
scaled BIGINT, so the per-document sums are exact integer arithmetic —
immune to aggregation order and cross-engine libm ulp drift; the only
closing float op is one division for the average.

Scale notes: the bigram count table shuffles on (w1, w2) and the
history table on w1 — Zipfian tokens skew both; at 100 TB the counts
table is still ≪ corpus (vocabulary-bounded) so the score-side joins
are broadcast when it fits, else AQE skew-join handles the hot keys.
Per-row work is whole-stage codegen end-to-end (split / transform /
struct — no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.pipeline.text import tokens

E8 = 100_000_000


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram table ``[w1, w2, c]`` over whitespace tokens."""
    return (
        _bigrams(docs, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _bigrams(docs: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
    toks = docs.select(
        *([id_col] if id_col else []), tokens(text_col).alias("toks")
    ).where(F.size("toks") >= 2)
    pairs = F.expr(
        "transform(sequence(0, size(toks) - 2), "
        "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
    )
    return toks.select(
        *([id_col] if id_col else []), F.explode(pairs).alias("_bg")
    ).select(
        *([id_col] if id_col else []),
        F.col("_bg.w1").alias("w1"),
        F.col("_bg.w2").alias("w2"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
) -> DataFrame:
    """``[doc_id, n_bigrams, lp_e8, avg_logprob]`` — add-one-smoothed
    bigram log-likelihood of each document under the model trained on
    ``train`` (default: the scored corpus itself, the usual
    self-scoring setup for outlier removal).

    P(w2|w1) = (c(w1,w2)+1) / (h(w1)+V) with h(w1) = bigram occurrences
    starting at w1 and V = corpus vocabulary size; unseen histories
    degrade to the uniform 1/V floor via the left joins.  ``lp_e8`` is
    the exact integer sum of pre-rounded ln terms; ``avg_logprob`` =
    lp_e8 / 1e8 / n_bigrams as raw IEEE division (deliberately
    unrounded — see the comment below).  Documents with fewer than two
    tokens are omitted (no bigram evidence).
    """
    train = train if train is not None else docs
    tb = _bigrams(train, text_col)
    cnt = tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    hist = tb.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("h"))
    vocab = (
        train.select(F.explode(tokens(text_col)).alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    scored = (
        _bigrams(docs, text_col, id_col=id_col)
        .join(cnt, on=["w1", "w2"], how="left")
        .join(hist, on="w1", how="left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce("c", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("h", F.lit(0)) + F.col("v")).cast("double")
                )
                * E8,
                0,
            )
            .cast("long")
            .alias("_lp_e8"),
        )
    )
    # avg_logprob is RAW IEEE division of two exact integers — never
    # ROUND it: a quotient a hair under a .5e-8 boundary rounds
    # differently in Spark vs DuckDB (observed at sf0.01 doc 93), while
    # the bare division chain is bit-identical in both engines
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_lp_e8").alias("lp_e8"),
    ).select(
        id_col,
        "n_bigrams",
        "lp_e8",
        (F.col("lp_e8").cast("double") / E8 / F.col("n_bigrams")).alias(
            "avg_logprob"
        ),
    )


def cooccurrence_counts(
    docs: DataFrame, *, window: int = 2, text_col: str = "text"
) -> DataFrame:
    """Symmetric token co-occurrence counts ``[w1, w2, c]`` within a
    ±``window`` token neighborhood (word2vec/GloVe training statistic).

    Pair generation is pure array algebra — for each offset o ≤ window,
    zip the token list against itself shifted by o — so no self-join
    and no UDF; the only shuffle is the final count.  Each unordered
    co-occurrence is counted in both orders, making the row marginal
    the context-count marginal.
    """
    pairs = F.expr(
        "flatten(transform(sequence(1, {w}), o -> "
        "CASE WHEN size(toks) > o THEN transform(sequence(0, size(toks) - 1 - o), "
        "i -> struct(toks[i] AS a, toks[i + o] AS b)) "
        "ELSE array() END))".format(w=window)
    )
    p = (
        docs.select(tokens(text_col).alias("toks"))
        .where(F.size("toks") >= 2)
        .select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    )
    sym = p.unionByName(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return sym.groupBy(
        F.col("a").alias("w1"), F.col("b").alias("w2")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def pmi_pairs(
    docs: DataFrame,
    *,
    window: int = 2,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k token pairs by pointwise mutual information:
    ``[w1, w2, c, pmi_e8, pmi]`` with w1 < w2.

    PMI(x,y) = ln(c_xy·N / (c_x·c_y)) over the ±window co-occurrence
    table (Church & Hanks 1990; the shifted variant is word2vec's
    implicit factorization target, Levy & Goldberg 2014).  Each of the
    four ln terms is pre-rounded to a 1e-8 BIGINT and combined in
    integer arithmetic — engine-exact ranking AND no c_xy·N 64-bit
    overflow at web scale (the product form would blow past 2^63 once
    N ~ 10^12).  Ranking ties break on (w1, w2); ``pmi`` is the single
    closing division pmi_e8/1e8.
    """
    cxy = cooccurrence_counts(docs, window=window, text_col=text_col)
    cx = cxy.groupBy(F.col("w1").alias("w")).agg(F.sum("c").alias("cw"))
    nn = cxy.agg(F.sum("c").alias("n"))

    def _e8ln(col):
        return F.round(F.log(col.cast("double")) * E8, 0).cast("long")

    scored = (
        cxy.where((F.col("c") >= min_count) & (F.col("w1") < F.col("w2")))
        .join(F.broadcast(cx.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))), on="w1")
        .join(F.broadcast(cx.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))), on="w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            "c",
            (
                _e8ln(F.col("c"))
                + _e8ln(F.col("n"))
                - _e8ln(F.col("c1"))
                - _e8ln(F.col("c2"))
            ).alias("pmi_e8"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi_e8"), "w1", "w2")
        .limit(top_k)
        .select("w1", "w2", "c", "pmi_e8", (F.col("pmi_e8") / F.lit(E8)).alias("pmi"))
    )


def unigram_kl_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram KL divergence from the corpus distribution:
    ``[doc_id, n_tokens, kl_e8, kl]``.

    KL(doc ‖ corpus) = Σ_t p_t · ln(p_t / q_t) with p = in-doc MLE over
    the doc's own support and q = add-one-smoothed corpus unigram — the
    distribution-distance quality feature (cf. DSIR importance weights,
    Xie et al. 2023): high-KL docs are topical outliers / boilerplate,
    complementary to sequence likelihood (:func:`bigram_lm_scores`).
    Every term is pre-rounded to a 1e-8 BIGINT (one division + one ln +
    one multiply per term — identical expression trees cross-engine),
    so ``kl_e8`` is an exact integer and ``kl`` its single closing
    division.  Shuffles: doc-term count on (doc, tok), corpus count on
    tok (broadcast back), per-doc sum.
    """
    train = train if train is not None else docs
    dt = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    dc = dt.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nd = dc.groupBy(id_col).agg(F.sum("c").alias("n"))
    tt = train.select(F.explode(tokens(text_col)).alias("tok"))
    ct = tt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cc"))
    tot = tt.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.countDistinct("tok").cast("long").alias("v"),
    )
    p = F.col("c") / F.col("n")
    q = (F.coalesce("cc", F.lit(0)) + 1) / (F.col("nn") + F.col("v"))
    terms = (
        dc.join(nd, on=id_col)
        .join(F.broadcast(ct), on="tok", how="left")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            "n",
            F.round((p * F.log(p / q)) * E8, 0)
            .cast("long")
            .alias("_t_e8"),
        )
    )
    return terms.groupBy(id_col).agg(
        F.max("n").alias("n_tokens"),
        F.sum("_t_e8").alias("kl_e8"),
    ).select(
        id_col,
        "n_tokens",
        "kl_e8",
        (F.col("kl_e8") / F.lit(E8)).alias("kl"),
    )


def zipf_alpha(
    docs: DataFrame, *, fmin: int = 5, text_col: str = "text"
) -> DataFrame:
    """Zipf exponent of the corpus token-frequency distribution:
    one row ``[fmin, n_tail, alpha]`` (continuous MLE with the CSN −0.5
    discreteness correction, same estimator as
    :func:`dachshund_spark.algorithms.stats.powerlaw_alpha` but over
    token frequencies — natural corpora sit near α ≈ 2, so a corpus
    whose exponent drifts is template/boilerplate-heavy).  ln terms are
    pre-rounded to 1e-8 BIGINTs and summed exactly; two shuffles
    (token count, one-row aggregate)."""
    if fmin < 2:
        raise ValueError("fmin must be >= 2")
    tf = docs.select(F.explode(tokens(text_col)).alias("tok")).groupBy(
        "tok"
    ).agg(F.count(F.lit(1)).cast("long").alias("f"))
    term_e8 = F.round(
        F.log(F.col("f") / F.lit(float(fmin) - 0.5)) * F.lit(E8), 0
    ).cast("long")
    out = tf.where(F.col("f") >= fmin).agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(term_e8).cast("long").alias("_s_e8"),
    )
    return out.select(
        F.lit(int(fmin)).cast("long").alias("fmin"),
        "n_tail",
        F.round(
            F.lit(1.0)
            + F.col("n_tail") / (F.col("_s_e8").cast("double") / F.lit(float(E8))),
            8,
        ).alias("alpha"),
    )


def dsir_weights(
    docs: DataFrame,
    target,
    *,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR hashed-unigram importance log-weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    ``[doc_id, n_tokens, w_e8, log_weight]``.

    ``target`` is a boolean Column marking the target-domain docs.
    Token buckets via md5 % n_buckets; per bucket the add-one-smoothed
    log-ratio ln(p_target/p_source) decomposes into FOUR pre-rounded
    1e-8 BIGINT ln terms combined in integer space — engine-exact AND
    overflow-safe (the product form (tc+1)·(S+B) blows past 2^63 once
    token counts hit ~10^12; the PMI decomposition never multiplies
    counts).  A doc's weight is then an exact integer dot product
    Σ count_b · term_b; the only float op is the closing /1e8.

    Scale shape: ONE token-level shuffle — the (doc, bucket) count —
    then the bucket totals derive from that (already tiny) table with
    a second small shuffle, so the corpus is scanned and exploded
    exactly once.  The bucket/term table is n_buckets rows —
    broadcast to the scoring join.  Resample downstream by
    thresholding ``log_weight + gumbel`` or top-k.
    """
    from dachshund_spark.pipeline.text import md5_long

    toks = docs.select(
        id_col,
        target.alias("_is_t"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    bk = toks.select(
        id_col,
        "_is_t",
        F.pmod(md5_long(F.col("tok")), F.lit(n_buckets)).alias("bucket"),
    )
    # _is_t is constant per doc, so it rides the (doc, bucket) groupBy
    dc = bk.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c"), F.first("_is_t").alias("_is_t")
    )
    dc = dc.localCheckpoint(eager=True)  # reused by bc and the scoring join
    bc = dc.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("tc"),
    )
    tot = bc.agg(
        F.sum("sc").cast("long").alias("s"), F.sum("tc").cast("long").alias("t")
    )

    def _e8ln(col):
        return F.round(F.log(col.cast("double")) * E8, 0).cast("long")

    terms = bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            _e8ln(F.col("tc") + 1)
            - _e8ln(F.col("sc") + 1)
            + _e8ln(F.col("s") + n_buckets)
            - _e8ln(F.col("t") + n_buckets)
        ).alias("term"),
    )
    return (
        dc.join(F.broadcast(terms), on="bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("term")).cast("long").alias("w_e8"),
        )
        .select(
            id_col,
            "n_tokens",
            "w_e8",
            (F.col("w_e8") / F.lit(E8)).alias("log_weight"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Learn byte-pair-encoding merges from the corpus (Sennrich et
    al. 2016): ``[rank, a, b, pair_count]`` — the first ``n_merges``
    merge rules in order.

    Classic BPE: start from the word-frequency table with each word
    split into characters; per round, count adjacent symbol pairs
    weighted by word frequency (overlaps counted, as in the reference
    implementation), merge the most frequent pair everywhere
    (greedy left-to-right — overlapping occurrences like "aaa" merge
    at even offsets only), repeat.  Ties break lexicographically on
    (a, b) so the trace is deterministic and SQL-replayable.

    Scale shape: every round runs on the WORD-FREQUENCY table —
    vocabulary-bounded, not corpus-bounded — so learning cost is
    independent of corpus size beyond the initial token count.  The
    per-round argmax is a 1-row collect (the merge rule itself);
    greedy within-word merging is a window over positions per word
    (words are bounded-length).  Each round is checkpointed (CLAUDE.md
    fixpoint discipline).
    """
    merges, _ = _bpe_learn(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        merges, "rank int, a string, b string, pair_count long"
    )


def bpe_encode_counts(
    docs: DataFrame,
    n_merges: int = 8,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the corpus-learned BPE merges back to the corpus:
    ``[doc_id, n_words, n_bpe_tokens]`` — per-doc whitespace word count
    and the subword-token count after ``n_merges`` merge rounds
    (n_bpe_tokens = n_chars_of_words at 0 merges, shrinking toward
    n_words as merges compound).

    Encoding only touches the VOCABULARY: the merged symbol table from
    learning already IS the encoding of every distinct word, so
    per-doc counts are one explode + one broadcast-sized join on the
    word — no per-round work at corpus scale.  (This is the tokenizer
    fertility measurement a data pipeline runs before committing to a
    vocab size.)
    """
    _, vocab = _bpe_learn(docs, n_merges, text_col)
    sub = vocab.select("word", F.size("syms").cast("long").alias("n_sub"))
    toks = docs.select(id_col, F.explode(tokens(text_col)).alias("word"))
    return toks.join(sub, on="word").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sub").alias("n_bpe_tokens"),
    )


def _bpe_learn(docs: DataFrame, n_merges: int, text_col: str):
    """Shared BPE learning loop: returns ``(merges, vocab)`` where
    merges is a list of (rank, a, b, count) and vocab the final
    ``[word, freq, syms]`` frame after all merges applied."""
    from pyspark.sql import Window

    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for r in range(1, n_merges + 1):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "word",
                "freq",
                "syms",
                F.posexplode(
                    F.expr("slice(syms, 1, size(syms) - 1)")
                ).alias("p", "a"),
            )
            .select("word", "freq", "p", "a", F.expr("syms[p + 1]").alias("b"))
        )
        top_rows = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top_rows:
            break
        top = top_rows[0]
        merges.append((r, top.a, top.b, int(top.c)))
        merged_sym = top.a + top.b

        m = pairs.where(
            (F.col("a") == F.lit(top.a)) & (F.col("b") == F.lit(top.b))
        ).select("word", "p")
        w_rn = Window.partitionBy("word").orderBy("p")
        isl = m.withColumn(
            "island", F.col("p") - F.row_number().over(w_rn)
        )
        w_isl = Window.partitionBy("word", "island")
        kept = (
            isl.withColumn("mn", F.min("p").over(w_isl))
            .where(((F.col("p") - F.col("mn")) % 2) == 0)
            .select("word", "p")
        )
        allq = vocab.select(
            "word", "freq", F.posexplode("syms").alias("q", "sym")
        )
        start = kept.select(
            "word", F.col("p").alias("q"), F.lit(1).alias("_st")
        )
        second = kept.select(
            "word", (F.col("p") + 1).alias("q"), F.lit(1).alias("_sc")
        )
        vocab = (
            allq.join(start, on=["word", "q"], how="left")
            .join(second, on=["word", "q"], how="left")
            .where(F.col("_sc").isNull())
            .select(
                "word",
                "freq",
                "q",
                F.when(F.col("_st") == 1, F.lit(merged_sym))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .groupBy("word", "freq")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(q, sym))), x -> x.sym)"
                ).alias("syms")
            )
            .localCheckpoint(eager=True)
        )
    return merges, vocab


def kneser_ney_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    topk: int = 100,
) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities (Chen &
    Goodman 1999) for the top-k bigrams by count:
    ``[w1, w2, c12, c1, n1f, n1b, n_types, p_kn]`` where

        p_KN(w2|w1) = max(c12 − d, 0)/c1
                    + (d · N1+(w1·)/c1) · (N1+(·w2)/|bigram types|)

    Everything upstream of p_kn is an exact integer aggregate (bigram
    counts, context totals, forward/backward continuation type counts);
    p_kn itself uses only +, −, ×, / with the dyadic discount 0.75, so
    the shared expression tree is engine-stable (no libm).  Scale
    shape: one explode + three map-side-combinable groupBys over the
    bigram table; the type total is a broadcast scalar.
    """
    bc = bigram_counts(docs, text_col).persist()
    ctx = bc.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    back = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    n_types = bc.count()
    top = (
        bc.orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
        .limit(int(topk))
        .join(ctx, on="w1")
        .join(back, on="w2")
    )
    d = F.lit(float(discount))
    c12 = F.col("c").cast("double")
    c1 = F.col("c1").cast("double")
    p = (
        F.greatest(c12 - d, F.lit(0.0)) / c1
        + (d * F.col("n1f").cast("double") / c1)
        * (F.col("n1b").cast("double") / F.lit(float(n_types)))
    )
    return top.select(
        "w1",
        "w2",
        F.col("c").cast("long").alias("c12"),
        F.col("c1").cast("long").alias("c1"),
        F.col("n1f").cast("long").alias("n1f"),
        F.col("n1b").cast("long").alias("n1b"),
        F.lit(int(n_types)).cast("long").alias("n_types"),
        p.alias("p_kn"),
    )


def ccnet_buckets(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_cutoff_e8: int = -339_000_000,
    middle_cutoff_e8: int = -342_000_000,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020):
    documents bucketed by LM quality against FIXED per-corpus cutoffs —
    exactly how CCNet applies its precomputed per-language perplexity
    thresholds at scale (no corpus-wide ranking, no extra shuffle
    beyond the scoring joins).

    A doc is ``head`` when avg logprob > head_cutoff, ``middle`` when >
    middle_cutoff, else ``tail``; comparisons are integer
    cross-multiplications of the exact ``lp_e8`` sum against
    cutoff·n_bigrams (cutoffs given as 1e8-scaled integers), so the
    bucket labels replay exactly in SQL.
    """
    scores = bigram_lm_scores(docs, text_col=text_col, id_col=id_col)
    lp, n = F.col("lp_e8"), F.col("n_bigrams")
    bucket = (
        F.when(lp > F.lit(int(head_cutoff_e8)) * n, F.lit("head"))
        .when(lp > F.lit(int(middle_cutoff_e8)) * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scores.select(id_col, "n_bigrams", "lp_e8", bucket.alias("bucket"))


def textrank_keywords(
    docs: DataFrame,
    *,
    text_col: str = "text",
    damping: float = 0.85,
    iterations: int = 10,
    topk: int = 50,
) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004): weighted
    PageRank over the corpus word co-occurrence graph —
    ``[token, score]``, the ``topk`` highest-scoring tokens.

    Graph construction is one pass over the token stream: adjacent
    token pairs (window = 2, the paper's default) become undirected
    edges weighted by their corpus co-occurrence count.  The rank
    recurrence then reuses :func:`~dachshund_spark.algorithms.pagerank`
    verbatim (weighted, symmetric edge double cover, no dangling nodes
    by construction), so the scale story — per-superstep
    materialization, skew salting dials, checkpoint/resume — is
    inherited rather than re-implemented.  Joins are vocab-keyed
    (tokens), orders of magnitude smaller than the document corpus:
    the expensive part is the single bigram explode.

    Scores are rounded to 8 decimals and ties broken by token, so the
    top-k cut is deterministic and engine-replayable (the rank
    expression tree matches the unrolled SQL oracle exactly; float
    drift across sum orders is far below the rounding grain).
    """
    from dachshund_spark.algorithms.pagerank import pagerank
    from dachshund_spark.graph import LinkGraph

    b = _bigrams(docs, text_col)
    p = (
        b.where(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("a"), F.greatest("w1", "w2").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("wt"))
    )
    edges = p.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "wt"
    ).unionAll(p.select(F.col("b").alias("src"), F.col("a").alias("dst"), "wt"))
    wg = LinkGraph(edges, extra_cols=["wt"])
    pr = pagerank(
        wg,
        weight_col="wt",
        dedupe_edges=False,
        damping=damping,
        fixed_iterations=iterations,
    )
    return (
        pr.select(
            F.col("node_id").alias("token"),
            F.round("pagerank", 8).alias("score"),
        )
        .orderBy(F.desc("score"), "token")
        .limit(topk)
    )


def _trigrams(docs: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
    toks = docs.select(
        *([id_col] if id_col else []), tokens(text_col).alias("toks")
    ).where(F.size("toks") >= 3)
    triples = F.expr(
        "transform(sequence(0, size(toks) - 3), "
        "i -> struct(toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3))"
    )
    return toks.select(
        *([id_col] if id_col else []), F.explode(triples).alias("_tg")
    ).select(
        *([id_col] if id_col else []),
        F.col("_tg.w1").alias("w1"),
        F.col("_tg.w2").alias("w2"),
        F.col("_tg.w3").alias("w3"),
    )


def stupid_backoff_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
    alpha_num: int = 2,
    alpha_den: int = 5,
) -> DataFrame:
    """``[doc_id, n_trigrams, sb_e8, avg_score]`` — trigram
    Stupid-Backoff scores (Brants et al. 2007, "Large Language Models
    in Machine Translation") of each document under counts from
    ``train`` (default: self-scoring):

    - trigram seen:  ``S = c3(w1w2w3) / c2(w1w2)``
    - else bigram:   ``S = α · c2(w2w3) / c1(w2)``
    - else unigram:  ``S = α² · max(c1(w3), 1) / C``  (OOV floor 1)

    with α = 0.4 — the web-scale LM scorer that made smoothing
    unnecessary at Google corpus sizes: no discounting state, every
    branch a ratio of two BIGINT counts times a constant, so the
    whole model is three count tables and five equi-joins.

    Per-position ``ln S`` is pre-rounded to a 1e-8 BIGINT and summed
    exactly (the repo policy for libm sums); ``avg_score`` is the raw
    IEEE division of the two exact integers.  Documents shorter than
    three tokens are omitted.
    """
    train = train if train is not None else docs
    tg = _trigrams(train, text_col)
    c3 = tg.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    )
    bg = _bigrams(train, text_col)
    c2 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    c1 = (
        train.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    ctot = train.select(F.explode(tokens(text_col)).alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("ctot")
    )
    alpha = F.lit(alpha_num) / F.lit(alpha_den)
    scored = (
        _trigrams(docs, text_col, id_col=id_col)
        .join(c3, on=["w1", "w2", "w3"], how="left")
        .join(
            c2.select(
                F.col("w1"), F.col("w2"), F.col("c2").alias("h3")
            ),
            on=["w1", "w2"],
            how="left",
        )
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c2").alias("c2b"),
            ),
            on=["w2", "w3"],
            how="left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c1").alias("h2")),
            on="w2",
            how="left",
        )
        .join(
            c1.select(F.col("w").alias("w3"), F.col("c1").alias("c1t")),
            on="w3",
            how="left",
        )
        .crossJoin(F.broadcast(ctot))
    )
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("h3").cast("double"),
        )
        .when(
            F.col("c2b").isNotNull(),
            alpha * (F.col("c2b").cast("double") / F.col("h2").cast("double")),
        )
        .otherwise(
            alpha
            * alpha
            * (
                F.greatest(F.coalesce("c1t", F.lit(0)), F.lit(1)).cast("double")
                / F.col("ctot").cast("double")
            )
        )
    )
    terms = scored.select(
        id_col, F.round(F.log(s) * E8, 0).cast("long").alias("_sb_e8")
    )
    return (
        terms.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum("_sb_e8").alias("sb_e8"),
        )
        .select(
            id_col,
            "n_trigrams",
            "sb_e8",
            (F.col("sb_e8").cast("double") / E8 / F.col("n_trigrams")).alias(
                "avg_score"
            ),
        )
    )


def dunning_collocations(
    docs: DataFrame,
    *,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning 1993):
    ``[w1, w2, c12, c1, c2, llr_e8]`` — the top-``top_k`` bigrams by
    G² = 2·Σ_cells O·ln(O/E) over the 2×2 contingency table, the
    classic surprise statistic that (unlike PMI) does not explode on
    rare pairs.

    Every cell count is an exact integer (O11 = c12, O12 = c1−c12,
    O21 = c2−c12, O22 = N−c1−c2+c12 with c1/c2 the positional
    marginals over N bigram slots); each ``O·ln(O·N/(row·col))`` term
    pre-rounds its ln to an e8 BIGINT and weights by the integer O —
    the repo's PMI machinery — so ``llr_e8`` is an exact integer sum
    and the top-k ordering (llr DESC, w1, w2) has no float boundary
    at all.  Zero cells contribute 0 (the O→0 limit).
    """
    bg = _bigrams(docs, text_col)
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    c2 = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    nn = bg.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    j = (
        c12.where(F.col("c12") >= F.lit(int(min_count)))
        .join(c1, on="w1")
        .join(c2, on="w2")
        .crossJoin(F.broadcast(nn))
    )

    def term(o, row, col):
        return F.when(
            o > 0,
            o
            * F.round(
                F.log(
                    (o * F.col("nn")).cast("double")
                    / (row * col).cast("double")
                )
                * E8,
                0,
            ).cast("long"),
        ).otherwise(F.lit(0))

    o11 = F.col("c12")
    o12 = F.col("c1") - F.col("c12")
    o21 = F.col("c2") - F.col("c12")
    o22 = F.col("nn") - F.col("c1") - F.col("c2") + F.col("c12")
    r1 = F.col("c1")
    r2 = F.col("nn") - F.col("c1")
    k1 = F.col("c2")
    k2 = F.col("nn") - F.col("c2")
    llr = (
        F.lit(2)
        * (
            term(o11, r1, k1)
            + term(o12, r1, k2)
            + term(o21, r2, k1)
            + term(o22, r2, k2)
        )
    ).cast("long")
    return (
        j.select("w1", "w2", "c12", "c1", "c2", llr.alias("llr_e8"))
        .orderBy(F.desc("llr_e8"), F.asc("w1"), F.asc("w2"))
        .limit(int(top_k))
    )
