"""Text analysis for training-data pipelines.

All hot-path functions are built-in column expressions (JVM-side,
whole-stage codegen); nothing here drops to Python per row.
Hashes use md5-hex→int so oracle SQL (DuckDB) can reproduce them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small, language-agnostic function-word lists for the stopword
# heuristic language id (the corpus here is synthetic; real deployments
# would swap in a fastText-style model via a pandas UDF)
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (split on single space — the pinned
    tokenizer contract; a BPE-ish regex variant is `tokens_regex`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def tokens_regex(col: str | Column) -> Column:
    """BPE-ish tokenizer: letter runs, digit runs, or single marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: counts, distinct counts, char length."""
    toks = tokens(text_col)
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Heuristic quality signals: length gates + stopword ratio +
    punctuation ratio + mean word length (Gopher/C4-style filters)."""
    sw = stopwords or STOPWORDS_EN
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*sw)))
    n_punct = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (n_stop / n_tokens).alias("stop_ratio"),
        (n_punct / F.length(text_col)).alias("punct_ratio"),
        ((F.length(text_col) - (n_tokens - 1)) / n_tokens).alias("mean_word_len"),
        (
            (n_tokens >= min_tokens)
            & (n_tokens <= max_tokens)
            & (n_stop / n_tokens < 0.5)
        ).alias("passes_quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per doc, the language whose
    function words occur most often; ties → alphabetically-smallest
    language code; 'und' when no marker matches."""
    toks = tokens(text_col)
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(*markers))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    arr = F.array(*scores)
    max_score = F.array_max(F.transform(arr, lambda s: s["score"]))
    pick = F.array_min(F.filter(arr, lambda s: s["score"] == max_score))["lang"]
    return docs.select(
        "doc_id",
        F.when(max_score > 0, pick).otherwise(F.lit("und")).alias("detected_lang"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1): fraction of repeated tokens / 2-grams and the share of the
    single most frequent token / 2-gram.  High values flag boilerplate
    and degenerate (keyboard-mash, SEO-spam) pages.

    Shape: explode → two groupBys (map-side combinable) — the
    distributed mode computation; no per-row Python, no O(n·distinct)
    array scans.  All output ratios are single divisions of exact
    integer counts, so the DuckDB oracle matches bit-for-bit.
    Documents with < 2 tokens get null 2-gram fractions (no 2-grams).
    """
    toks = tokens(text_col)
    base = docs.select("doc_id", toks.alias("_toks"))
    grams2 = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.slice("_toks", 1, F.size("_toks") - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at("_toks", i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni = base.select("doc_id", F.explode("_toks").alias("g"))
    bi = base.select("doc_id", F.explode(grams2).alias("g"))

    def _per_doc(exploded: DataFrame, pfx: str) -> DataFrame:
        counts = exploded.groupBy("doc_id", "g").agg(
            F.count(F.lit(1)).alias("c")
        )
        return counts.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias(f"n_{pfx}"),
            F.count(F.lit(1)).cast("long").alias(f"n_distinct_{pfx}"),
            F.max("c").cast("long").alias(f"top_{pfx}_count"),
        )

    u = _per_doc(uni, "tokens")
    b = _per_doc(bi, "grams2")
    # LEFT joins: a NULL-text doc explodes to zero rows and would
    # otherwise vanish from the per-doc output (all stats null instead)
    out = base.select("doc_id").join(u, on="doc_id", how="left").join(
        b, on="doc_id", how="left"
    )
    nt = F.col("n_tokens")
    ng = F.col("n_grams2")
    return out.select(
        "doc_id",
        "n_tokens",
        ((nt - F.col("n_distinct_tokens")) / nt).alias("dup_token_frac"),
        (F.col("top_tokens_count") / nt).alias("top_token_frac"),
        F.when(ng > 0, (ng - F.col("n_distinct_grams2")) / ng).alias(
            "dup_2gram_frac"
        ),
        F.when(ng > 0, F.col("top_grams2_count") / ng).alias("top_2gram_frac"),
    )


def vocabulary(
    docs: DataFrame, text_col: str = "text", min_df: int = 1
) -> DataFrame:
    """Corpus vocabulary with term and document frequencies:
    ``[token, tf, df]`` — the first pass of tokenizer training (BPE /
    unigram-LM seeds start from exactly this table) and the input to
    df-based stopword/boilerplate thresholds.

    One explode + one groupBy(token) with map-side combine; df comes
    from counting distinct doc_ids per token inside the same shuffle
    (two-level aggregate, no second pass over the corpus).
    """
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    per_doc = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    out = per_doc.groupBy("token").agg(
        F.sum("_tf").cast("long").alias("tf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= F.lit(int(min_df)))
    return out


def md5_long(col: Column) -> Column:
    """First 15 hex chars of md5 as a bigint — reproducible in any SQL
    engine (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-independent document fingerprint: sum of token md5-hashes
    (commutative, so distributed aggregation order doesn't matter —
    same trick as the reference's clique checksum,
    /root/reference/src/dachshund/candidate.rs:173-184).

    Hashes are reduced mod 2^40 before summing so the bigint sum cannot
    overflow (ANSI mode) for documents up to ~8M tokens."""
    toks = tokens(text_col)
    hashed = F.transform(toks, lambda x: md5_long(x) % F.lit(1 << 40))
    return docs.select(
        "doc_id",
        F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "fingerprint"
        ),
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-Kincaid grade + Flesch reading ease per document.

    Words = non-space runs, sentences = runs of ``[.!?]`` (min 1),
    syllables = vowel-group runs ``[aeiouy]+`` — the standard cheap
    heuristics (real syllabification needs a dictionary; this is the
    filterable signal training-data curation uses). All counts are
    exact integers; the two scores are per-row double expressions with
    an engine-stable tree (identical in the DuckDB oracle), rounded to
    8 decimals."""
    t = F.col(text_col)
    n_words = F.regexp_count(t, F.lit(r"\S+")).cast("long")
    n_sent = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    w = F.greatest(n_words, F.lit(1).cast("long")).cast("double")
    s = n_sent.cast("double")
    y = n_syll.cast("double")
    fk = F.lit(0.39) * w / s + F.lit(11.8) * y / w - F.lit(15.59)
    ease = F.lit(206.835) - F.lit(1.015) * w / s - F.lit(84.6) * y / w
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(fk, 8).alias("fk_grade"),
        F.round(ease, 8).alias("reading_ease"),
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level Shannon entropy of the unigram distribution — the
    diversity metric curation pipelines track as dedup/filtering knobs
    move. One output row: total tokens, distinct types, and entropy in
    1e-8 nats as an exact BIGINT (each −p·ln p term is pre-rounded to
    an e8 integer before the sum, so neither aggregation order nor
    cross-engine libm ulps can perturb the result — the Adamic-Adar
    trick)."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("n_tokens"))
    j = counts.crossJoin(F.broadcast(total))
    p = F.col("cnt").cast("double") / F.col("n_tokens").cast("double")
    term = F.round(-(p * F.log(p)) * F.lit(1e8), 0).cast("long")
    return j.agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(term).alias("entropy_e8"),
    )


def gopher_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality-rule flags (Rae et al. 2021 §A1.1), token-level
    subset applicable to single-line documents: word-count window,
    mean-word-length ∈ [3, 10], ≥80% words containing an alphabetic
    character, ≥2 stopword hits, symbol-to-word ratio ≤ 0.1 (# / …).

    All rules are evaluated as cross-multiplied integer comparisons
    (no float thresholds), so the pass flags replay exactly in SQL.
    Returns the exact counts alongside the flags for auditability.
    """
    toks = tokens(text_col)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    n_sym = F.size(
        F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        sum_len.alias("sum_word_len"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_stopwords"),
        n_sym.cast("long").alias("n_symbol_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("pass_word_count"),
        # 3 <= mean <= 10  ⇔  3n <= Σlen <= 10n
        ((sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)).alias(
            "pass_mean_word_len"
        ),
        # alpha fraction >= 0.8  ⇔  5·n_alpha >= 4·n_words
        (5 * n_alpha >= 4 * n_words).alias("pass_alpha_ratio"),
        (n_stop >= 2).alias("pass_stopwords"),
        # symbol ratio <= 0.1  ⇔  10·n_sym <= n_words
        (10 * n_sym <= n_words).alias("pass_symbol_ratio"),
        (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (sum_len >= 3 * n_words)
            & (sum_len <= 10 * n_words)
            & (5 * n_alpha >= 4 * n_words)
            & (n_stop >= 2)
            & (10 * n_sym <= n_words)
        ).alias("pass_gopher"),
    )


def rake_keywords(
    docs: DataFrame,
    *,
    text_col: str = "text",
    stopwords: "list[str] | None" = None,
    topk: int = 20,
) -> DataFrame:
    """RAKE keyword phrases (Rose et al. 2010):
    ``[phrase, n_occurrences, score_e8]`` — the ``topk`` candidate
    phrases by summed member-word degree/frequency score.

    Candidate phrases are maximal stopword-free token runs (the
    classic delimiter heuristic); word degree counts every phrase slot
    the word co-occurs with (deg(w) = Σ |phrase| over its occurrences),
    freq its occurrence count.  Scores are 1e-8-scaled integers —
    round(1e8·deg/freq) per word, summed exactly — so ranking and the
    top-k cut replay bit-for-bit in SQL.  Ties break by phrase text.

    Scale: one posexplode + per-doc windows (partitioned by doc_id) +
    vocab-keyed joins — no global sort; the final top-k compiles to
    TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    sw = STOPWORDS_EN if stopwords is None else stopwords
    t = docs.select(
        "doc_id", F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    runs = (
        t.where(~F.col("tok").isin(sw))
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
        )
    )
    plen = runs.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("plen"))
    wstats = (
        runs.join(plen, on=["doc_id", "grp"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    wsc = wstats.select(
        "tok",
        F.round(
            F.col("deg").cast("double") * F.lit(100000000.0)
            / F.col("freq").cast("double"),
            0,
        )
        .cast("long")
        .alias("sc"),
    )
    occ = (
        runs.join(wsc, on="tok")
        .groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("phrase"),
            F.sum("sc").cast("long").alias("score_e8"),
        )
    )
    return (
        occ.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_e8").alias("score_e8"),
        )
        .orderBy(F.desc("score_e8"), "phrase")
        .limit(topk)
    )


def mattr(docs: DataFrame, text_col: str = "text", window: int = 10) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010) —
    the length-independent lexical-diversity score corpus-quality
    pipelines use instead of raw TTR (which decays with doc length).

    For each length-``window`` sliding span of the token stream, count
    distinct tokens; MATTR = mean(distinct/window) over all spans.
    Emitted as ``mattr_e8 = Σ distinct · 10^8 DIV (n_windows · window)``
    — exact integer arithmetic end-to-end, engine-reproducible.

    Scale shape: tokens explode ×window into (doc, span) buckets via an
    offset sequence (pure equi-grouping, no non-equi range join), one
    distinct-count agg per span, one sum per doc — all map-side
    combinable; cost is linear in tokens × window.

    Docs shorter than ``window`` are dropped (no full span exists).
    """
    w = int(window)
    t = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    n = t.groupBy("doc_id").agg(F.max("pos").alias("_maxp"))
    spans = (
        t.join(n, on="doc_id")
        .where(F.col("_maxp") >= w - 1)
        .select(
            "doc_id",
            "tok",
            "pos",
            "_maxp",
            F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("_off"),
        )
        .select(
            "doc_id", "tok", (F.col("pos") - F.col("_off")).alias("p"), F.col("_maxp")
        )
        .where((F.col("p") >= 0) & (F.col("p") <= F.col("_maxp") - (w - 1)))
    )
    per_span = spans.groupBy("doc_id", "p").agg(
        F.countDistinct("tok").alias("n_distinct")
    )
    return (
        per_span.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum("n_distinct").cast("long").alias("sum_distinct"),
        )
        .select(
            "doc_id",
            "n_windows",
            "sum_distinct",
            F.expr(f"sum_distinct * 100000000 DIV (n_windows * {w})")
            .cast("long")
            .alias("mattr_e8"),
        )
    )


def source_language_mix(docs: DataFrame) -> DataFrame:
    """Per-source language census: doc counts, distinct languages, and
    the majority language with its exact integer share — the corpus
    triage table a multilingual curation pass starts from (which
    sources are monolingual, which need per-language routing).

    ``top_share_e8 = n_top · 10^8 DIV n_docs`` (truncating integer
    division); majority ties break to the lexicographically smallest
    language code — expressed as MAX(n) then MIN(lang) among the
    arg-max rows, two map-side-combinable aggregates with no windows
    and no engine-specific arg_max semantics.
    """
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max("n").cast("long").alias("n_top"),
    )
    top = (
        per.join(tot.select("source", "n_top"), on="source")
        .where(F.col("n") == F.col("n_top"))
        .groupBy("source")
        .agg(F.min("lang").alias("top_lang"))
    )
    return tot.join(top, on="source").select(
        "source",
        "n_docs",
        "n_langs",
        "top_lang",
        F.expr("n_top * 100000000 DIV n_docs").cast("long").alias("top_share_e8"),
    )


def c4_line_filters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style line-level filtering census per document:
    [doc_id, n_lines, n_kept, total_words, kept_words, doc_kept].

    The synthetic corpus has no sentence punctuation, so sentence
    boundaries are injected with the :func:`readability` precedent
    (``' the ' → '. the '``, left-to-right non-overlapping in both
    engines) before splitting on ``'. '``.  A line is kept when it
    (a) terminated with punctuation (every split position except the
    last), (b) has ≥ 5 words, and (c) contains neither ``'{'`` nor
    ``'javascript'`` — the C4 heuristics (Raffel et al. 2020) reduced
    to the signals this corpus can exercise.  ``doc_kept`` applies the
    document-level rule (≥ 3 surviving lines).  Pure column algebra —
    one explode, one groupBy(doc_id).
    """
    t = F.replace(F.col(text_col), F.lit(" the "), F.lit(". the "))
    lines = F.split(t, r"\. ")
    ex = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.posexplode(lines).alias("pos", "line"),
    )
    n_words = F.size(F.split(F.col("line"), " ")).cast("long")
    keep = (
        (F.col("pos") < F.col("n_lines") - 1)
        & (n_words >= 5)
        & ~F.col("line").contains("{")
        & ~F.col("line").contains("javascript")
    )
    per_line = ex.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        n_words.alias("nw"),
        keep.cast("int").alias("kept"),
    )
    agg = per_line.groupBy("doc_id", "n_lines").agg(
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum("nw").cast("long").alias("total_words"),
        F.sum(F.col("nw") * F.col("kept")).cast("long").alias("kept_words"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "total_words",
        "kept_words",
        (F.col("n_kept") >= 3).alias("doc_kept"),
    )


def inject_mojibake(
    docs: DataFrame, text_col: str = "text", every: int = 7
) -> DataFrame:
    """Deterministic corruption fixture: docs with ``doc_id % every ==
    0`` get the classic UTF-8-read-as-latin-1 double-encoding applied
    to every ``'a'`` (→ ``'Ã¡'``) — the reproducible mojibake corpus
    the census below is tested against (plain string replace, identical
    in both engines)."""
    c = F.when(
        F.col("doc_id") % every == 0,
        F.replace(F.col(text_col), F.lit("a"), F.lit("Ã¡")),
    ).otherwise(F.col(text_col))
    return docs.withColumn(text_col, c)


def mojibake_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-health census per document:
    [doc_id, n_chars, n_nonascii, n_moji_markers, ascii_ratio_e8,
    moji_flag].

    Marker = ``'Ã'`` (the tell-tale first byte of double-encoded
    Latin-1); non-ASCII counted by stripping the printable-ASCII class.
    ``ascii_ratio_e8`` is an exact integer ``(ascii·10^8) div chars``.
    All length/replace column algebra — no UDFs, no shuffle beyond the
    source scan.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_ascii = F.length(F.regexp_replace(t, "[^ -~]", "")).cast("long")
    n_moji = (n_chars - F.length(F.replace(t, F.lit("Ã"), F.lit("")))).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        (n_chars - n_ascii).alias("n_nonascii"),
        n_moji.alias("n_moji_markers"),
        F.expr(
            f"(CAST(length(regexp_replace({text_col}, '[^ -~]', '')) AS BIGINT)"
            f" * 100000000) DIV CAST(length({text_col}) AS BIGINT)"
        ).alias("ascii_ratio_e8"),
        (n_moji > 0).alias("moji_flag"),
    )


def boilerplate_lines(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    threshold_pct: int = 50,
) -> DataFrame:
    """Cross-document boilerplate detection per corpus group (the
    CCNet/jusText site-level signal): a line appearing on ≥
    ``threshold_pct``% of a group's documents is boilerplate
    (navigation/footer), regardless of its content quality —
    ``[<group_col>, n_docs, n_distinct_lines, n_boilerplate_lines]``.

    Lines use the :func:`readability` sentence-boundary injection
    (``' the ' → '. the '``); each (doc, line) counts once however
    often the doc repeats it.  The compare is the integer
    cross-multiplication ``cnt·100 ≥ pct·n_docs``.  Two aggregations:
    (group, line) counts then the group rollup — the line strings
    shuffle once, hash-partitioned by content.
    """
    t = F.replace(F.col(text_col), F.lit(" the "), F.lit(". the "))
    dl = (
        docs.select(
            F.col(group_col), F.col("doc_id"), F.explode(F.split(t, r"\. ")).alias("line")
        )
        .distinct()
    )
    nd = docs.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    lc = dl.groupBy(group_col, "line").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        lc.join(nd, on=group_col)
        .groupBy(group_col, "n_docs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_lines"),
            F.sum(
                (F.col("cnt") * 100 >= F.lit(int(threshold_pct)) * F.col("n_docs"))
                .cast("long")
            )
            .cast("long")
            .alias("n_boilerplate_lines"),
        )
        .select(group_col, "n_docs", "n_distinct_lines", "n_boilerplate_lines")
    )


def feature_hash(
    docs: DataFrame, n_buckets: int = 32, text_col: str = "text"
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009):
    ``[doc_id, bucket, value]`` — each token routed to
    ``md5 % n_buckets`` with a second-hash ±1 sign, signed term
    frequencies summed per bucket.

    The standard way to turn an unbounded vocabulary into a fixed-width
    feature vector with NO vocabulary table (nothing to broadcast,
    nothing to train): the sign hash makes collisions cancel in
    expectation, so hashed linear models stay unbiased.  One explode +
    one (doc, bucket) aggregation — map-side combinable, vocabulary-
    free, exactly what a 100 TB quality-classifier featurizer needs.

    All-integer and hash-deterministic, so it replays exactly in SQL.
    Zero-sum buckets are emitted (value 0), absent buckets are not.
    """
    toks = docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
    bucket = (
        md5_long(F.concat(F.lit("fh#"), F.col("token")))
        % F.lit(int(n_buckets))
    ).alias("bucket")
    sign = (
        F.when(
            md5_long(F.concat(F.lit("fs#"), F.col("token"))) % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("sign")
    )
    return (
        toks.select("doc_id", bucket, sign)
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("value"))
    )


def heaps_curve(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heaps'-law vocabulary growth at power-of-two corpus prefixes:
    ``[k, n_docs, tokens_cum, vocab_cum]`` — for each observed level
    ``k``, the token total and distinct-vocabulary size of the prefix
    ``doc_id < 2^k`` (documents in id order).

    The sub-linearity of ``vocab_cum`` vs ``tokens_cum`` (V ≈ K·Tᵝ,
    β ≈ 0.5) is the standard sanity check that a corpus is natural
    text and not template spam (templates flatline V; random noise
    pushes β → 1).  Sort-free: a token's prefix membership is decided
    by its FIRST-SEEN doc id (one min aggregation), prefixes become
    ``length(bin(·))`` levels (the engine-stable integer log2), and
    the ≤64-row level histograms cumulate through a tiny range
    self-join — no window, no global sort, no per-prefix rescan.
    """
    lvl_doc = F.length(F.bin(F.col("doc_id") + 1)).cast("long")
    per_doc = docs.select(
        lvl_doc.alias("lvl"), F.size(tokens(text_col)).cast("long").alias("nt")
    )
    dh = per_doc.groupBy("lvl").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("nt").cast("long").alias("toks"),
    )
    first = (
        docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("_fd"))
        .select(F.length(F.bin(F.col("_fd") + 1)).cast("long").alias("lvl"))
        .groupBy("lvl")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    levels = dh.select("lvl").distinct()
    cum = (
        levels.alias("l")
        .join(dh.alias("d"), F.col("d.lvl") <= F.col("l.lvl"))
        .groupBy(F.col("l.lvl").alias("k"))
        .agg(
            F.sum("d.docs").cast("long").alias("n_docs"),
            F.sum("d.toks").cast("long").alias("tokens_cum"),
        )
    )
    vcum = (
        levels.alias("l")
        .join(first.alias("v"), F.col("v.lvl") <= F.col("l.lvl"))
        .groupBy(F.col("l.lvl").alias("k"))
        .agg(F.sum("v.vocab").cast("long").alias("vocab_cum"))
    )
    return cum.join(vcum, on="k")
