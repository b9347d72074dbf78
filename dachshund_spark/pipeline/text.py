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
