"""Benchmark decontamination, cross-document exact-substring duplication,
deterministic stratified sampling, and PII scrubbing.

These are the curation passes a training-data pipeline runs between crawl
and tokenizer: drop documents that leak evaluation benchmarks (n-gram
overlap, the GPT-3/PaLM decontamination recipe), measure how much of each
document is verbatim-shared with the rest of the corpus (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
exact-substring signal that MinHash misses), down/up-sample strata to hit
a target data mix, and redact emails/IPs/phone numbers.

All hot paths are built-in column expressions (JVM codegen); hashes are
md5-hex→bigint so DuckDB oracles reproduce them bit-for-bit.  Nothing
here is quadratic in the corpus: decontamination is a broadcast of the
(small) benchmark gram set against exploded corpus grams; duplication is
one df-aggregate plus one join back; sampling and scrubbing are pure
map-side expressions (zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens


def _position_ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined n-grams, one per starting position."""
    toks = tokens(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.slice(toks, 1, F.size(toks) - (n - 1)),
            lambda _x, i: F.concat_ws(
                " ", F.slice(toks, i + 1, n)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(
    bench_docs: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams of a (small) benchmark/eval corpus: ``[gram]``.

    This is the reference set decontamination checks against; it is
    expected to be broadcast-sized (eval suites are thousands of
    documents, not billions).
    """
    return bench_docs.select(
        F.explode(_position_ngrams(text_col, n)).alias("gram")
    ).distinct()


def decontaminate(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents sharing any n-gram with a benchmark set:
    ``[doc_id, n_grams, n_overlap, contaminated]``.

    ``n_grams`` counts the document's DISTINCT n-grams; ``n_overlap``
    counts how many of those appear in ``bench_grams``.  The join is a
    broadcast hash join (benchmark side is small by construction), so
    the corpus is touched exactly once, map-side — no corpus shuffle
    beyond the per-doc partial aggregate.
    """
    grams = docs.select(
        "doc_id", F.explode(_position_ngrams(text_col, n)).alias("gram")
    ).distinct()
    hit = F.broadcast(bench_grams.select("gram").distinct()).withColumn(
        "_hit", F.lit(1)
    )
    joined = grams.join(hit, on="gram", how="left")
    out = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"),
    )
    # docs shorter than n tokens have zero grams and cannot be contaminated
    return (
        docs.select("doc_id")
        .join(out, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0).cast("long")) > 0).alias(
                "contaminated"
            ),
        )
    )


def duplicate_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per-document exact-substring duplication signal:
    ``[doc_id, n_positions, n_dup_positions, dup_frac]``.

    A position is "duplicated" when its n-gram occurs in at least
    ``min_docs`` DISTINCT documents (the doc itself included) — the
    cross-document verbatim-overlap measure of Lee et al. 2022 §4,
    which catches licence boilerplate and templated pages that
    whole-document MinHash misses.

    Shape: explode positions → df-aggregate per gram (two-level,
    map-side combinable) → filter to shared grams (the small side) →
    join back → per-doc aggregate.  Never pairwise in the corpus.
    """
    pos = docs.select(
        "doc_id", F.explode(_position_ngrams(text_col, n)).alias("gram")
    )
    df_per_gram = (
        pos.groupBy("gram", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= F.lit(int(min_docs)))
        .select("gram")
        .withColumn("_shared", F.lit(1))
    )
    marked = pos.join(df_per_gram, on="gram", how="left")
    out = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_positions"),
        F.sum(F.coalesce(F.col("_shared"), F.lit(0)))
        .cast("long")
        .alias("n_dup_positions"),
    )
    return (
        docs.select("doc_id")
        .join(out, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_positions", F.lit(0).cast("long")).alias("n_positions"),
            F.coalesce("n_dup_positions", F.lit(0).cast("long")).alias(
                "n_dup_positions"
            ),
            F.when(
                F.col("n_positions") > 0,
                F.col("n_dup_positions") / F.col("n_positions"),
            ).alias("dup_frac"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic hash-threshold sampling to hit a target data mix:
    keep a row iff ``md5(key '#' seed) mod 1e6 < rate(stratum) * 1e6``.

    This is the "data mixing" pass (C4/Gopher/LLaMA-style corpus
    weighting): rates are per-stratum keep probabilities.  Pure map-side
    column algebra — zero shuffles, reproducible across runs/engines
    (the hash is md5, not a partition-dependent RNG), and stable under
    repartitioning, which per-partition ``rand(seed)`` is not.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.col(key_col).cast("string"), F.lit(str(seed)))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(
            rate
        )
    thresh = (rate * F.lit(1_000_000.0)).cast("long")
    return docs.where((h % F.lit(1_000_000)) < thresh)


# Patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b word boundaries —
# no backrefs or lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3,4}-\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone numbers:
    ``[<id_col>, text (scrubbed), n_email, n_ip, n_phone]``.

    Counts are taken before replacement; patterns apply in the listed
    order (an email's host part is consumed by <EMAIL> before the IP
    pass can see it).  Pure map-side regexp work — zero shuffles.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(id_col, *counts, scrubbed.alias("text"))


def bloom_bits(
    grams: DataFrame, *, m: int = 4096, k: int = 3, seed: int = 0
) -> DataFrame:
    """Distinct set-bit positions ``[pos]`` of a Bloom filter over a
    ``[gram]`` table: bit j of gram g lives at md5('<seed>#bf#g#j') % m.
    Deterministic (md5), so any engine rebuilds the identical filter."""
    from .text import md5_long

    return (
        grams.select(
            "gram", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
        )
        .select(
            F.pmod(
                md5_long(
                    F.concat_ws(
                        "#", F.lit(seed), F.lit("bf"), F.col("gram"), F.col("j")
                    )
                ),
                F.lit(m),
            ).alias("pos")
        )
        .distinct()
    )


def bloom_decontaminate(
    corpus: DataFrame,
    bench_grams: DataFrame,
    *,
    n: int = 3,
    m: int = 4096,
    k: int = 3,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-prefiltered decontamination:
    ``[doc_id, n_grams, n_bloom_hits, n_exact_hits, n_false_pos]``.

    The scale path of :func:`decontaminate`: instead of joining every
    corpus gram against the benchmark gram table, the benchmark is
    compressed to an m-bit Bloom filter (k md5 hashes) that is
    broadcast-sized no matter how many grams it holds; a corpus gram is
    a CANDIDATE iff all k of its bits are set, and only candidates are
    worth the exact join.  This function reports both layers — bloom
    hits and exact hits — so the measured false-positive count
    (bloom − exact) pins the filter's advertised (1-e^{-kn/m})^k rate;
    a gram missed by the bloom but present exactly is impossible (no
    false negatives), which the tests assert.
    """
    from .text import md5_long

    bits = bloom_bits(bench_grams, m=m, k=k, seed=seed).persist()
    doc_grams = corpus.select(
        id_col,
        F.explode(F.array_distinct(_position_ngrams(text_col, n))).alias("gram"),
    )
    probed = (
        doc_grams.select(
            id_col, "gram", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
        )
        .select(
            id_col,
            "gram",
            F.pmod(
                md5_long(
                    F.concat_ws(
                        "#", F.lit(seed), F.lit("bf"), F.col("gram"), F.col("j")
                    )
                ),
                F.lit(m),
            ).alias("pos"),
        )
        .join(F.broadcast(bits), on="pos", how="left_semi")
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_set"))
        .where(F.col("_set") == k)
        .select(id_col, "gram")
    )
    exact = doc_grams.join(
        F.broadcast(bench_grams.select("gram").distinct()),
        on="gram",
        how="left_semi",
    )
    per_doc = doc_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    bl = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom_hits")
    )
    ex = exact.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_hits")
    )
    return (
        per_doc.join(bl, on=id_col, how="left")
        .join(ex, on=id_col, how="left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_bloom_hits", F.lit(0).cast("long")).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0).cast("long")).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0).cast("long"))
                - F.coalesce("n_exact_hits", F.lit(0).cast("long"))
            ).alias("n_false_pos"),
        )
    )


def split_leakage_census(
    shingles: DataFrame,
    *,
    doc_col: str = "doc_id",
    host_col: str = "host",
    gram_col: str = "gram",
    test_bucket: int = 9,
    n_buckets: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Leakage audit for a host-hash train/test split — ONE row:
    ``[n_test_docs, n_contaminated, n_shared_grams]``.

    Splitting by document hash leaks near-duplicates across the
    boundary (mirror pages, boilerplate); the standard defence is to
    split by HOST so a site lands wholly in one side.  This op
    measures what still leaks THROUGH that split: shingles present in
    both the train side and the test side (cross-host duplication),
    and how many test documents carry at least one such shingle.
    Split assignment is the deterministic ``md5("spl{seed}#"+host) %
    n_buckets`` (bucket ``test_bucket`` = test, rest = train).  Scale
    shape: one distinct per side plus one inverted-index semi-join on
    the shingle hash — never doc×doc.
    """
    from dachshund_spark.pipeline.text import md5_long

    split = (
        md5_long(F.concat(F.lit(f"spl{seed}#"), F.col(host_col)))
        % F.lit(int(n_buckets))
    )
    tagged = shingles.select(
        F.col(doc_col).alias("_doc"),
        F.md5(F.col(gram_col)).alias("_g"),
        (split == int(test_bucket)).alias("_is_test"),
    )
    train_g = tagged.where(~F.col("_is_test")).select("_g").distinct()
    test = tagged.where(F.col("_is_test"))
    test_docs = test.select("_doc").distinct()
    shared = test.join(train_g, on="_g", how="left_semi")
    contaminated = shared.select("_doc").distinct()
    shared_grams = shared.select("_g").distinct()
    return (
        test_docs.agg(F.count(F.lit(1)).cast("long").alias("n_test_docs"))
        .join(
            F.broadcast(
                contaminated.agg(
                    F.count(F.lit(1)).cast("long").alias("n_contaminated")
                )
            )
        )
        .join(
            F.broadcast(
                shared_grams.agg(
                    F.count(F.lit(1)).cast("long").alias("n_shared_grams")
                )
            )
        )
    )
