"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

- exact: hash-groupBy on the full text (one shuffle on the text hash)
- MinHash + LSH: shingle → K minhashes → band → bucket join (near-dup
  candidates only meet inside a band bucket — no all-pairs blowup)
- SimHash: 64-bit sign-of-weighted-bit-sums; near-dups share the full
  hash or a band of it
- n-gram Jaccard: verification joint for candidate pairs
- embedding cosine: near-dup via vector similarity (see similarity.py)

All hashes are md5-hex→bigint (`md5_long`) so DuckDB oracles reproduce
them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dachshund_spark.pipeline.text import md5_long, tokens


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: [text_hash, keeper_doc_id, n_copies].

    Keeper = smallest doc_id (deterministic survivor policy)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs with duplicates removed (keeps smallest doc_id per text)."""
    keepers = exact_duplicates(docs, text_col).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


def _token_hashes(docs: DataFrame, text_col: str, k: int, seed_col: str = "k") -> DataFrame:
    """Exploded (doc_id, k, token_hash) — one row per (token, permutation)."""
    perms = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias(seed_col)
    toks = F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    return (
        docs.select("doc_id", toks)
        .select("doc_id", "tok", perms)
        .withColumn("h", md5_long(F.concat_ws("#", F.col("tok"), F.col(seed_col))))
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_perm: int = 8
) -> DataFrame:
    """Per-doc minhash signature rows: [doc_id, k, minhash].

    Permutation k's hash of token t is md5_long(t + '#' + k); the
    signature is the per-k minimum over the doc's distinct tokens.
    Long-format output keeps the downstream band join a plain shuffle
    (no array explode at join time).
    """
    th = _token_hashes(docs, text_col, num_perm)
    return (
        th.groupBy(F.col("doc_id"), F.col("k").cast("long").alias("k"))
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: [doc_a, doc_b, n_shared_bands].

    rows_per_band = num_perm // bands; docs collide in a band when that
    band's minhash slice matches exactly. Pairs are generated per band
    bucket (self-join on the band hash — bucket sizes are tiny for
    non-duplicate corpora, so the join is skew-safe).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, text_col, num_perm)
    banded = (
        sig.withColumn("band", (F.col("k") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "k", "minhash"))))).alias("band_hash"))
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def near_dup_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
) -> DataFrame:
    """RECOMMENDED candidate generator for pairwise verification
    (feed the result to :func:`ngram_jaccard`): banded MinHash LSH
    pairs, [doc_a, doc_b].  Bucket-local joins only — never quadratic
    in any metadata group, unlike naive blocking on (length, lang)."""
    return minhash_lsh_candidates(docs, text_col, num_perm, bands).select(
        "doc_a", "doc_b"
    )


def minhash_similar_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    min_matches: int = 6,
) -> DataFrame:
    """Pairs whose signatures agree on ≥ min_matches of num_perm
    permutations: [doc_a, doc_b, n_matches] (estimated Jaccard =
    n_matches / num_perm)."""
    sig = minhash_signatures(docs, text_col, num_perm)
    a = sig.select(F.col("doc_id").alias("doc_a"), "k", "minhash")
    b = sig.select(F.col("doc_id").alias("doc_b"), "k", "minhash")
    return (
        a.join(b, ["k", "minhash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
    )


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    verify_min_matches: int | None = None,
) -> DataFrame:
    """End-to-end near-dup resolution: [doc_id, keeper_doc_id].

    Composes the stack into the operation a training pipeline actually
    runs: banded-LSH candidate pairs (optionally tightened to pairs
    whose signatures agree on ≥ ``verify_min_matches`` of ``num_perm``
    permutations, i.e. estimated Jaccard ≥ m/num_perm), then
    CONNECTED COMPONENTS over the pair graph — near-duplicate is not
    transitive, so survivor selection needs the transitive closure, and
    the closure of a pair graph is exactly CC (hash-min,
    :func:`~dachshund_spark.algorithms.components.connected_components`).
    Keeper = smallest doc_id of each cluster (the min-member component
    label, for free); docs with no near-dup edge keep themselves.

    Scale: pairs are bucket-local (never all-pairs), the CC runs on the
    pair graph only (dup clusters, not the corpus), and its round count
    is the dup-cluster diameter — tiny for real corpora.
    """
    if verify_min_matches is not None:
        pairs = minhash_similar_pairs(
            docs, text_col, num_perm, min_matches=verify_min_matches
        ).select("doc_a", "doc_b")
    else:
        pairs = near_dup_candidates(docs, text_col, num_perm, bands)
    from dachshund_spark.algorithms.components import connected_components
    from dachshund_spark.graph import LinkGraph

    g = LinkGraph(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    cc = connected_components(g, renumber=False)
    mapped = cc.select(
        F.col("node_id").alias("doc_id"),
        F.col("component").alias("keeper_doc_id"),
    )
    singles = (
        docs.select("doc_id")
        .join(mapped.select("doc_id"), "doc_id", "left_anti")
        .withColumn("keeper_doc_id", F.col("doc_id"))
    )
    return mapped.unionByName(singles)


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash: [doc_id, simhash].

    bit b of the fingerprint = sign of Σ_tokens (±1 depending on bit b
    of md5_long(token)); duplicate-ish docs land within small Hamming
    distance. Pure column algebra (explode + bit ops + two-level agg).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    contrib = toks.select(
        "doc_id",
        bit,
        "h",
    ).select(
        "doc_id",
        "bit",
        # shiftright/shiftleft need expression form to take a column shift
        F.when(F.expr("shiftright(h, CAST(bit AS INT)) & 1") == 1, 1)
        .otherwise(-1)
        .alias("c"),
    )
    sums = contrib.groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
    return sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
            ).otherwise(F.lit(0))
        ).alias("simhash")
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact token-n-gram Jaccard for candidate pairs
    [doc_a, doc_b] → [doc_a, doc_b, jaccard]."""
    gram_array = F.when(
        F.size(tokens(text_col)) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens(text_col)) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens(text_col), i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(gram_array).alias("gram")).distinct()
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        pairs.join(ga, "doc_a").join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def ngram_containment(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Asymmetric n-gram containment for candidate pairs:
    [doc_a, doc_b] → [doc_a, doc_b, n_inter, containment_a,
    containment_b], where containment_a = |A∩B| / |A| (the share of
    A's n-grams found in B).

    Containment is the dedup signal Jaccard misses: a short page fully
    quoted inside a long one has high containment_a but low Jaccard
    (Broder 1997 distinguishes resemblance from containment for
    exactly this case).  Both ratios are single divisions of exact
    integer counts — oracle-parity-safe.

    Same scale shape as :func:`ngram_jaccard`: candidate-pair-driven
    (never all-pairs), distinct grams per doc, one join per side.
    """
    gram_array = F.when(
        F.size(tokens(text_col)) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens(text_col)) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens(text_col), i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("doc_id", F.explode(gram_array).alias("gram")).distinct()
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        pairs.join(ga, "doc_a").join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("n_inter") / F.col("na")).alias("containment_a"),
            (F.col("n_inter") / F.col("nb")).alias("containment_b"),
        )
    )


def drop_common_segments(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
    max_doc_frac: float = 0.5,
    min_docs: int = 2,
    n_docs: int | None = None,
) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020 §3.1): split
    every document into segments (lines/paragraphs in production —
    ``sep`` parameterizes the boundary), count each distinct segment's
    document frequency across the WHOLE corpus, drop segments appearing
    in ≥ ``min_docs`` documents AND ≥ ``max_doc_frac`` of the corpus,
    and reassemble the surviving segments in original order:
    ``[doc_id, text, n_dropped]``.

    Scale shape: posexplode → distinct → one groupBy on the segment
    (document frequency; map-side combine, segment strings can be
    md5-bucketed if pathological), one broadcast-or-shuffle join back,
    one groupBy(doc_id) reassembly carrying (pos, segment) structs.
    Order restoration sorts each doc's surviving segments by position
    inside `array_sort` — per-row, no window.  Documents whose segments
    are all dropped survive with empty text (callers filter).
    """
    # the df threshold needs the corpus size; pass n_docs when it is
    # already known (catalog stats / a prior count) to skip this scan —
    # parquet COUNT(*) is metadata-only, but over 10^12 rows of object
    # storage even footer reads cost minutes
    if n_docs is None:
        n_docs = docs.count()
    import re as _re

    # F.split takes a REGEX — escape so sep is always a literal
    # boundary (a "|" or "." separator must not become a pattern)
    segs = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "pos", "seg"
        ),
    )
    df_counts = (
        segs.select("seg", "doc_id")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    common = F.col("_df") >= F.greatest(
        F.lit(int(min_docs)), F.lit(max_doc_frac) * F.lit(float(n_docs))
    )
    marked = segs.join(df_counts, on="seg").withColumn(
        "_drop", common
    )
    kept = (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"), F.struct("pos", "seg")
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                sep,
            ).alias("text"),
            F.sum(F.col("_drop").cast("long")).cast("long").alias("n_dropped"),
        )
    )
    return kept.select("doc_id", "text", "n_dropped")


def cdc_chunks(
    docs: DataFrame,
    *,
    window: int = 3,
    divisor: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (rsync/FastCDC idea at token level):
    ``[doc_id, chunk_idx, start_token, n_tokens, chunk_hash,
    n_dup_docs]``.

    A chunk boundary falls AFTER token i whenever the hash of the last
    ``window`` tokens ≡ 0 (mod ``divisor``) — boundaries move with the
    content, so inserting one token early in a document shifts only
    the chunk containing the edit, and every later chunk still hashes
    identically.  That is the shifted-duplicate case both fixed-stride
    windows (retrieval.chunk_windows) and whole-doc MinHash miss.
    ``n_dup_docs`` = distinct documents sharing the chunk, the
    cross-document boilerplate signal.

    Everything is array algebra inside codegen (filter / transform /
    slice over the token list — no UDF, no shuffle until the final
    dup-count join), and the md5 boundary rule replays exactly in the
    DuckDB oracle.  Expected chunk length = divisor tokens.
    """
    w, d = int(window), int(divisor)
    md5 = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
    win_hash = md5.format(x=f"concat_ws(' ', slice(l, i - {w} + 1, {w}))")
    base = docs.select(id_col, F.expr(f"split({text_col}, ' ')").alias("l"))
    staged = base.select(
        id_col,
        "l",
        F.expr(
            # Spark sequence(a, b) DESCENDS when a > b — the short-doc
            # guard is load-bearing, not cosmetic
            f"CASE WHEN size(l) >= {w} THEN "
            f"filter(sequence({w}, size(l)), i -> ({win_hash}) % {d} = 0) "
            "ELSE array() END"
        ).alias("pos"),
    ).select(
        id_col,
        "l",
        F.expr(
            "concat(array(0), pos, "
            "IF(size(pos) > 0 AND element_at(pos, -1) = size(l), "
            "array(), array(size(l))))"
        ).alias("b"),
    )
    chunk_hash = md5.format(x="concat_ws(' ', slice(l, ch.s + 1, ch.e - ch.s))")
    chunks = staged.select(
        id_col,
        "l",
        F.posexplode(
            F.expr("transform(sequence(0, size(b) - 2), j -> struct(b[j] AS s, b[j + 1] AS e))")
        ).alias("chunk_idx", "ch"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("ch.s").cast("long").alias("start_token"),
        (F.col("ch.e") - F.col("ch.s")).cast("long").alias("n_tokens"),
        F.expr(chunk_hash).alias("chunk_hash"),
    )
    dd = chunks.groupBy("chunk_hash").agg(
        F.countDistinct(id_col).cast("long").alias("n_dup_docs")
    )
    return chunks.join(dd, on="chunk_hash").select(
        id_col, "chunk_idx", "start_token", "n_tokens", "chunk_hash", "n_dup_docs"
    )


# ---------------------------------------------------------------------------
# exact duplicate spans (ExactSubstr) + winnowing fingerprints
# ---------------------------------------------------------------------------


def char_gram_hashes(
    docs: DataFrame, k: int = 32, text_col: str = "text"
) -> DataFrame:
    """Every k-char window of every doc, hashed: ``[doc_id, pos
    (1-based int), gram_hash, n_grams]``.  Docs shorter than ``k``
    emit nothing (ANSI: ``sequence(1, n)`` with n < 1 would throw).

    Scale shape: O(total corpus bytes) rows — the same blow-up
    ExactSubstr pays for its suffix array (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"), but
    embarrassingly parallel and shuffled exactly once downstream on
    ``gram_hash``.  For a cheap screen at 100 TB use
    :func:`winnow_fingerprints` (O(2·bytes/w) selected rows).
    """
    return (
        docs.where(F.length(text_col) >= k)
        .select(
            "doc_id",
            F.col(text_col).alias("_t"),
            (F.length(text_col) - F.lit(k) + 1).cast("int").alias("n_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("pos"),
            "_t",
        )
        .select(
            "doc_id",
            "n_grams",
            "pos",
            md5_long(F.expr(f"substring(_t, pos, {k})")).alias("gram_hash"),
        )
    )


def duplicate_spans(
    docs: DataFrame, k: int = 32, text_col: str = "text"
) -> DataFrame:
    """Exact duplicated k-char spans across documents:
    ``[gram_hash, n_docs, n_occurrences, min_doc_id]`` for every span
    appearing in >= 2 distinct docs — the ExactSubstr detection
    primitive (any duplicated substring of length >= k contains a
    duplicated k-gram, so this finds them all; the span boundaries are
    recoverable by merging adjacent positions per doc pair).

    One groupBy shuffle on gram_hash; count-distinct is two-phase
    (partial per partition).  No all-pairs join anywhere.
    """
    grams = char_gram_hashes(docs, k, text_col)
    return (
        grams.groupBy("gram_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 16, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    SIGMOD 2003 / MOSS): per window of ``w`` consecutive k-gram hashes
    keep the minimum (ties -> leftmost position), dedupe the selected
    set.  Guarantees any shared substring of length >= w + k - 1 is
    caught by at least one shared fingerprint, with ~2/(w+1) selection
    density — position-robust (content-based selection survives edits
    shifting alignment), unlike stride sampling.

    Returns ``[doc_id, pos, gram_hash]`` — the fingerprint set.

    Scale: the window min runs per-doc (partitionBy doc_id, rows
    frame) — a single doc's grams must fit one task, true for any
    bounded-size web document; selected output is ~2/(w+1) of the
    gram stream.  Docs with fewer than ``w`` grams (len < k + w - 1)
    have no full window and emit nothing.
    """
    from pyspark.sql import Window

    grams = char_gram_hashes(docs, k, text_col)
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("m", F.min(F.struct("gram_hash", "pos")).over(win))
        .where(F.col("pos") <= F.col("n_grams") - (w - 1))
        .select(
            "doc_id",
            F.col("m.pos").alias("pos"),
            F.col("m.gram_hash").alias("gram_hash"),
        )
        .distinct()
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    k: int = 16,
    w: int = 4,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """MOSS-style near-dup candidates from shared winnowing
    fingerprints: ``[doc_a, doc_b, shared_fp, n_fp_a, n_fp_b,
    est_jaccard]`` for every doc pair sharing >= 1 fingerprint.

    Pairs are generated per fingerprint bucket (join on gram_hash) —
    never an all-pairs product.  A fingerprint present in B docs emits
    C(B, 2) pairs; ``max_bucket`` drops buckets larger than that (a
    16-char boilerplate string shared by 10^6 pages is navigation
    chrome, not duplication signal — same hub-cap rationale as
    ``minhash_lsh_candidates``).  ``est_jaccard`` is a single IEEE
    division of exact integers (shared / (n_a + n_b - shared)).
    """
    fp = winnow_fingerprints(docs, k, w, text_col)
    d = fp.select("gram_hash", "doc_id").distinct()
    if max_bucket is not None:
        sizes = d.groupBy("gram_hash").agg(F.count(F.lit(1)).alias("_b"))
        d = d.join(
            sizes.where(F.col("_b") <= max_bucket).select("gram_hash"),
            on="gram_hash",
            how="left_semi",
        )
    counts = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = (
        d.alias("a")
        .join(d.alias("b"), on="gram_hash")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fp"))
    )
    return (
        pairs.join(
            counts.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a")),
            on="doc_a",
        )
        .join(
            counts.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b")),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("shared_fp")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("shared_fp"))
            ).alias("est_jaccard"),
        )
    )


def ngram_novelty(
    docs: DataFrame, k: int = 32, text_col: str = "text"
) -> DataFrame:
    """Per-doc novelty: ``[doc_id, n_grams, novel, novelty]`` where
    ``novel`` counts the doc's k-char windows whose hash appears in no
    OTHER document (within-doc repeats still count as novel), and
    ``novelty = novel / n_grams`` is the single closing IEEE division.

    The inverse of duplication coverage: a boilerplate-heavy page
    scores near 0, fresh prose near 1 — the per-doc roll-up of
    :func:`duplicate_spans` (same gram stream, same one-shuffle
    shape).  Docs shorter than ``k`` emit nothing.
    """
    grams = char_gram_hashes(docs, k, text_col)
    cross = grams.groupBy("gram_hash").agg(
        F.countDistinct("doc_id").alias("_nd")
    )
    return (
        grams.join(cross, on="gram_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_nd") == 1, 1).otherwise(0))
            .cast("long")
            .alias("novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "novel",
            (F.col("novel") / F.col("n_grams")).alias("novelty"),
        )
    )


def duplicate_intervals(
    docs: DataFrame, k: int = 32, text_col: str = "text"
) -> DataFrame:
    """Maximal duplicated character intervals per doc: ``[doc_id,
    start_pos, end_pos, span_len]`` (1-based inclusive) — the
    *removal* step of ExactSubstr dedup (Lee et al. 2022 drop the
    duplicated bytes, not the whole doc).

    A position is duplicated iff its k-gram occurs in >= 2 distinct
    docs; overlapping/adjacent duplicated windows merge by classic
    SQL interval merging: a window starts a new island iff its start
    exceeds the running max end + 1 (cumulative flag sum = island id).
    Window runs per doc (bounded partition), everything integer-exact.
    """
    from pyspark.sql import Window

    grams = char_gram_hashes(docs, k, text_col)
    dup = grams.join(
        grams.groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("gram_hash"),
        on="gram_hash",
        how="left_semi",
    ).select("doc_id", "pos", (F.col("pos") + (k - 1)).alias("w_end"))
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new",
        F.when(
            F.col("pos") > F.coalesce(F.max("w_end").over(w_prev), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("_new").over(w_run))
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start_pos"),
        F.max("w_end").alias("end_pos"),
        (F.max("w_end") - F.min("pos") + 1).alias("span_len"),
    ).select("doc_id", "start_pos", "end_pos", "span_len")


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int | None = None,
) -> DataFrame:
    """Text near-duplicate candidates via Hamming-band LSH over the
    SimHash fingerprint: [doc_a, doc_b, n_shared_bands, hamming].

    Completes the SimHash path (:func:`simhash` produces signatures;
    this buckets them): the ``bits``-bit fingerprint splits into
    ``bands`` equal slices; two docs are candidates iff at least one
    slice matches exactly — the pigeonhole guarantee is that any pair
    within Hamming distance < ``bands`` MUST share a band, so the
    banded join is a lossless prefilter for d <= bands-1 (and a
    recall/cost dial beyond).  Pairs are generated per band bucket,
    never all-pairs; the exact Hamming distance (bit_count of XOR) is
    computed only on candidates.  Same shape as the image stack's
    :func:`~dachshund_spark.pipeline.multimodal.phash_near_dups`.
    """
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sig = simhash(docs, text_col=text_col, bits=bits)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, CAST({band_bits} * band AS INT))")
        .bitwiseAND(F.lit(mask)),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"),
        "band", "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"),
        "band", "band_val",
    )
    pairs = (
        a.join(b, ["band", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sa", "sb")
        .agg(F.count("*").alias("n_shared_bands"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            F.bit_count(F.expr("sa ^ sb")).cast("int").alias("hamming"),
        )
    )
    if max_hamming is not None:
        pairs = pairs.where(F.col("hamming") <= max_hamming)
    return pairs


def name_neardup_pairs(
    df: DataFrame,
    name_col: str,
    *,
    max_dist: int = 6,
    topk: int = 20,
) -> DataFrame:
    """Levenshtein near-duplicate pairs over a DISTINCT name column:
    [name_a, name_b, dist] — top-k by (dist, name_a, name_b).

    Candidate pairs are blocked on the last whitespace token (the
    head-noun for catalog-style names), so the self-join is keyed and
    never all-pairs; the distinct-name table is vocabulary-bounded (it
    grows with the name vocabulary, not the row count), which is what
    makes exact edit distance affordable at 100 TB — dedup then joins
    the (name → canonical) verdicts back to the full table by equality.
    Edit distance is exact and identical in Spark and DuckDB.
    """
    names = (
        df.select(F.col(name_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .select("name", F.regexp_extract("name", "[^ ]+$", 0).alias("_blk"))
    )
    a = names.select(F.col("name").alias("name_a"), "_blk")
    b = names.select(F.col("name").alias("name_b"), "_blk")
    pairs = (
        a.join(b, on="_blk")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
    return pairs.orderBy("dist", "name_a", "name_b").limit(int(topk))


def host_overlap_census(
    docs: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "text",
    df_cap: int = 32,
) -> DataFrame:
    """Mirror-site census (Bharat & Broder, WWW 1999 shape): for every
    host pair sharing content, the exact overlap —
    ``[host_a, host_b, n_shared, n_a, n_b, jaccard]``.

    Inverted-index self-join on the per-host DISTINCT content
    fingerprint (md5 of the text): a fingerprint on k hosts emits
    C(k,2) pairs, so fingerprints on more than ``df_cap`` hosts are
    dropped first (site-furniture/boilerplate content, the same df
    prefix filter :func:`~dachshund_spark.pipeline.retrieval.\
    doc_similarity_topk` uses) — the fan-out is bounded by
    construction, never all-pairs.  ``jaccard`` = n_shared /
    (n_a + n_b − n_shared) is one IEEE division of exact BIGINTs.
    """
    # fp is scanned 4× (sizes, df filter, both join sides); it is a
    # 2-column projection so the re-reads are cheap column scans —
    # callers looping over it should .persist() themselves (this
    # function holds no cache so it cannot leak blocks, ADVICE r4)
    fp = docs.select(
        F.col(host_col).alias("host"), F.md5(text_col).alias("_h")
    ).distinct()
    sizes = fp.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    shared = fp.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    ok = shared.where((F.col("_df") >= 2) & (F.col("_df") <= int(df_cap)))
    fpo = fp.join(ok.select("_h"), on="_h", how="left_semi")
    a = fpo.select("_h", F.col("host").alias("host_a"))
    b = fpo.select("_h", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, on="_h")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"), F.col("_n").alias("n_a")),
            on="host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("_n").alias("n_b")),
            on="host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("host_a", "host_b")
    )
    return out


def jaccard_join_prefix(
    docs: DataFrame,
    *,
    tau_num: int = 7,
    tau_den: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (PPJoin
    family — Chaudhuri et al. 2006, Xiao et al. 2008): all pairs with
    token-set Jaccard ≥ τ = tau_num/tau_den, as ``[a, b, inter,
    size_a, size_b]`` (a < b).

    The candidate generator indexes only each document's PREFIX under
    the global (df, token) rarity order — the first
    ``|A| − ⌈τ·|A|⌉ + 1`` tokens — because two sets meeting the
    threshold MUST share a prefix token (the pigeonhole bound that
    makes the join exact with no full inverted index).  A length
    filter (``tau_den·min ≥ tau_num·max``) prunes further before the
    exact intersection count verifies each survivor; the final
    predicate is the cross-multiplied integer test
    ``tau_den·inter ≥ tau_num·(size_a + size_b − inter)`` — no
    floats anywhere.

    Scale shape: prefix posting lists are df-ordered so the rarest
    tokens carry the candidates (common tokens fall outside every
    prefix); cost ~ Σ_token prefix_df² concentrated on rare tokens,
    the designed behavior — versus Σ df² for the naive index.
    """
    from pyspark.sql import Window

    toks = (
        docs.select("doc_id", F.explode(tokens(text_col)).alias("token"))
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    dfs = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("token"))
    ranked = (
        toks.join(dfs, on="token")
        .withColumn("_rn", F.row_number().over(w))
        .join(sizes, on="doc_id")
    )
    # prefix length |A| − ceil(τ|A|) + 1 with ceil as integer div
    plen = (
        F.col("sz")
        - F.expr(f"({tau_num} * sz + {tau_den} - 1) DIV {tau_den}")
        + 1
    )
    prefix = ranked.where(F.col("_rn") <= plen).select(
        "token", "doc_id", "sz"
    )
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            on=[
                F.col("x.token") == F.col("y.token"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .where(
            (
                F.lit(int(tau_den))
                * F.least(F.col("x.sz"), F.col("y.sz"))
            )
            >= F.lit(int(tau_num)) * F.greatest(F.col("x.sz"), F.col("y.sz"))
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sz").alias("size_a"),
            F.col("y.sz").alias("size_b"),
        )
        .distinct()
    )
    inter = (
        cand.join(toks.select(F.col("doc_id").alias("a"), "token"), on="a")
        .join(
            toks.select(F.col("doc_id").alias("b"), F.col("token")),
            on=["b", "token"],
        )
        .groupBy("a", "b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return inter.where(
        F.lit(int(tau_den)) * F.col("inter")
        >= F.lit(int(tau_num))
        * (F.col("size_a") + F.col("size_b") - F.col("inter"))
    ).select("a", "b", "inter", "size_a", "size_b")
