"""Corpus curation: the composite filter a training pipeline ships.

One operator = quality gate (Gopher/C4-style heuristics) ∧ language
allow-list ∧ near-dup survivor selection, in that order: dedup runs
WITHIN the quality+language-passed subset so every cluster keeper is
itself a passed document (deduping first would let a filtered-out doc
"absorb" survivors).  All three stages are existing oracled operators
(:mod:`~dachshund_spark.pipeline.text`,
:func:`~dachshund_spark.pipeline.dedup.dedup_clusters`); this module
only composes them — one Spark job, three shuffles (quality and
language are shuffle-free column algebra; the dedup stage pays the
signature agg + band join + CC closure).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from dachshund_spark.pipeline.dedup import dedup_clusters
from dachshund_spark.pipeline.text import language_id, quality_scores


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    allowed_langs: Sequence[str] = ("en",),
    num_perm: int = 8,
    verify_min_matches: int = 6,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Surviving documents after the full curation funnel:
    [doc_id, detected_lang, n_tokens].

    A doc survives iff it (1) passes the quality gate, (2) is detected
    as one of ``allowed_langs``, and (3) is the min-doc_id keeper of
    its near-dup cluster among the docs that passed (1) and (2).
    """
    q = (
        quality_scores(
            docs, text_col, min_tokens=min_tokens, max_tokens=max_tokens
        )
        .where("passes_quality")
        .select("doc_id", "n_tokens")
    )
    lang = language_id(docs, text_col).where(
        F.col("detected_lang").isin(*allowed_langs)
    )
    passed = (
        docs.select("doc_id", text_col)
        .join(q, "doc_id")
        .join(lang, "doc_id")
    )
    keepers = dedup_clusters(
        passed.select("doc_id", text_col),
        text_col,
        num_perm=num_perm,
        verify_min_matches=verify_min_matches,
    ).where(F.col("doc_id") == F.col("keeper_doc_id"))
    return passed.join(
        keepers.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", "detected_lang", "n_tokens")


def classify_urls(
    docs: DataFrame,
    url_col: str = "url",
    blocked_hosts: Sequence[str] = (),
    blocked_patterns: Sequence[str] = (),
    allowed_schemes: Sequence[str] = ("http", "https"),
) -> DataFrame:
    """URL-level curation verdicts: ``[*, url_host, url_verdict]`` with
    verdict ∈ {ok, bad_scheme, blocked_host, blocked_pattern}.

    The first gate of every crawl-derived corpus (C4 §2.2, RefinedWeb
    §3.1 run URL blocklists before touching page bytes): scheme
    allow-list, host suffix blocklist (``"ads.example.com"`` blocks the
    host and its subdomains), then regex pattern blocklist over the full
    url.  Pure column algebra — the verdict costs no shuffle and
    predicate-pushes into the scan when used as a filter.  First match
    wins in the order above (scheme > host > pattern), so verdict
    counts are stable under blocklist reordering.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    host_blocked = F.lit(False)
    for h in blocked_hosts:
        hl = h.lower()
        host_blocked = host_blocked | (host == F.lit(hl)) | host.endswith(
            F.lit("." + hl)
        )
    pattern_blocked = F.lit(False)
    for p in blocked_patterns:
        pattern_blocked = pattern_blocked | url.rlike(p)
    verdict = (
        F.when(~scheme.isin(*[s.lower() for s in allowed_schemes]), "bad_scheme")
        .when(host_blocked, "blocked_host")
        .when(pattern_blocked, "blocked_pattern")
        .otherwise("ok")
    )
    return docs.select(
        "*", host.alias("url_host"), verdict.alias("url_verdict")
    )


def frontier_priority(
    host_ranks: DataFrame, doc_hosts: DataFrame
) -> DataFrame:
    """Crawl-frontier prioritization: authority × content quality.

    ``host_ranks``: ``[host, pagerank]`` (host-level PageRank, already
    rounded/published); ``doc_hosts``: ``[doc_id, host,
    passes_quality]`` (per-document quality verdicts mapped to their
    hosts).  Returns ``[host, pagerank, n_docs, n_quality_docs,
    priority]`` where ``priority = round(pagerank · quality_frac, 8)``
    — the score a crawl scheduler sorts its frontier by: high-authority
    hosts whose content keeps passing the quality gates get fetched
    first, spam-heavy hosts sink even when well-linked.

    One groupBy(host) over the documents plus one small join — the
    host-rank side is tiny relative to the corpus (hosts ≪ docs), so
    the planner broadcasts it; hosts with no crawled documents yet get
    priority 0 (explore via a separate discovery quota, not this
    score).
    """
    hq = doc_hosts.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("passes_quality").cast("int"))
        .cast("long")
        .alias("n_quality_docs"),
    )
    out = host_ranks.join(hq, on="host", how="left")
    return out.select(
        "host",
        "pagerank",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
        F.coalesce("n_quality_docs", F.lit(0).cast("long")).alias(
            "n_quality_docs"
        ),
        F.when(
            F.coalesce("n_docs", F.lit(0)) > 0,
            F.round(
                F.col("pagerank")
                * (F.col("n_quality_docs") / F.col("n_docs")),
                8,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("priority"),
    )


def canonicalize_urls(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization: ``[*, canonical_url, url_host]``.

    The normalization every crawl dedup runs before comparing URLs
    (RFC 3986 §6 syntax-based normalization plus the tracking-param
    scrub every production crawler adds):

    - drop the fragment (``#...``)
    - lowercase scheme and host (path/query case is preserved)
    - strip default ports (``:80`` for http, ``:443`` for https)
    - drop ``utm_*`` tracking query parameters (other params keep
      their original order)
    - empty path → ``/``

    URLs with no parseable ``scheme://`` pass through unchanged (the
    blocklist gate in :func:`classify_urls` is where they get
    rejected).  Pure column algebra — regexp extracts plus an array
    filter over the split query string; no shuffle, reproducible
    verbatim in the DuckDB oracle.
    """
    url = F.col(url_col)
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    )
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    hp = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (~p.startswith("utm_")),
    )
    newq = F.array_join(params, "&")
    path2 = F.when(path == "", F.lit("/")).otherwise(path)
    canonical = F.concat(
        scheme,
        F.lit("://"),
        hp,
        path2,
        F.when(newq != "", F.concat(F.lit("?"), newq)).otherwise(F.lit("")),
    )
    host = F.regexp_replace(hp, r":[0-9]+$", "")
    return docs.select(
        "*",
        F.when(scheme != "", canonical).otherwise(url).alias("canonical_url"),
        F.when(scheme != "", host).otherwise(F.lit("")).alias("url_host"),
    )


def canonical_url_groups(
    urls: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Canonical-URL dedup groups: ``[canonical_url, keeper_doc_id,
    n_copies]`` — the URL-level twin of
    :func:`dachshund_spark.pipeline.dedup.exact_duplicates` (one
    shuffle on the canonical string; keeper = min id, the same
    stable-keeper convention as the text dedup stack)."""
    c = canonicalize_urls(urls, url_col)
    return c.groupBy("canonical_url").agg(
        F.min(id_col).alias("keeper_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """robots.txt-style crawl permission: ``[*, robots_allowed]``.

    ``rules`` is ``[host, rule_path, allow]`` — the parsed
    Allow/Disallow lines of each host's robots.txt (prefix rules only;
    the ``*``/``$`` wildcard extension would swap startswith for rlike).
    Standard longest-match-wins semantics (RFC 9309 §2.2.2), Allow
    winning length ties, no matching rule → allowed.

    Plan: one broadcast join on host (a robots table is tiny next to a
    crawl frontier), prefix filter, then a single max_by over
    (rule length, allow) per URL — no window sort, no second shuffle.
    """
    url = F.col(url_col)
    host = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    base = urls.select("*", host.alias("_host"), path.alias("_path"))
    r = rules.select(
        F.lower(F.col("host")).alias("_host"),
        F.col("rule_path").alias("_rule"),
        F.col("allow").cast("boolean").alias("_allow"),
    )
    matched = (
        base.join(F.broadcast(r), on="_host", how="left")
        .where(F.col("_rule").isNull() | F.col("_path").startswith(F.col("_rule")))
        .groupBy(*urls.columns)
        .agg(
            # integer sort key 2·len(rule)+allow: longest rule wins,
            # Allow beats Disallow on equal length (same key ⇒ same
            # verdict, so the max_by pick is deterministic)
            F.max_by(
                "_allow",
                F.length("_rule") * 2 + F.col("_allow").cast("int"),
            ).alias("_verdict")
        )
    )
    # URLs whose every rule failed the prefix test drop out of the
    # join+filter entirely; restore them as allowed
    missing = urls.join(
        matched.select(*urls.columns), on=urls.columns, how="left_anti"
    ).withColumn("_verdict", F.lit(None).cast("boolean"))
    return matched.unionByName(missing).select(
        *urls.columns,
        F.coalesce("_verdict", F.lit(True)).alias("robots_allowed"),
    )


def hash_stratified_sample(
    docs: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Deterministic hash-threshold stratified sampling: keep a row iff
    ``md5(seed#id) % 10^6 < floor(frac[stratum] * 10^6)``.

    Unlike ``DataFrame.sample`` this is reproducible across engines,
    partitionings, and reruns (the keep decision is a pure function of
    the id), and the per-stratum rates are exact in expectation with
    no coordination — the standard trick for rebalancing language /
    source mix in a web corpus.  Thresholds are integerized in the
    driver so the engine compares exact integers, never floats.
    Strata absent from ``fractions`` fall back to ``default``.
    """
    from dachshund_spark.pipeline.text import md5_long

    expr = F.lit(int(default * 1_000_000))
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * 1_000_000))
        ).otherwise(expr)
    h = md5_long(
        F.concat(
            F.lit(f"{seed}#samp#"), F.col(id_col).cast("string")
        )
    )
    return docs.where((h % 1_000_000) < expr)


def mixture_weights(
    docs: DataFrame,
    by: str = "source",
    mass_col: str = "n_chars",
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-flattened sampling weights per corpus source —
    the alpha-sampling mixture used by multilingual pretraining
    (XLM-R / mT5 style): ``w_s ∝ mass_s^temperature``.

    Returns ``[<by>, mass, weight]``.  ``temperature=0.5`` is computed
    with ``sqrt`` (IEEE correctly-rounded, so bit-identical in every
    engine); each source's term is integerized at 1e8 before the
    global sum, so the normalizer is an exact BIGINT and each weight
    is a single double division — fully oracle-replayable.  Other
    temperatures go through ``pow`` (libm, 1-ulp engine-dependent) and
    are NOT oracle-safe; they remain available for production use.

    One groupBy over the corpus, then a broadcast of the tiny
    per-source table — no scale concerns at any corpus size.
    """
    mass = docs.groupBy(by).agg(F.sum(mass_col).cast("long").alias("mass"))
    if temperature == 0.5:
        term = F.sqrt(F.col("mass").cast("double"))
    else:
        term = F.pow(F.col("mass").cast("double"), F.lit(float(temperature)))
    t = mass.withColumn(
        "tw", F.floor(term * F.lit(100000000.0)).cast("long")
    )
    tot = t.agg(F.sum("tw").alias("tot"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            by,
            "mass",
            (F.col("tw").cast("double") / F.col("tot").cast("double")).alias("weight"),
        )
    )


def largest_remainder_allocation(
    weights: DataFrame,
    *,
    total: int,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of ``total`` integer
    slots proportional to ``weight_col``: ``[key, weight, alloc]`` with
    Σ alloc == total exactly.

    The integer-exact budget splitter behind crawl scheduling (fetch
    slots per host) and mixture sampling (documents per source bucket):
    ``alloc = (total·w) div W`` plus one extra slot for the L largest
    remainders (L = total − Σ base, ties → smaller key).

    Scale notes: the two scalars (ΣW, Σbase) are single-row aggregates;
    the +1 winners come from a distributed top-L
    (TakeOrderedAndProject), which holds an O(L) heap per task — fine
    while L ≪ slots-per-partition budget; a threshold-select variant
    would replace it if L ever rivals the key count.  Products stay in
    BIGINT: callers keep ``total·max(w)`` under 2^63 (rescale weights
    first otherwise — allocation is scale-invariant).
    """
    w = weights.select(
        F.col(key_col).alias("key"), F.col(weight_col).cast("long").alias("weight")
    )
    grand = w.agg(F.sum("weight")).first()[0]
    if not grand:
        raise ValueError("total weight must be positive")
    base = w.select(
        "key",
        "weight",
        F.expr(f"({int(total)} * weight) DIV {int(grand)}").alias("_base"),
        F.expr(f"({int(total)} * weight) % {int(grand)}").alias("_rem"),
    ).persist()
    leftover = int(total) - int(base.agg(F.sum("_base")).first()[0])
    plus = (
        base.orderBy(F.desc("_rem"), F.asc("key"))
        .limit(leftover)
        .select("key", F.lit(1).alias("_plus"))
    )
    return (
        base.join(plus, on="key", how="left")
        .select(
            "key",
            "weight",
            (F.col("_base") + F.coalesce("_plus", F.lit(0))).alias("alloc"),
        )
    )


def politeness_schedule(
    urls: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay_s",
) -> DataFrame:
    """Per-host polite fetch schedule: one fetch every ``crawl_delay_s``
    seconds per host, hosts fetched independently in parallel — the
    frontier→fetcher assignment a crawler derives from robots.txt
    Crawl-delay (the longest-match rules themselves are
    ``robots_filter``; this is the scheduling step after them).

    Within a host, urls are ordered by a deterministic md5 priority
    (seeded tie-broken by url), so the schedule is reproducible across
    engines; ``fetch_offset_s = (rank-1) · crawl_delay_s`` — exact
    integers end-to-end.

    Scale shape: one window partitioned BY HOST (never global — host
    cardinality is the parallelism unit, exactly how a real frontier
    shards), all arithmetic map-side after the per-host sort.
    """
    from dachshund_spark.pipeline.text import md5_long

    from pyspark.sql import Window

    pr = md5_long(F.col(url_col))
    w = Window.partitionBy(host_col).orderBy(pr.asc(), F.col(url_col).asc())
    return urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(delay_col).cast("long").alias("crawl_delay_s"),
        F.row_number().over(w).cast("long").alias("fetch_rank"),
    ).withColumn(
        "fetch_offset_s",
        ((F.col("fetch_rank") - 1) * F.col("crawl_delay_s")).cast("long"),
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted priority sample (Duffield et al. 2007):
    the ``k`` rows with the largest priority ``~ w/u`` —
    ``[<id_col>, <weight_col>, priority]``.

    The classic single-pass weighted-k sampler: priorities are
    row-local, so the top-k reduces per partition first (TakeOrdered —
    no global sort, no single-partition shuffle) and a 100 TB pass is
    embarrassingly parallel.  The uniform draw is the 40-bit md5 of
    ``"pri{seed}#" + id`` shifted into [1, 2^40]; the priority is the
    exact integer ``(w · 2^40) DIV h`` — reproducible across engines,
    partitionings, and reruns, no float division anywhere.  Integer
    weights must stay below 2^23 (ANSI overflow raises, never wraps);
    ties break on the id.
    """
    from dachshund_spark.pipeline.text import md5_long

    h = (
        md5_long(F.concat(F.lit(f"pri{seed}#"), F.col(id_col).cast("string")))
        % F.lit(1 << 40)
    ) + 1
    return (
        df.select(
            id_col,
            F.col(weight_col).cast("long").alias(weight_col),
            h.alias("_h"),
        )
        .withColumn(
            "priority",
            F.expr(
                f"CAST(({weight_col} * CAST(1099511627776 AS BIGINT)) "
                f"DIV _h AS BIGINT)"
            ),
        )
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(int(k))
        .drop("_h")
    )


def rendezvous_shards(
    df: DataFrame,
    n_shards: int = 8,
    *,
    id_col: str = "doc_id",
    removed: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing —
    ``[<id_col>, shard, shard_after]``: each key's winning shard over
    ``n_shards``, and its winner after shard ``removed`` disappears
    (``shard_after = shard`` when ``removed`` is None).

    HRW hashing (Thaler & Ravishankar 1998) is the coordination-free
    router consistent under membership change: a key moves iff its
    winner was the removed shard, so rebalancing touches exactly the
    failed shard's ~1/n of keys.  The argmax is an ``array_max`` over
    per-shard packed keys ``h40·n + shard_idx`` (40-bit md5 of
    ``"hrw{seed}#{idx}#" + id``) — pure column algebra, no explode, no
    shuffle at all; the packed integer makes the tie-break explicit
    and engine-identical.
    """
    from dachshund_spark.pipeline.text import md5_long

    def packed(idx: int) -> Column:
        h40 = md5_long(
            F.concat(F.lit(f"hrw{seed}#{idx}#"), F.col(id_col).cast("string"))
        ) % F.lit(1 << 40)
        return h40 * F.lit(int(n_shards)) + F.lit(idx)

    full = F.array_max(F.array(*[packed(i) for i in range(int(n_shards))]))
    kept = [i for i in range(int(n_shards)) if i != removed]
    after = F.array_max(F.array(*[packed(i) for i in kept]))
    return df.select(
        id_col,
        (full % F.lit(int(n_shards))).cast("long").alias("shard"),
        (after % F.lit(int(n_shards))).cast("long").alias("shard_after"),
    )


def url_pattern_census(
    pages: DataFrame, url_col: str = "url", min_pages: int = 2
) -> DataFrame:
    """URL template mining: ``[host, pattern, n_pages, n_urls]`` —
    paths with digit runs collapsed to ``N`` (query/fragment
    stripped), grouped per host, templates seen on ≥ ``min_pages``
    pages emitted.

    The faceted-navigation / crawler-trap detector every frontier
    needs: a template like ``/item/N/page/N`` with 10^6 instances on
    one host is a parameterized surface, not 10^6 documents, and the
    scheduler should budget it as one.  Pure codegen string algebra
    (two anchored regex extracts + one global digit-run replace), one
    aggregation keyed (host, pattern) — count-distinct on the url for
    the dedup-aware instance count.
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    pattern = F.regexp_replace(path, "[0-9]+", "N")
    return (
        pages.select(host.alias("host"), pattern.alias("pattern"), u.alias("_u"))
        .groupBy("host", "pattern")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("_u").cast("long").alias("n_urls"),
        )
        .where(F.col("n_pages") >= F.lit(int(min_pages)))
    )
