"""Mergeable frequency sketches: Count–Min over corpus tokens.

Cormode & Muthukrishnan 2005: a depth×width grid of counters; item x
increments cell (i, h_i(x)) per row i, and its estimate is the MIN
over rows — always ≥ the true count (one-sided error ≤ εN with
ε ≈ e/width at failure probability e^-depth).

Why a sketch engine-side: the CMS table is *additive* — per-partition
grids sum cell-wise, so it map-side combines in one shuffle of
depth·width cells regardless of corpus size, and grids from separate
corpus shards / streaming micro-batches merge by addition (the same
mergeability contract as the HLL sketches in
:func:`dachshund_spark.graph.LinkGraph.approx_degrees`).  The
engine's heavy-hitter path over 100 TB of text is: CMS per shard →
cell-wise sum → probe candidate tokens.

Hashes are md5-derived (`md5_long(token || '#cms' || row)`), so the
oracle SQL reproduces the grid bit-for-bit — estimates are exact
integers, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dachshund_spark.pipeline.text import md5_long, tokens


def _bucket(col, row: int, width: int):
    return md5_long(F.concat(col, F.lit(f"#cms{row}"))) % F.lit(int(width))


def cms_build(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Count–Min grid ``[row, bucket, cnt]`` over the corpus tokens
    (one explode; the depth hashes are projected map-side so the
    shuffle carries at most depth·width cells after partial agg)."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    rows = [
        toks.select(
            F.lit(i).alias("row"), _bucket(F.col("token"), i, width).alias("bucket")
        )
        for i in range(depth)
    ]
    grid = rows[0]
    for r in rows[1:]:
        grid = grid.unionByName(r)
    return grid.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS grids built with the same (depth, width) —
    the shard/stream merge operation."""
    if not grids:
        raise ValueError("need at least one grid")
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    grid: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
    token_col: str = "token",
) -> DataFrame:
    """Point estimates ``[token, cms_estimate]`` for the probe tokens:
    min over rows of the matching cells.  The probe side is exploded
    to (token, row, bucket) and hash-joined against the grid — the
    grid is depth·width rows, so Catalyst broadcasts it."""
    keyed = probes.select(token_col).distinct()
    lookups = [
        keyed.select(
            token_col,
            F.lit(i).alias("row"),
            _bucket(F.col(token_col), i, width).alias("bucket"),
        )
        for i in range(depth)
    ]
    probe = lookups[0]
    for l in lookups[1:]:
        probe = probe.unionByName(l)
    return (
        probe.join(F.broadcast(grid), on=["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (integer-exact "HLL-40" variant)
# ---------------------------------------------------------------------------
HLL_HASH_BITS = 60  # md5_long is 15 hex chars = 60 bits, non-negative


def hll_registers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    p: int = 8,
    rcap: int = 40,
    seed: int = 0,
) -> DataFrame:
    """HyperLogLog registers per key: ``[key_cols..., reg, rho]``.

    Flajolet et al. 2007: hash each value, use the low ``p`` bits as
    the register index and ρ = 1 + leading-zero count of the remaining
    bits; the register keeps MAX(ρ).  MAX is the whole mergeability
    story — per-partition sketches combine map-side, shards/streams
    merge by another MAX, and the shuffle is ≤ 2^p rows per key no
    matter the input size (the same contract as cms_build above).

    ρ is computed with INTEGER arithmetic (binary-digit count, like
    stats.degree_distribution) and capped at ``rcap`` so the estimator
    can stay integer-exact (see hll_estimate) — no libm, no float,
    bit-identical in the DuckDB oracle.
    """
    m = 1 << p
    h = md5_long(
        F.concat_ws("#", F.lit(seed), F.lit("hll"), F.col(value_col))
    )
    # h >> p, NOT h / m: float division loses exactness past 2^53
    rest = F.shiftright(h, p)
    bits = F.length(F.conv(rest, 10, 2))  # floor(log2)+1 for rest>0
    rho = F.when(rest == 0, F.lit(HLL_HASH_BITS - p + 1)).otherwise(
        F.lit(HLL_HASH_BITS - p) - bits + 1
    )
    keyed = df.select(
        *key_cols,
        F.pmod(h, F.lit(m)).alias("reg"),
        F.least(rho, F.lit(int(rcap))).cast("long").alias("rho"),
    )
    return keyed.groupBy(*key_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    key_cols: list[str],
    *,
    p: int = 8,
    rcap: int = 40,
) -> DataFrame:
    """Distinct-count estimates from hll_registers output:
    ``[key_cols..., registers_set, z_e, estimate]``.

    The raw estimator E = α_m·m² / Σ_j 2^-ρ_j is computed EXACTLY:
    Z_e = Σ_j 2^(rcap−ρ_j) is a BIGINT (empty registers contribute
    2^rcap each), so E = α_m·m²·2^rcap / Z_e is one float multiply +
    one division — engine-stable with no aggregation-order risk, which
    a float Σ 2^-ρ sum would have (72 mantissa bits don't fit in 53).
    The small-range linear-counting correction (E ≤ 2.5m with empty
    registers → m·ln(m/V)) branches on exact integers and applies one
    scalar ln per key.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = m * m * (1 << rcap)
    agg = registers.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("registers_set"),
        F.sum(
            F.expr(f"cast(shiftleft(1L, cast({rcap} - rho as int)) as long)")
        ).alias("_z_set"),
    )
    z_e = (
        F.col("_z_set")
        + (F.lit(m) - F.col("registers_set")) * F.lit(1 << rcap)
    ).cast("long")
    v = F.lit(m) - F.col("registers_set")  # empty registers
    raw = F.lit(alpha) * F.lit(scale) / F.col("z_e")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(m) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *key_cols,
        "registers_set",
        z_e.alias("z_e"),
    ).select(
        *key_cols,
        "registers_set",
        "z_e",
        corrected.alias("estimate"),
    )


def kmv_estimate(
    values: DataFrame,
    col: str = "token",
    k: int = 64,
    hash_bits: int = 40,
) -> DataFrame:
    """KMV (k minimum values) distinct-count sketch — one row:
    ``[k, kth_hash, est_distinct, exact_distinct]``.

    Hash each distinct value uniformly into [0, 2^hash_bits); the k-th
    smallest hash h_k estimates n ≈ (k−1)·2^bits / h_k (Bar-Yossef et
    al. 2002). Everything is integer (estimate = truncating DIV), so
    the sketch is bit-exact across engines; the mergeable form is just
    "union hashes, keep k smallest". 40-bit space keeps
    (k−1)·2^bits < 2^63 under ANSI overflow checking.
    """
    from dachshund_spark.pipeline.text import md5_long

    hashed = values.select(
        (md5_long(F.col(col)) % F.lit(1 << hash_bits)).alias("_h")
    ).distinct()
    kth = (
        hashed.orderBy("_h")
        .limit(int(k))
        .agg(
            F.max("_h").alias("kth_hash"),
            F.count(F.lit(1)).alias("_got"),
        )
    )
    exact = hashed.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    return kth.crossJoin(F.broadcast(exact)).select(
        F.lit(int(k)).alias("k"),
        F.col("kth_hash").cast("long").alias("kth_hash"),
        F.when(
            F.col("_got") < k, F.col("exact_distinct")
        ).otherwise(
            F.expr(f"CAST({k - 1} AS BIGINT) * CAST({1 << hash_bits} AS BIGINT) DIV kth_hash")
        ).alias("est_distinct"),
        "exact_distinct",
    )


def ams_f2(
    docs: DataFrame, k: int = 16, text_col: str = "text"
) -> DataFrame:
    """AMS second-moment sketch vs ground truth: ``[estimator, z, z2,
    f2_exact]`` — ``k`` independent ±1-hash estimators of the token
    frequency vector's F₂ = Σ_w f_w² (Alon, Matias & Szegedy 1996).

    Each estimator j keeps one counter ``Z_j = Σ_w s_j(w)·f_w`` —
    accumulated as Σ over token OCCURRENCES of ``s_j(token)``, a
    single commutative integer pass, the textbook one-counter stream
    sketch — and ``E[Z²] = F₂`` exactly.  Emitting the exact F₂
    alongside makes the estimator error itself part of the oracle
    contract.  Signs are md5 parity (``'ams{j}#' || token``), so the
    whole sketch replays bit-for-bit; the explode fan-out is ×k on
    the token stream with map-side partial sums, no shuffle growth.
    """
    from dachshund_spark.pipeline.text import md5_long, tokens

    toks = docs.select(F.explode(tokens(text_col)).alias("token"))
    est = F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("j")
    signed = toks.select("token", est).select(
        "j",
        F.when(
            md5_long(
                F.concat(
                    F.lit("ams"), F.col("j").cast("string"), F.lit("#"),
                    F.col("token"),
                )
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    z = signed.groupBy("j").agg(F.sum("s").cast("long").alias("z"))
    f2 = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2"))
    )
    return z.crossJoin(F.broadcast(f2)).select(
        F.col("j").cast("long").alias("estimator"),
        "z",
        (F.col("z") * F.col("z")).cast("long").alias("z2"),
        F.col("f2").alias("f2_exact"),
    )
