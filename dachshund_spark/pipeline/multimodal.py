"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through per-row Python.

The decode kernels themselves are STUBBED in this container (no
PIL/ffmpeg/librosa available): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the payload hash) produces
stable feature rows — the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int, "
    "sample_rate int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, phash long"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: statistics derived
    from the payload digest (stable across runs/partitionings)."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "mean_r": h[0] / 255.0,
        "mean_g": h[1] / 255.0,
        "mean_b": h[2] / 255.0,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → per-image feature row via Arrow-batched
    mapInPandas. Real decoder unavailable in this container; with
    ``fake=True`` a deterministic digest-based decoder stands in."""

    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not installed in this "
            "container); pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda p: _fake_decode(bytes(p or b"")))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_r": feats.map(lambda d: d["mean_r"]),
                    "mean_g": feats.map(lambda d: d["mean_g"]),
                    "mean_b": feats.map(lambda d: d["mean_b"]),
                    "phash": feats.map(lambda d: d["phash"]),
                }
            )
            yield out

    return media.select("media_id", "payload", "width", "height").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def phash_near_dups(
    features: DataFrame,
    bands: int = 4,
    band_bits: int = 16,
    max_hamming: int | None = None,
) -> DataFrame:
    """Image near-duplicate candidates via Hamming-band LSH over the
    64-bit perceptual hash: [media_a, media_b, n_shared_bands, hamming].

    Same shape as the text stack's banded MinHash LSH
    (:func:`~dachshund_spark.pipeline.dedup.minhash_lsh_candidates`):
    the 64-bit ``phash`` splits into ``bands`` slices of ``band_bits``
    bits; two images become a candidate pair iff at least one slice
    matches exactly — pairs are generated per band bucket (join on
    (band, band_val)), never all-pairs, so a corpus with few dups costs
    ~nothing and exact dups (Hamming 0) always collide in every band.
    A pair within Hamming distance d survives with probability ≥
    1 - (d choose spread) style bounds; ``max_hamming`` optionally
    post-filters candidates by true Hamming distance (bit_count of
    XOR — exact, computed only on candidates).

    Input is the output of :func:`decode_image_features` (or any frame
    with ``media_id`` and a 64-bit ``phash``).
    """
    if bands * band_bits > 64:
        raise ValueError("bands * band_bits must be <= 64")
    mask = (1 << band_bits) - 1
    banded = features.select(
        "media_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(phash, CAST({band_bits} * band AS INT))")
        .bitwiseAND(F.lit(mask)),
    )
    a = banded.select(
        F.col("media_id").alias("media_a"), F.col("phash").alias("pa"),
        "band", "band_val",
    )
    b = banded.select(
        F.col("media_id").alias("media_b"), F.col("phash").alias("pb"),
        "band", "band_val",
    )
    pairs = (
        a.join(b, ["band", "band_val"])
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b", "pa", "pb")
        .agg(F.count("*").alias("n_shared_bands"))
        .select(
            "media_a",
            "media_b",
            "n_shared_bands",
            F.bit_count(F.expr("pa ^ pb")).cast("int").alias("hamming"),
        )
    )
    if max_hamming is not None:
        pairs = pairs.where(F.col("hamming") <= max_hamming)
    return pairs


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: emits (media_id, frame_ts)
    rows JVM-side; the actual frame decode is the stubbed stage."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def make_fake_media(
    spark, n: int = 64, seed: int = 42, n_distinct: int | None = None
) -> DataFrame:
    """Deterministic synthetic media table for tests.

    ``n_distinct`` < n plants exact duplicate payloads (ids sharing
    ``id % n_distinct`` carry identical bytes) — near-dup fixtures."""
    payload_key = (
        F.pmod(F.col("id"), F.lit(n_distinct)) if n_distinct else F.col("id")
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit(f"payload-{seed}-"), payload_key), "utf-8").alias(
            "payload"
        ),
        F.lit("image/png").alias("media_type"),
        (F.pmod(F.col("id"), 4) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), 3) * 64 + 64).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        (F.col("id") * 500).cast("int").alias("duration_ms"),
    )
