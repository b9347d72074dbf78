"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through per-row Python.

Real decode paths (pure stdlib, no PIL/ffmpeg/librosa needed): PNG
(zlib codec below), WAV/PCM16 (struct codec below) and baseline JPEG
(``pipeline/jpeg.py``) — each oracle-pinned via formula fixtures.
Only video frame decode remains stubbed: the generic
``decode_image_features`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload hash) produces stable feature rows — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested either way.
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
            "generic image decode requires PIL/opencv (not installed in "
            "this container); pass fake=True for the deterministic stub, "
            "or use the real stdlib codecs: decode_png_features (PNG), "
            "pipeline.jpeg.decode_jpeg_features (JPEG), "
            "pipeline.video.decode_video_frame_features (MJPEG-AVI)"
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
    rows JVM-side from the metadata column only (no bytes touched).

    For REAL frame decode use
    :func:`dachshund_spark.pipeline.video.decode_video_frame_features`
    — a pure-stdlib MJPEG-in-AVI walker over the baseline-JPEG codec
    that emits per-frame pixel stats (oracle-pinned)."""
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


# ---------------------------------------------------------------------------
# Real PNG decode path (pure stdlib: zlib + struct — no PIL needed).
# Covers non-interlaced 8-bit truecolor PNGs, all five scanline filters.
# ---------------------------------------------------------------------------
def encode_png(width: int, height: int, rgb_rows: list) -> bytes:
    """Minimal valid PNG writer (8-bit RGB, filter 0 rows).

    ``rgb_rows``: height rows of width (r, g, b) tuples.  Used by the
    media fixture generator so decode tests run on *real* PNG bytes.
    """
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(c for px in row for c in px) for row in rgb_rows
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Parse a non-interlaced 8-bit RGB PNG: returns
    ``(width, height, rows)`` with rows of (r, g, b) tuples.  Undoes
    scanline filters 0-4 (None/Sub/Up/Average/Paeth) per the PNG spec.
    """
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit truecolor non-interlaced supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride, bpp = width * 3, 3
    rows, prev = [], bytearray(stride)
    off = 0
    for _ in range(height):
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter {ftype}")
        rows.append(
            [tuple(line[i : i + 3]) for i in range(0, stride, 3)]
        )
        prev = line
    return width, height, rows


def make_png_media(spark, n: int = 64, size: int = 8) -> DataFrame:
    """Real-PNG media fixture: pixel (x, y) of image ``media_id`` is
    ``r = (id + 3x + 5y) % 256``, ``g = (2id + 7x + 11y) % 256``,
    ``b = (3id + 13x + 17y) % 256`` — a pure formula, so a SQL oracle
    can compute every expected statistic without decoding; the Spark
    path must recover the same numbers from the actual PNG bytes."""
    rows = []
    for mid in range(n):
        px = [
            [
                (
                    (mid + 3 * x + 5 * y) % 256,
                    (2 * mid + 7 * x + 11 * y) % 256,
                    (3 * mid + 13 * x + 17 * y) % 256,
                )
                for x in range(size)
            ]
            for y in range(size)
        ]
        rows.append((mid, encode_png(size, size, px), "image/png", size, size))
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, width int, height int"
    )


PNG_FEATURES_SCHEMA = (
    "media_id long, width int, height int, sum_r long, sum_g long, "
    "sum_b long, ahash long"
)


def decode_png_features(media: DataFrame) -> DataFrame:
    """REAL image decode (stdlib PNG) → exact integer channel sums +
    64-bit average-hash over the red channel of the 8×8 block-mean
    grid.  Arrow-batched ``mapInPandas`` like the stub path; every
    output is an integer, so the whole decode is oracle-checkable
    against the fixture's pixel formula."""

    def _feat(payload: bytes) -> tuple:
        w, h, rows = decode_png(bytes(payload))
        sr = sum(px[0] for row in rows for px in row)
        sg = sum(px[1] for row in rows for px in row)
        sb = sum(px[2] for row in rows for px in row)
        # 8x8 block means of the red channel (exact integer compare:
        # bit = 64 * block_sum * n_px >= total_r * block_px)
        bits = 0
        by, bx = h // 8, w // 8
        n_px = w * h
        for j in range(8):
            for i in range(8):
                bsum = sum(
                    rows[j * by + yy][i * bx + xx][0]
                    for yy in range(by)
                    for xx in range(bx)
                )
                if bsum * n_px >= sr * by * bx:
                    bits |= 1 << (j * 8 + i)
        if bits >= 1 << 63:
            bits -= 1 << 64
        return sr, sg, sb, bits

    def batches(it):
        for pdf in it:
            feats = [
                _feat(p) for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "sum_r": [f[0] for f in feats],
                    "sum_g": [f[1] for f in feats],
                    "sum_b": [f[2] for f in feats],
                    "ahash": [f[3] for f in feats],
                }
            )
            yield out

    return media.select("media_id", "payload", "width", "height").mapInPandas(
        batches, schema=PNG_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real WAV/PCM16 decode path (pure stdlib: struct) — second modality.
# ---------------------------------------------------------------------------
def encode_wav(sample_rate: int, samples: list) -> bytes:
    """Minimal mono PCM16 WAV writer (RIFF/fmt/data)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(data: bytes):
    """Parse mono PCM16 WAV: returns ``(sample_rate, samples)``."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, depth = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or depth != 16:
                raise ValueError("only mono PCM16 supported")
        elif tag == b"data":
            samples = list(
                struct.unpack(f"<{ln // 2}h", body[: ln - (ln % 2)])
            )
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def make_wav_media(spark, n: int = 64, n_samples: int = 256, rate: int = 8000) -> DataFrame:
    """Real-WAV media fixture; sample i of clip ``media_id`` is
    ``((id·13 + i·509) % 65536) − 32768`` — formula-replayable by a SQL
    oracle with no decoding. The 509 step wraps mod 2^16 every ~129
    samples, so the waveform genuinely crosses zero (a step of 7 never
    would, leaving zero_crossings trivially 0)."""
    rows = []
    for mid in range(n):
        samples = [
            ((mid * 13 + i * 509) % 65536) - 32768 for i in range(n_samples)
        ]
        rows.append((mid, encode_wav(rate, samples), "audio/wav", rate, n_samples))
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, sample_rate int, n_samples int",
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, sum_sq long, zero_crossings long"
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode (stdlib WAV) → exact integer energy
    (Σ sample²) and zero-crossing count (sign flips, s ≥ 0 vs < 0) via
    Arrow-batched ``mapInPandas`` — every output integer, so the
    decoder is oracle-checkable against the fixture formula."""

    def _feat(payload: bytes) -> tuple:
        rate, s = decode_wav(bytes(payload))
        ss = sum(x * x for x in s)
        zc = sum(
            1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0)
        )
        return rate, len(s), ss, zc

    def batches(it):
        for pdf in it:
            feats = [_feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [f[0] for f in feats],
                    "n_samples": [f[1] for f in feats],
                    "sum_sq": [f[2] for f in feats],
                    "zero_crossings": [f[3] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )
