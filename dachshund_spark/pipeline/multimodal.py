"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so payload
bytes never round-trip through per-row Python.

Real decode paths (pure stdlib, no PIL/ffmpeg/librosa needed): PNG
(zlib codec below), BMP (struct), GIF (full LZW codec below), WAV/PCM16
(struct), baseline JPEG (``pipeline/jpeg.py``) and MJPEG-in-AVI video
(``pipeline/video.py``) — each oracle-pinned via formula fixtures.
``decode_image_features_auto`` dispatches a mixed-format corpus on
magic bytes through one Arrow stage.  The legacy
``decode_image_features`` digest-fake is kept only for plumbing tests
(schema, batching, partitioning are real either way) and still raises
``NotImplementedError`` unless ``fake=True``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _rgb_feature_tuple(w: int, h: int, rows: list) -> tuple:
    """Exact integer channel sums + 64-bit aHash over the red channel of
    the 8×8 block-mean grid, vectorized with numpy.  Bit-exact vs the
    original per-pixel Python loops (all int64 math; the comparison
    ``64·block_sum·n_px ≥ total_r·block_px`` stays in integers).
    int64 bound: block_sum·n_px < 2^63 holds to ~48-megapixel images —
    far past any web thumbnail pass."""
    arr = np.asarray(rows)  # (h, w, 3); ndarray input passes through
    if arr.dtype != np.int64:
        arr = arr.astype(np.int64)
    sr = int(arr[:, :, 0].sum())
    sg = int(arr[:, :, 1].sum())
    sb = int(arr[:, :, 2].sum())
    by, bx = h // 8, w // 8
    n_px = w * h
    blocks = arr[: by * 8, : bx * 8, 0].reshape(8, by, 8, bx).sum(axis=(1, 3))
    mask = blocks * n_px >= sr * by * bx
    bits = 0
    for j in range(8):
        for i in range(8):
            if mask[j, i]:
                bits |= 1 << (j * 8 + i)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return sr, sg, sb, bits

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


def _decode_png_scanlines(data: bytes):
    """Parse a non-interlaced 8-bit RGB PNG down to unfiltered flat RGB
    scanlines: ``(width, height, list[bytearray])``.  Undoes scanline
    filters 0-4 (None/Sub/Up/Average/Paeth) per the PNG spec."""
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
        rows.append(line)
        prev = line
    return width, height, rows


def decode_png(data: bytes):
    """Parse a non-interlaced 8-bit RGB PNG: returns
    ``(width, height, rows)`` with rows of (r, g, b) tuples."""
    width, height, lines = _decode_png_scanlines(data)
    return width, height, [
        [tuple(line[i : i + 3]) for i in range(0, width * 3, 3)]
        for line in lines
    ]


def decode_png_array(data: bytes):
    """Array fast path: ``(width, height, uint8 ndarray (h, w, 3))`` —
    the unfiltered scanlines are flat RGB bytearrays, so the pixels go
    straight to numpy without a 3·n-tuple Python detour (the tuple
    conversion, not the filter undo, dominated megapixel decodes)."""
    width, height, lines = _decode_png_scanlines(data)
    arr = np.frombuffer(b"".join(lines), dtype=np.uint8)
    return width, height, arr.reshape(height, width, 3)


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
        w, h, arr = decode_png_array(bytes(payload))
        # 8x8 block means of the red channel (exact integer compare:
        # bit = 64 * block_sum * n_px >= total_r * block_px), numpy-
        # vectorized — per-pixel Python loops made decode the pipeline
        # bottleneck at real image sizes
        return _rgb_feature_tuple(w, h, arr)

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


def decode_audio_features(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """REAL audio decode (stdlib WAV) → exact integer energy
    (Σ sample²) and zero-crossing count (sign flips, s ≥ 0 vs < 0) via
    Arrow-batched ``mapInPandas`` — every output integer, so the
    decoder is oracle-checkable against the fixture formula.  Tolerant
    by default: a malformed payload yields a NULL-feature row instead
    of killing the task; ``strict=True`` raises."""

    def _feat(payload: bytes) -> tuple:
        try:
            rate, s = decode_wav(bytes(payload))
        except Exception:
            if strict:
                raise
            return None, None, None, None
        arr = np.asarray(s, dtype=np.int64)
        ss = int((arr * arr).sum())
        zc = int(((arr[:-1] >= 0) != (arr[1:] >= 0)).sum()) if len(arr) else 0
        return rate, len(s), ss, zc

    def batches(it):
        for pdf in it:
            feats = [_feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.array(
                        [f[0] for f in feats], dtype="Int32"
                    ),
                    "n_samples": pd.array([f[1] for f in feats], dtype="Int64"),
                    "sum_sq": pd.array([f[2] for f in feats], dtype="Int64"),
                    "zero_crossings": pd.array(
                        [f[3] for f in feats], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real BMP decode path (pure stdlib: struct) — 24-bit uncompressed BI_RGB.
# ---------------------------------------------------------------------------
def encode_bmp(width: int, height: int, rgb_rows: list) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (bottom-up rows, BGR byte
    order, rows padded to 4-byte boundaries per the BITMAPINFOHEADER
    spec)."""
    import struct

    stride = (width * 3 + 3) & ~3
    pix = bytearray()
    for row in reversed(rgb_rows):  # BMP stores rows bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        pix += line
    header_size = 14 + 40
    file_size = header_size + len(pix)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
        + bytes(pix)
    )


def decode_bmp(data: bytes):
    """Parse a 24-bit uncompressed BMP: returns ``(width, height, rows)``
    of (r, g, b) tuples (top-down order, regardless of stored
    orientation)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (_, _, _, _, off) = struct.unpack("<2sIHHI", data[:14])
    hdr_size, width, height = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = []
    for j in range(height):
        src = j if not bottom_up else height - 1 - j
        base = off + src * stride
        rows.append(
            [
                (data[base + 3 * i + 2], data[base + 3 * i + 1], data[base + 3 * i])
                for i in range(width)
            ]
        )
    return width, height, rows


def decode_bmp_array(data: bytes):
    """Array fast path for :func:`decode_bmp`: ``(width, height, uint8
    ndarray (h, w, 3))`` — stride slicing + BGR→RGB flip in numpy, no
    per-pixel tuples."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (_, _, _, _, off) = struct.unpack("<2sIHHI", data[:14])
    hdr_size, width, height = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    end = off + stride * height
    if end > len(data):
        raise ValueError("truncated BMP pixel data")
    arr = np.frombuffer(data[off:end], dtype=np.uint8).reshape(height, stride)
    arr = arr[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR→RGB
    if bottom_up:
        arr = arr[::-1]
    return width, height, arr


# ---------------------------------------------------------------------------
# Real GIF decode path (pure stdlib) — GIF89a, single frame, 256-entry
# global palette, full LZW codec (variable code width, clear/EOI codes).
# ---------------------------------------------------------------------------
def _lzw_encode(indices, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when the
    encoder's next table entry would be 2**width + 1 (the decoder adds
    its mirror entry one code later, so the widths stay in lockstep),
    stops adding at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = nbits = 0
    code_size = min_code_size + 1

    def emit(code):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (int(k),)
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> list:
    """GIF-variant LZW decoder (spec rule: width grows when next_code
    reaches 2**width; handles the KwKwK self-referential case)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    buf = nbits = pos = 0
    code_size = min_code_size + 1
    out: list = []
    table: list = []
    prev = None

    def reset():
        nonlocal table, code_size, prev
        table = [(i,) for i in range(clear)] + [None, None]
        code_size = min_code_size + 1
        prev = None

    reset()
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def encode_gif(width: int, height: int, index_rows: list, palette: list) -> bytes:
    """Minimal single-frame GIF89a writer: 256-entry global palette,
    LZW-compressed pixel indices in <=255-byte sub-blocks."""
    import struct

    assert len(palette) == 256
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    lzw = _lzw_encode([i for row in index_rows for i in row], 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes):
    """Parse a single-frame GIF87a/89a with a global palette: returns
    ``(width, height, rows)`` of (r, g, b) tuples.  Skips extension
    blocks; non-interlaced images with no local palette only."""
    iw, ih, idx, palette = _decode_gif_indices(data)
    return iw, ih, [
        [palette[idx[j * iw + i]] for i in range(iw)] for j in range(ih)
    ]


def decode_gif_array(data: bytes):
    """Array fast path for :func:`decode_gif`: ``(width, height, uint8
    ndarray (h, w, 3))`` — the palette lookup is one numpy fancy-index
    over the LZW index stream instead of a per-pixel tuple build."""
    iw, ih, idx, palette = _decode_gif_indices(data)
    pal = np.asarray(palette, dtype=np.uint8)
    ind = np.asarray(idx[: iw * ih], dtype=np.intp).reshape(ih, iw)
    return iw, ih, pal[ind]


def _decode_gif_indices(data: bytes):
    """Shared GIF parse down to the raw LZW index stream:
    ``(width, height, indices, palette)``."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height, packed, _, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = []
    if packed & 0x80:
        n = 2 << (packed & 7)
        for i in range(n):
            palette.append(tuple(data[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * n
    while pos < len(data):
        tag = data[pos]
        pos += 1
        if tag == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif tag == 0x2C:  # image descriptor
            _, _, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if ipacked & 0x80:
                raise ValueError("local palettes unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIFs unsupported")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            return iw, ih, idx, palette
        elif tag == 0x3B:
            break
    raise ValueError("no image block in GIF")


def sniff_image_format(payload: bytes) -> str:
    """Magic-byte image container sniffing (png/jpeg/bmp/gif/unknown)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def decode_image_rgb(payload: bytes):
    """REAL generic image decode: dispatch on magic bytes to the stdlib
    PNG / baseline-JPEG / BMP / GIF codecs; returns (width, height,
    rows-of-(r,g,b)).  Raises ValueError for unrecognized containers —
    the honest boundary of the pure-stdlib decoder set."""
    fmt = sniff_image_format(bytes(payload))
    if fmt == "png":
        return decode_png(bytes(payload))
    if fmt == "bmp":
        return decode_bmp(bytes(payload))
    if fmt == "gif":
        return decode_gif(bytes(payload))
    if fmt == "jpeg":
        from dachshund_spark.pipeline.jpeg import decode_jpeg_gray

        w, h, pix = decode_jpeg_gray(bytes(payload))
        return w, h, [[(v, v, v) for v in row] for row in pix]
    raise ValueError(f"unsupported image container (magic={payload[:4]!r})")


def decode_image_array(payload: bytes):
    """Array twin of :func:`decode_image_rgb`: ``(width, height, uint8
    ndarray (h, w, 3))`` via the per-codec numpy fast paths — the hot
    path for feature extraction (no per-pixel Python tuples)."""
    fmt = sniff_image_format(bytes(payload))
    if fmt == "png":
        return decode_png_array(bytes(payload))
    if fmt == "bmp":
        return decode_bmp_array(bytes(payload))
    if fmt == "gif":
        return decode_gif_array(bytes(payload))
    if fmt == "jpeg":
        from dachshund_spark.pipeline.jpeg import decode_jpeg_gray

        w, h, pix = decode_jpeg_gray(bytes(payload))
        gray = np.asarray(pix, dtype=np.uint8)
        return w, h, np.stack([gray, gray, gray], axis=-1)
    raise ValueError(f"unsupported image container (magic={payload[:4]!r})")


def decode_image_features_auto(
    media: DataFrame, *, strict: bool = False
) -> DataFrame:
    """REAL generic image feature extraction: per-payload magic-byte
    dispatch to the stdlib PNG/JPEG/BMP/GIF decoders, then the same
    exact-integer channel sums + 64-bit aHash as
    :func:`decode_png_features` (numpy-vectorized) — so one
    Arrow-batched stage handles a mixed-format corpus and every output
    is oracle-checkable.

    Tolerant by default (the :func:`dachshund_spark.pages.warc.parse_warc`
    policy): a truncated / corrupt / unknown-magic payload yields a row
    with NULL features instead of killing the task — on a real crawl
    corpus one bad image must not fail the job, and
    ``count(width IS NULL)`` is the n_bad signal.  ``strict=True``
    restores raise-on-malformed for fixture pipelines that want decode
    bugs loud.

    Parity: reference's media ingestion treats payloads as opaque typed
    blobs (SURVEY.md §2 multimodal); this is the engine-side real
    decode the digest-fake ``decode_image_features`` stood in for."""

    _NULL = (None, None, None, None, None, None)

    def _feat(payload: bytes) -> tuple:
        try:
            w, h, arr = decode_image_array(bytes(payload))
            return (w, h) + _rgb_feature_tuple(w, h, arr)
        except Exception:
            if strict:
                raise
            return _NULL

    def batches(it):
        for pdf in it:
            feats = [_feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([f[0] for f in feats], dtype="Int32"),
                    "height": pd.array([f[1] for f in feats], dtype="Int32"),
                    "sum_r": pd.array([f[2] for f in feats], dtype="Int64"),
                    "sum_g": pd.array([f[3] for f in feats], dtype="Int64"),
                    "sum_b": pd.array([f[4] for f in feats], dtype="Int64"),
                    "ahash": pd.array([f[5] for f in feats], dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=PNG_FEATURES_SCHEMA
    )


def make_mixed_media(spark, n: int = 96, size: int = 8) -> DataFrame:
    """Mixed-container media fixture: every image is the SAME grayscale
    formula ``v(x, y) = (media_id + 3x + 5y) % 256`` in all three
    channels, but the container alternates PNG / BMP / GIF by
    ``media_id % 3`` (all three encodings are lossless, GIF via an
    identity grayscale palette) — so ONE format-independent SQL oracle
    pins all three real decoders plus the magic-byte dispatch."""
    gray_palette = [(i, i, i) for i in range(256)]
    rows = []
    for mid in range(n):
        vals = [
            [(mid + 3 * x + 5 * y) % 256 for x in range(size)] for y in range(size)
        ]
        fmt = mid % 3
        if fmt == 0:
            payload = encode_png(
                size, size, [[(v, v, v) for v in row] for row in vals]
            )
            mt = "image/png"
        elif fmt == 1:
            payload = encode_bmp(
                size, size, [[(v, v, v) for v in row] for row in vals]
            )
            mt = "image/bmp"
        else:
            payload = encode_gif(size, size, vals, gray_palette)
            mt = "image/gif"
        rows.append((mid, payload, mt, size, size))
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, width int, height int"
    )


def make_bmp_media(spark, n: int = 64, size: int = 8) -> DataFrame:
    """Real-BMP media fixture with the same per-channel pixel formula as
    :func:`make_png_media` — distinct r/g/b planes, so a BGR byte-order
    bug in the BMP codec breaks the oracle."""
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
        rows.append((mid, encode_bmp(size, size, px), "image/bmp", size, size))
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, width int, height int"
    )


def make_gif_media(spark, n: int = 64, size: int = 8) -> DataFrame:
    """Real-GIF media fixture: pixel index ``i = (id + 3x + 5y) % 256``
    through the colored palette ``(7i, 11i, 13i) % 256`` — the palette
    mapping itself is under oracle test (an index/channel mixup shifts
    the sums)."""
    palette = [((7 * i) % 256, (11 * i) % 256, (13 * i) % 256) for i in range(256)]
    rows = []
    for mid in range(n):
        idx = [
            [(mid + 3 * x + 5 * y) % 256 for x in range(size)] for y in range(size)
        ]
        rows.append(
            (mid, encode_gif(size, size, idx, palette), "image/gif", size, size)
        )
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, width int, height int"
    )


def decode_audio_windows(
    media: DataFrame, *, window: int = 64, silence_sq: int = 1 << 28, strict: bool = False
) -> DataFrame:
    """Windowed audio energy from REAL WAV decode: one row per
    ``window``-sample frame — ``[media_id, win, n, sum_sq, peak,
    silent]`` (the VAD/silence-detection primitive: energy-gated
    frame selection before any expensive audio model).

    ``sum_sq`` and ``peak`` (max |s|) are exact integers; ``silent``
    compares ``sum_sq < silence_sq · n / window`` cleared to integer
    cross-multiplication (``sum_sq · window < silence_sq · n``) so the
    flag is engine-exact on ragged tail frames.  Arrow-batched
    ``mapInPandas``; numpy window reduction (no per-sample Python).
    Malformed payloads are skipped (``strict=True`` raises).
    """
    w = int(window)
    th_sq = int(silence_sq)

    def batches(it):
        for pdf in it:
            ids, wins, ns, sqs, pks, sil = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _, s = decode_wav(bytes(payload))
                except Exception:
                    if strict:
                        raise
                    continue
                arr = np.asarray(s, dtype=np.int64)
                for k in range(0, len(arr), w):
                    fr = arr[k : k + w]
                    ss = int((fr * fr).sum())
                    n = int(len(fr))
                    ids.append(mid)
                    wins.append(k // w)
                    ns.append(n)
                    sqs.append(ss)
                    pks.append(int(np.abs(fr).max()) if n else 0)
                    sil.append(ss * w < th_sq * n)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "win": pd.array(wins, dtype="Int64"),
                    "n": pd.array(ns, dtype="Int64"),
                    "sum_sq": pd.array(sqs, dtype="Int64"),
                    "peak": pd.array(pks, dtype="Int64"),
                    "silent": pd.array(sil, dtype="boolean"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches,
        schema="media_id long, win long, n long, sum_sq long, peak long, silent boolean",
    )


AUDIO_AUTOCORR_SCHEMA = (
    "media_id long, lag long, ac long"
)


def decode_audio_autocorr(
    media: DataFrame, *, lags: "tuple[int, ...]" = (1, 2, 4, 8),
    strict: bool = False,
) -> DataFrame:
    """Raw autocorrelation at fixed lags from REAL WAV bytes:
    ``[media_id, lag, ac]`` with ``ac = Σ_i s_i · s_{i+lag}`` — the
    exact-integer pitch/periodicity feature (the numerator of the
    normalized autocorrelation every period detector thresholds), one
    row per (media, lag).

    Same decode path and tolerance contract as
    :func:`decode_audio_features` (malformed payload → NULL ac rows
    unless ``strict``); numpy dot products over the decoded PCM16
    array, so products stay < 2³⁰ and sums exact in int64.
    """

    def _acs(payload: bytes):
        try:
            _, s = decode_wav(bytes(payload))
        except Exception:
            if strict:
                raise
            return [None] * len(lags)
        arr = np.asarray(s, dtype=np.int64)
        out = []
        for lag in lags:
            if lag < len(arr):
                out.append(int((arr[:-lag] * arr[lag:]).sum()))
            else:
                out.append(0)
        return out

    def batches(it):
        for pdf in it:
            rows = {"media_id": [], "lag": [], "ac": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for lag, ac in zip(lags, _acs(payload)):
                    rows["media_id"].append(mid)
                    rows["lag"].append(lag)
                    rows["ac"].append(ac)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(rows["media_id"], dtype="Int64"),
                    "lag": pd.array(rows["lag"], dtype="Int64"),
                    "ac": pd.array(rows["ac"], dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_AUTOCORR_SCHEMA
    )
