"""Stdlib PNG codec: roundtrip, filter coverage, real-decode features."""

import struct
import zlib

from dachshund_spark.pipeline.multimodal import (
    decode_png,
    decode_png_features,
    encode_png,
    make_png_media,
)


def _chunk(tag, data):
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_with_filters(width, height, rows, ftypes):
    """Hand-encode with explicit per-row filter types (exercise the
    decoder's Sub/Up/Average/Paeth paths, which our writer never emits)."""
    stride, bpp = width * 3, 3
    raw = b""
    prev = bytearray(stride)
    for row, ft in zip(rows, ftypes):
        line = bytearray(c for px in row for c in px)
        enc = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (line[i] - line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_and_all_filter_types():
    rows = [
        [((x * 37 + y * 101) % 256,) * 3 for x in range(6)] for y in range(5)
    ]
    # writer path (filter 0 everywhere)
    w, h, got = decode_png(encode_png(6, 5, rows))
    assert (w, h) == (6, 5) and got == rows
    # every filter type decodes back to the same pixels
    data = _png_with_filters(6, 5, rows, [0, 1, 2, 3, 4])
    w, h, got = decode_png(data)
    assert got == rows


def test_decode_features_matches_formula(spark):
    media = make_png_media(spark, n=6, size=16)
    out = {r["media_id"]: r for r in decode_png_features(media).collect()}
    for mid in range(6):
        sr = sum(
            (mid + 3 * x + 5 * y) % 256 for x in range(16) for y in range(16)
        )
        assert out[mid]["sum_r"] == sr
        # 16x16 → 2x2 blocks: recompute ahash independently
        bits = 0
        for j in range(8):
            for i in range(8):
                bsum = sum(
                    (mid + 3 * (i * 2 + xx) + 5 * (j * 2 + yy)) % 256
                    for yy in range(2)
                    for xx in range(2)
                )
                if bsum * 256 >= sr * 4:
                    bits |= 1 << (j * 8 + i)
        if bits >= 1 << 63:
            bits -= 1 << 64
        assert out[mid]["ahash"] == bits
