"""Stdlib baseline-JPEG codec: roundtrip, AC/ZRL paths, stuffing, features."""

import math

import pytest

import dachshund_spark.pipeline.jpeg as J
from dachshund_spark.pipeline.jpeg import (
    decode_jpeg_features,
    decode_jpeg_gray,
    encode_jpeg_gray,
    make_jpeg_media,
)

_C = [1 / math.sqrt(2)] + [1.0] * 7


def _naive_idct(blk_zz):
    """Independent reconstruction: dequant + textbook double-sum IDCT."""
    nat = [0] * 64
    for k in range(64):
        nat[J.ZIGZAG[k]] = blk_zz[k] * J.QUANT[J.ZIGZAG[k]]
    return [
        [
            min(
                255,
                max(
                    0,
                    round(
                        sum(
                            _C[u]
                            * _C[v]
                            * nat[v * 8 + u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                            for u in range(8)
                            for v in range(8)
                        )
                        / 4
                        + 128
                    ),
                ),
            )
            for x in range(8)
        ]
        for y in range(8)
    ]


def test_constant_block_roundtrip_exact():
    for mid in (0, 7, 63):
        px = [
            [(mid * 17 + (x // 8) * 29 + (y // 8) * 47) % 256 for x in range(16)]
            for y in range(16)
        ]
        w, h, rows = decode_jpeg_gray(encode_jpeg_gray(16, 16, px))
        assert (w, h) == (16, 16) and rows == px


def test_ac_and_zrl_paths_match_independent_idct():
    blk = [0] * 64
    blk[0], blk[1], blk[8], blk[20], blk[63] = 5, -3, 2, 7, -1
    _, _, rows = decode_jpeg_gray(J._assemble_jpeg(8, 8, J._encode_scan([blk])))
    assert rows == _naive_idct(blk)
    blk2 = [0] * 64
    blk2[40] = 3  # 39 leading zeros -> two ZRL symbols + run 7
    _, _, rows2 = decode_jpeg_gray(J._assemble_jpeg(8, 8, J._encode_scan([blk2])))
    assert rows2 == _naive_idct(blk2)


def test_byte_stuffing_through_full_decoder():
    # g=0 block then g=255 block: DC diff 255 emits a 0xFF entropy byte,
    # which the writer must stuff and the reader must unstuff
    px = [[0 if x < 8 else 255 for x in range(16)] for y in range(8)]
    data = encode_jpeg_gray(16, 8, px)
    i = data.find(b"\xff\xda")
    seg = data[i + 2 + int.from_bytes(data[i + 2 : i + 4], "big") : -2]
    assert b"\xff\x00" in seg
    assert decode_jpeg_gray(data)[2] == px


def test_rejects_unsupported_streams():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x00")
    # SOF2 is supported now — but a scanless SOF2 stream still raises
    bad = b"\xff\xd8" + J._marker(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg_gray(bad)
    # hierarchical SOF3 stays rejected
    bad = b"\xff\xd8" + J._marker(0xC3, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError):
        decode_jpeg_gray(bad)


def test_progressive_constant_blocks_lossless():
    """SOF2 spectral-selection + successive-approximation on the
    constant-block fixture family is lossless — same argument as
    baseline (DC quantizer 8), with the DC Al=1→0 split reassembling
    g−128 bit-exactly."""
    from dachshund_spark.pipeline.jpeg import encode_jpeg_gray_progressive

    px = [[(17 * ((x // 8) + (y // 8))) % 256 for x in range(24)] for y in range(16)]
    data = encode_jpeg_gray_progressive(24, 16, px)
    # stream really is progressive: SOF2 marker, 6 SOS scans
    assert b"\xff\xc2" in data and data.count(b"\xff\xda") == 6
    assert decode_jpeg_gray(data) == (24, 16, px)


def test_progressive_equals_baseline_on_random_coefficients():
    """The progressive scan chain (DC approx+refine, two AC bands each
    approx+refine) must reconstruct the exact coefficient blocks the
    baseline scan codes — pinning EOBRUN, ZRL-in-refinement and
    correction-bit order against the independently-tested baseline
    decoder."""
    import random

    from dachshund_spark.pipeline.jpeg import (
        _assemble_jpeg,
        _encode_scan,
        encode_jpeg_coeffs_progressive,
    )

    rng = random.Random(7)
    for trial in range(12):
        blocks = []
        for _ in range(9):
            blk = [0] * 64
            blk[0] = rng.randint(-64, 64)
            mode = rng.random()
            if mode < 0.25:
                pass  # all-zero AC: long EOBRUNs
            elif mode < 0.5:
                blk[63] = rng.choice([-2, -1, 1, 2])  # max ZRL chains
                blk[40] = rng.choice([-1, 1])
            else:
                for k in range(1, 64):
                    if rng.random() < 0.4:
                        blk[k] = rng.randint(-31, 31)
            blocks.append(blk)
        base = decode_jpeg_gray(_assemble_jpeg(24, 24, _encode_scan(blocks)))
        prog = decode_jpeg_gray(encode_jpeg_coeffs_progressive(24, 24, blocks))
        assert base == prog, f"trial {trial}"


def test_dispatch_routes_progressive(spark):
    """decode_image_features_auto must decode SOF2 payloads through the
    same magic-byte dispatch (0xFFD8 covers both JPEG flavors)."""
    from dachshund_spark.pipeline.jpeg import encode_jpeg_gray_progressive
    from dachshund_spark.pipeline.multimodal import decode_image_features_auto

    px = [[(7 * ((x // 8) + (y // 8))) % 256 for x in range(16)] for y in range(16)]
    media = spark.createDataFrame(
        [(0, encode_jpeg_gray_progressive(16, 16, px))],
        "media_id long, payload binary",
    )
    row = decode_image_features_auto(media).first()
    gs = [(7 * (bx + by)) % 256 for bx in range(2) for by in range(2)]
    assert row["sum_r"] == row["sum_g"] == row["sum_b"] == 64 * sum(gs)


def test_decode_features_matches_formula(spark):
    media = make_jpeg_media(spark, n=5, size=16)
    out = {r["media_id"]: r for r in decode_jpeg_features(media).collect()}
    for mid in range(5):
        gs = [
            (mid * 17 + bx * 29 + by * 47) % 256
            for bx in range(2)
            for by in range(2)
        ]
        row = out[mid]
        assert (row["width"], row["height"]) == (16, 16)
        assert row["sum_gray"] == 64 * sum(gs)
        assert row["min_gray"] == min(gs)
        assert row["max_gray"] == max(gs)
