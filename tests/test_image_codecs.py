"""Pure-stdlib BMP / GIF codecs + generic magic-byte image dispatch.

The GIF LZW codec is the risky part (variable code widths, the
encoder/decoder width off-by-one, the 4096-entry dict cap, KwKwK); the
round-trip fuzz here pins all of those paths, and the Spark-side
dispatch test proves one Arrow stage decodes a mixed PNG/BMP/GIF corpus
to identical stats (all three containers carry the same image).
"""

import random

import pytest

from dachshund_spark.pipeline.multimodal import (
    _lzw_decode,
    _lzw_encode,
    decode_bmp,
    decode_gif,
    decode_image_rgb,
    encode_bmp,
    encode_gif,
    encode_png,
    make_mixed_media,
    sniff_image_format,
)

pytestmark = pytest.mark.quick


def test_lzw_round_trip_fuzz():
    rng = random.Random(7)
    for _ in range(60):
        seq = [rng.randint(0, 255) for _ in range(rng.randint(1, 3000))]
        assert _lzw_decode(_lzw_encode(seq)) == seq
    # low-entropy input grows the dictionary fast (exercises width bumps)
    for _ in range(20):
        seq = [rng.randint(0, 3) for _ in range(rng.randint(1, 5000))]
        assert _lzw_decode(_lzw_encode(seq)) == seq


def test_lzw_dict_cap_path():
    # >4096 table entries needed: both sides must stop adding in lockstep
    rng = random.Random(3)
    seq = [rng.randint(0, 255) for _ in range(60000)]
    assert _lzw_decode(_lzw_encode(seq)) == seq
    seq = [rng.randint(0, 1) for _ in range(120000)]
    assert _lzw_decode(_lzw_encode(seq)) == seq


def test_lzw_kwkwk_case():
    # the classic self-referential code: output "ababa..." style runs
    seq = [1, 2, 1, 2, 1, 2, 1, 2, 1]
    assert _lzw_decode(_lzw_encode(seq)) == seq


def test_bmp_round_trip_padding():
    # widths whose 3-byte rows are NOT 4-byte aligned exercise stride pad
    for w, h in [(1, 1), (3, 2), (8, 8), (5, 7), (16, 3)]:
        rows = [
            [((i * 7 + j * 13) % 256, (i * 3) % 256, (j * 11) % 256) for i in range(w)]
            for j in range(h)
        ]
        assert decode_bmp(encode_bmp(w, h, rows)) == (w, h, rows)


def test_gif_round_trip_palette():
    pal = [((i * 7) % 256, (i * 11) % 256, (i * 13) % 256) for i in range(256)]
    for w, h in [(1, 1), (8, 8), (13, 5)]:
        idx = [[(i + 3 * j) % 256 for i in range(w)] for j in range(h)]
        expect = [[pal[v] for v in row] for row in idx]
        assert decode_gif(encode_gif(w, h, idx, pal)) == (w, h, expect)


def test_sniff_and_dispatch():
    rgb = [[(1, 2, 3)] * 4] * 4
    png = encode_png(4, 4, rgb)
    bmp = encode_bmp(4, 4, rgb)
    gif = encode_gif(4, 4, [[0] * 4] * 4, [(1, 2, 3)] + [(0, 0, 0)] * 255)
    assert sniff_image_format(png) == "png"
    assert sniff_image_format(bmp) == "bmp"
    assert sniff_image_format(gif) == "gif"
    assert sniff_image_format(b"\xff\xd8\xff\xe0") == "jpeg"
    for payload in (png, bmp, gif):
        assert decode_image_rgb(payload) == (4, 4, rgb)
    with pytest.raises(ValueError):
        decode_image_rgb(b"not an image")


def test_mixed_dispatch_spark(spark):
    from dachshund_spark.pipeline.multimodal import decode_image_features_auto

    media = make_mixed_media(spark, n=12, size=8)
    rows = {
        r["media_id"]: r
        for r in decode_image_features_auto(media.repartition(4)).collect()
    }
    assert len(rows) == 12
    # all three containers encode the same grayscale formula image
    for mid, r in rows.items():
        expect = sum((mid + 3 * x + 5 * y) % 256 for x in range(8) for y in range(8))
        assert r["sum_r"] == r["sum_g"] == r["sum_b"] == expect, mid


def test_dispatch_decodes_real_jpeg():
    from dachshund_spark.pipeline.jpeg import encode_jpeg_gray

    # constant 8x8 blocks -> baseline JPEG is lossless -> gray recovered
    pix = [[(17 * ((x // 8) + (y // 8))) % 256 for x in range(16)] for y in range(16)]
    payload = encode_jpeg_gray(16, 16, pix)
    assert sniff_image_format(payload) == "jpeg"
    w, h, rows = decode_image_rgb(payload)
    assert (w, h) == (16, 16)
    for y in (0, 8, 15):
        for x in (0, 8, 15):
            v = pix[y][x]
            assert rows[y][x] == (v, v, v)
