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


def test_mixed_dispatch_tolerates_malformed_payloads(spark):
    """A crawl corpus mixing truncated PNGs and unknown-magic blobs must
    yield NULL-feature rows (the n_bad signal), not kill the task;
    strict=True preserves raise-on-malformed."""
    import pytest
    from pyspark.sql import functions as F
    from dachshund_spark.pipeline.multimodal import decode_image_features_auto

    media = make_mixed_media(spark, n=9, size=8)
    png_payload = media.where("media_id = 0").first()["payload"]
    bad = spark.createDataFrame(
        [
            (100, bytes(png_payload)[:20]),     # truncated PNG
            (101, b"\x00\x01not an image"),     # unknown magic
            (102, b"\xff\xd8\xff\xe0garbage"),  # JPEG magic, corrupt body
        ],
        "media_id long, payload binary",
    )
    corpus = media.select("media_id", "payload").unionByName(bad)
    out = decode_image_features_auto(corpus.repartition(4))
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 12  # every payload produced a row
    n_bad = out.where(F.col("width").isNull()).count()
    assert n_bad == 3
    for mid in (100, 101, 102):
        assert rows[mid]["sum_r"] is None and rows[mid]["ahash"] is None
    for mid in range(9):  # good payloads unaffected
        expect = sum((mid + 3 * x + 5 * y) % 256 for x in range(8) for y in range(8))
        assert rows[mid]["sum_r"] == expect
    with pytest.raises(Exception):
        decode_image_features_auto(bad, strict=True).collect()


def test_audio_features_tolerate_malformed(spark):
    from pyspark.sql import functions as F
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_features,
        make_wav_media,
    )

    media = make_wav_media(spark, n=4, n_samples=64)
    bad = spark.createDataFrame(
        [(100, b"RIFFxxxxNOPE"), (101, b"")],
        "media_id long, payload binary",
    )
    corpus = media.select("media_id", "payload").unionByName(bad)
    out = decode_audio_features(corpus)
    assert out.count() == 6
    assert out.where(F.col("sum_sq").isNull()).count() == 2


def test_array_decoders_match_tuple_decoders():
    """The numpy fast paths must be pixel-identical to the tuple
    decoders for every container (and dispatch must route to them)."""
    import numpy as np
    from dachshund_spark.pipeline.multimodal import (
        decode_bmp_array,
        decode_gif_array,
        decode_image_array,
        decode_png_array,
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from dachshund_spark.pipeline.jpeg import encode_jpeg_gray

    size = 24
    rows = [
        [((3 * x + 5 * y) % 256, (7 * x + 11 * y) % 256, (13 * x + 17 * y) % 256)
         for x in range(size)]
        for y in range(size)
    ]
    expect = [[list(p) for p in r] for r in rows]
    for payload, dec in (
        (encode_png(size, size, rows), decode_png_array),
        (encode_bmp(size, size, rows), decode_bmp_array),
    ):
        w, h, arr = dec(payload)
        assert (w, h) == (size, size) and arr.tolist() == expect
        w, h, arr2 = decode_image_array(payload)
        assert arr2.tolist() == expect
    pal = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    idx = [[(x + y) % 256 for x in range(size)] for y in range(size)]
    w, h, arr = decode_gif_array(encode_gif(size, size, idx, pal))
    assert arr.tolist() == [[list(pal[v]) for v in r] for r in idx]
    # constant blocks -> baseline JPEG lossless -> gray triples
    pix = [[(17 * ((x // 8) + (y // 8))) % 256 for x in range(16)] for y in range(16)]
    w, h, arr = decode_image_array(encode_jpeg_gray(16, 16, pix))
    assert arr.shape == (16, 16, 3)
    assert (arr[:, :, 0] == np.asarray(pix)).all() and (arr[:, :, 0] == arr[:, :, 2]).all()
