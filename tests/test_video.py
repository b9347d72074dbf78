"""MJPEG-in-AVI container codec + distributed frame decode.

The fixture pixels follow (v*17 + f*13 + bx*29 + by*47) % 256 per 8x8
block, so expected stats are computable without decoding — everything
the decode path reports is pinned against that closed form.
"""
import pytest

from dachshund_spark.pipeline.jpeg import decode_jpeg_gray, encode_jpeg_gray
from dachshund_spark.pipeline.video import (
    decode_video_frame_features,
    make_video_media,
    parse_avi_mjpeg,
    write_avi_mjpeg,
)


def _px(mid, f, size=16):
    return [
        [(mid * 17 + f * 13 + (x // 8) * 29 + (y // 8) * 47) % 256 for x in range(size)]
        for y in range(size)
    ]


@pytest.mark.quick
def test_avi_roundtrip_pixel_exact():
    frames = [encode_jpeg_gray(16, 16, _px(3, f)) for f in range(5)]
    avi = write_avi_mjpeg(frames, 16, 16, fps=25)
    out = list(parse_avi_mjpeg(avi))
    assert [(i, ts) for i, ts, _ in out] == [(f, f * 40) for f in range(5)]
    for i, _, jpg in out:
        w, h, rows = decode_jpeg_gray(jpg)
        assert (w, h) == (16, 16) and rows == _px(3, i)


@pytest.mark.quick
def test_avi_odd_sized_frames_word_aligned():
    """RIFF pads odd chunk sizes; an odd-length JPEG must not shift
    subsequent frame boundaries."""
    frames = [encode_jpeg_gray(8, 8, _px(7, f, size=8)) for f in range(3)]
    sizes = [len(f) for f in frames]
    assert any(s % 2 for s in sizes), f"fixture should contain an odd size: {sizes}"
    out = list(parse_avi_mjpeg(write_avi_mjpeg(frames, 8, 8)))
    assert [jpg for _, _, jpg in out] == frames


@pytest.mark.quick
def test_parse_tolerates_garbage_and_truncation():
    frames = [encode_jpeg_gray(8, 8, _px(1, f, size=8)) for f in range(4)]
    avi = write_avi_mjpeg(frames, 8, 8)
    assert list(parse_avi_mjpeg(b"not an avi")) == []
    assert list(parse_avi_mjpeg(b"")) == []
    # cutting the file mid-movi yields a prefix of frames, no raise
    got = list(parse_avi_mjpeg(avi[: len(avi) * 2 // 3]))
    assert 0 < len(got) < 4
    assert [jpg for _, _, jpg in got] == frames[: len(got)]
    with pytest.raises(ValueError):
        list(parse_avi_mjpeg(b"not an avi", strict=True))


def test_decode_video_frame_features_matches_formula(spark):
    media = make_video_media(spark, n=6, n_frames=3, size=16, fps=10)
    rows = decode_video_frame_features(media).collect()
    assert len(rows) == 18
    for r in rows:
        grays = [
            (r.media_id * 17 + r.frame_idx * 13 + bx * 29 + by * 47) % 256
            for bx in range(2)
            for by in range(2)
        ]
        assert r.width == 16 and r.height == 16
        assert r.frame_ts_ms == r.frame_idx * 100
        assert r.sum_gray == 64 * sum(grays)
        assert r.min_gray == min(grays) and r.max_gray == max(grays)


def test_every_n_sampling(spark):
    media = make_video_media(spark, n=2, n_frames=6, size=8, fps=10)
    rows = decode_video_frame_features(media, every_n=3).collect()
    assert sorted({r.frame_idx for r in rows}) == [0, 3]
    assert len(rows) == 4


def test_video_features_tolerate_corrupt_frame(spark):
    """One undecodable JPEG frame inside an otherwise-good AVI yields a
    NULL-stats row for that frame (idx/ts from the container survive);
    a non-AVI blob yields no rows; strict=True raises."""
    import pytest
    from pyspark.sql import functions as F
    from dachshund_spark.pipeline.jpeg import encode_jpeg_gray
    from dachshund_spark.pipeline.video import write_avi_mjpeg

    good = encode_jpeg_gray(8, 8, [[7] * 8] * 8)
    avi = write_avi_mjpeg([good, b"\xff\xd8corrupt", good], 8, 8, fps=10)
    media = spark.createDataFrame(
        [(1, avi), (2, b"not an avi at all")], "media_id long, payload binary"
    )
    out = decode_video_frame_features(media)
    rows = sorted(out.collect(), key=lambda r: r.frame_idx)
    assert [r.media_id for r in rows] == [1, 1, 1]
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert rows[1].width is None and rows[1].sum_gray is None
    assert rows[0].sum_gray == 64 * 7 and rows[2].sum_gray == 64 * 7
    assert rows[1].frame_ts_ms == 100
    assert out.where(F.col("width").isNull()).count() == 1
    with pytest.raises(Exception):
        decode_video_frame_features(
            media.where("media_id = 1"), strict=True
        ).collect()
