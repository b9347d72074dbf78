"""Stdlib WAV codec: roundtrip, odd-chunk padding, real-decode features."""

import pytest

from dachshund_spark.pipeline.multimodal import (
    decode_audio_features,
    decode_wav,
    encode_wav,
    make_wav_media,
)


def test_roundtrip():
    samples = [((i * 7919) % 65536) - 32768 for i in range(100)]
    rate, got = decode_wav(encode_wav(8000, samples))
    assert rate == 8000 and got == samples


def test_rejects_non_wav_and_stereo():
    with pytest.raises(ValueError):
        decode_wav(b"not a riff file at all....")
    import struct

    # stereo fmt chunk must be rejected
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(ValueError):
        decode_wav(data)


def test_decode_features_matches_formula(spark):
    media = make_wav_media(spark, n=5, n_samples=64)
    out = {r["media_id"]: r for r in decode_audio_features(media).collect()}
    for mid in range(5):
        s = [((mid * 13 + i * 509) % 65536) - 32768 for i in range(64)]
        row = out[mid]
        assert row["sample_rate"] == 8000
        assert row["n_samples"] == 64
        assert row["sum_sq"] == sum(x * x for x in s)
        assert row["zero_crossings"] == sum(
            1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0)
        )
