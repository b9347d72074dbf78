"""Dispersion goldens (brute-force reference) + WAV autocorrelation."""

from itertools import combinations

import pytest

from dachshund_spark.graph import LinkGraph
from dachshund_spark.algorithms.linkpred import dispersion_scores


pytestmark = pytest.mark.quick


def _brute_dispersion(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for u, v in {(min(a, b), max(a, b)) for a, b in edges}:
        c = adj[u] & adj[v]
        disp = 0
        for s, t in combinations(sorted(c), 2):
            if t in adj[s]:
                continue
            if any(w in adj[s] and w in adj[t] for w in c):
                continue
            disp += 1
        out[(u, v)] = (len(c), disp)
    return out


def test_matches_bruteforce(spark):
    edges = [(0, 1)] + [(0, w) for w in (2, 3, 4, 5)] + [
        (1, w) for w in (2, 3, 4, 5)
    ] + [(2, 3), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.v): (r.cn, r.disp)
           for r in dispersion_scores(LinkGraph(df)).collect()}
    assert got == _brute_dispersion(edges)


def test_matches_bruteforce_random(spark):
    edges = sorted({(min(i, j), max(i, j)) for i, j in
                    ((k % 13, (k * 7 + 3) % 13) for k in range(40))
                    if i != j})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.u, r.v): (r.cn, r.disp)
           for r in dispersion_scores(LinkGraph(df)).collect()}
    assert got == _brute_dispersion(edges)


def test_wav_autocorr_exact(spark):
    from dachshund_spark.pipeline.multimodal import (
        decode_audio_autocorr,
        encode_wav,
    )

    samples = [100, -200, 300, -400, 500, -600, 700, -800]
    wav = encode_wav(8000, samples)
    media = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(b"not a wav"))],
        "media_id long, payload binary",
    )
    rows = decode_audio_autocorr(media, lags=(1, 2)).collect()
    got = {(r.media_id, r.lag): r.ac for r in rows}

    def ac(lag):
        return sum(a * b for a, b in zip(samples[:-lag], samples[lag:]))

    assert got[(0, 1)] == ac(1)
    assert got[(0, 2)] == ac(2)
    # malformed payload -> NULL ac rows, task survives
    assert got[(1, 1)] is None and got[(1, 2)] is None
