"""Priority sampling + rendezvous routing: Python replays and the HRW
movement invariant."""

import hashlib

from dachshund_spark.pipeline.curate import priority_sample, rendezvous_shards


def _md5_40(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 40)


def test_priority_sample_replay(spark):
    rows = [(i, (i * 37) % 500 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [(r.doc_id, r.w, r.priority) for r in
           priority_sample(df, 10, "w").collect()]
    pri = {
        i: (w * (1 << 40)) // (_md5_40(f"pri0#{i}") + 1) for i, w in rows
    }
    want = sorted(rows, key=lambda t: (-pri[t[0]], t[0]))[:10]
    assert got == [(i, w, pri[i]) for i, w in want]


def test_priority_sample_heavy_weight_always_wins(spark):
    # one weight is 2^22, the rest 1: max priority of a unit weight is
    # 2^40 while the heavy row's is ≥ 2^62/2^40 ≈ 2^22·2^40/2^40 — the
    # heavy row's priority floor (w·2^40 / 2^40 = w·1) still exceeds
    # every unit row's ceiling only when h is small, so check via replay
    rows = [(i, 1) for i in range(50)] + [(999, 1 << 22)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in priority_sample(df, 5, "w").collect()}
    pri = {i: (w * (1 << 40)) // (_md5_40(f"pri0#{i}") + 1) for i, w in rows}
    want = set(sorted(pri, key=lambda i: (-pri[i], i))[:5])
    assert got == want and 999 in got


def test_rendezvous_movement_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = rendezvous_shards(df, 8, removed=3).collect()
    moved = [r for r in out if r.shard != r.shard_after]
    # a key moves iff its winner was the removed shard
    assert all(r.shard == 3 for r in moved)
    assert all(r.shard_after != 3 for r in out)
    # every key on shard 3 moved somewhere else
    assert {r.shard for r in out} == set(range(8))
    # replay a handful against the packed argmax
    for r in out[:20]:
        packs = [
            _md5_40(f"hrw0#{i}#{r.doc_id}") * 8 + i for i in range(8)
        ]
        assert r.shard == max(packs) % 8
        assert r.shard_after == max(p for p in packs if p % 8 != 3) % 8
