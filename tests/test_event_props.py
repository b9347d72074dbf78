"""props JSON rollup, hourly chi-square, nearest-centroid eval."""

import datetime

import pytest

from dachshund_spark.relational import hourly_uniformity, props_key_stats
from dachshund_spark.pipeline.clustering import nearest_centroid_eval


pytestmark = pytest.mark.quick


def test_props_key_stats(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0), 1, "a", 1.50, '{"k": 5}'),
        (2, datetime.datetime(2024, 1, 1, 1, 0), 2, "a", 2.25, '{"k": 7}'),
        (3, datetime.datetime(2024, 1, 1, 2, 0), 1, "b", 4.00, '{"k": 15}'),
        (4, datetime.datetime(2024, 1, 1, 3, 0), 3, "b", 9.99, '{"x": 1}'),
        (5, datetime.datetime(2024, 1, 1, 4, 0), 3, "b", 1.00, "not json"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r.bucket: (r.n_events, r.sum_cents, r.n_users)
        for r in props_key_stats(ev).collect()
    }
    assert got == {0: (2, 375, 2), 1: (1, 400, 1)}


def test_hourly_uniformity_spike_vs_uniform(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0)
    rows = []
    # 'spike': 24 events all at hour 0; 'flat': one event per hour
    for i in range(24):
        rows.append((i, base, 1, "spike", 0.0, "{}"))
        rows.append((100 + i, base + datetime.timedelta(hours=i), 1, "flat", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.event_type: (r.n, r.chi2_num, r.chi2) for r in hourly_uniformity(ev).collect()}
    # spike: 576·24² − 24·24² = 552·576
    assert got["spike"] == (24, 552 * 576, 552 * 576 / (24 * 24.0))
    # flat: 576·24 − 24·576 = 0
    assert got["flat"] == (24, 0, 0.0)


def test_nearest_centroid_separable(spark):
    rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)] + [
        (10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(5)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {(r.label, r.pred): r.n for r in nearest_centroid_eval(emb).collect()}
    assert got == {(0, 0): 5, (1, 1): 5}
