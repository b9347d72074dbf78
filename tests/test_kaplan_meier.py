"""Kaplan–Meier time-to-event: textbook hand-check with censoring."""

import math
from datetime import datetime, timedelta

from dachshund_spark.relational import kaplan_meier

T0 = datetime(2024, 1, 1)


def _ev(user, hours, etype):
    return (user, T0 + timedelta(hours=hours), etype)


def test_textbook_curve_with_censoring(spark):
    # users 1,2 convert at t=1h; user 3 converts at t=3h; user 4 never
    # converts, censored at t=2h; user 5 never converts, censored at 5h
    rows = [
        _ev(1, 0, "view"), _ev(1, 1, "purchase"),
        _ev(2, 0, "view"), _ev(2, 1, "purchase"),
        _ev(3, 0, "view"), _ev(3, 3, "purchase"),
        _ev(4, 0, "view"), _ev(4, 2, "view"),
        _ev(5, 0, "view"), _ev(5, 5, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.t: r for r in kaplan_meier(df).collect()}
    assert set(out) == {1, 2, 3, 5}
    # t=1: 5 at risk, 2 deaths → S = 3/5
    assert (out[1].n_risk, out[1].n_events) == (5, 2)
    assert out[1].log_surv_e8 == round(math.log(1 - 2 / 5) * 1e8)
    # t=2: censoring only — no death, survival unchanged
    assert (out[2].n_risk, out[2].n_events) == (3, 0)
    assert out[2].log_surv_e8 == out[1].log_surv_e8
    # t=3: 2 at risk, 1 death → S = 3/5 · 1/2
    assert (out[3].n_risk, out[3].n_events) == (2, 1)
    assert out[3].log_surv_e8 == out[1].log_surv_e8 + round(
        math.log(1 - 1 / 2) * 1e8
    )
    # t=5: the last user is censored; survival never hits zero
    assert (out[5].n_risk, out[5].n_events) == (1, 0)
    assert out[5].log_surv_e8 == out[3].log_surv_e8


def test_everyone_converts_hits_zero(spark):
    rows = [
        _ev(1, 0, "view"), _ev(1, 1, "purchase"),
        _ev(2, 0, "view"), _ev(2, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = kaplan_meier(df).collect()
    assert len(out) == 1
    r = out[0]
    # d == n: exact zero survival → NULL log from this row on
    assert (r.t, r.n_risk, r.n_events, r.log_surv_e8) == (1, 2, 2, None)
