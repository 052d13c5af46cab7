"""gap_fill (operators/timeseries.py): crafted series with known gaps —
LOCF carries the last observation, interpolation hits exact midpoints,
bucket 0 anchors at the key's min ts, and results are invariant under
input partitioning."""

from __future__ import annotations

import datetime as dt

import pytest

from amadeus_spark.operators import timeseries

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def series(spark):
    # key 'a': observations in buckets 0, 1, 4 (gap of 2), values
    # chosen so the bucket-3 lerp midpoint is exact: 10 -> 40 over
    # buckets 1..4 gives 20, 30 at buckets 2, 3.
    # bucket 1 has TWO events — the later (ts) one must win.
    rows = [
        (1, _ts(0), "a", 5.0),
        (2, _ts(16), "a", 7.0),  # bucket 1, earlier
        (3, _ts(29), "a", 10.0),  # bucket 1, later -> wins
        (4, _ts(64), "a", 40.0),  # bucket 4
        # key 'b': single observation -> grid is exactly one bucket
        (5, _ts(3), "b", 2.5),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _collect(df):
    return {
        (r["event_type"], r["bucket_idx"]): r for r in df.collect()
    }


def test_locf_and_lerp_exact(spark, series):
    out = _collect(timeseries.gap_fill(series))
    assert len(out) == 6  # a: buckets 0..4, b: bucket 0
    a2, a3 = out[("a", 2)], out[("a", 3)]
    assert not a2["observed"] and not a3["observed"]
    assert a2["v_locf"] == 10.0 and a3["v_locf"] == 10.0
    assert a2["v_lerp"] == 20.0 and a3["v_lerp"] == 30.0
    assert out[("a", 1)]["v_locf"] == 10.0  # later event won the bucket
    assert out[("a", 0)]["observed"] and out[("a", 0)]["v_locf"] == 5.0
    assert out[("b", 0)]["observed"] and out[("b", 0)]["v_lerp"] == 2.5


def test_observed_buckets_pass_through(spark, series):
    out = _collect(timeseries.gap_fill(series))
    for key, r in out.items():
        if r["observed"]:
            assert r["v_locf"] == r["v_lerp"], key


def test_partitioning_invariance(spark, series):
    a = sorted(map(str, timeseries.gap_fill(series.repartition(1)).collect()))
    b = sorted(map(str, timeseries.gap_fill(series.repartition(7)).collect()))
    assert a == b


@pytest.fixture(scope="module")
def funnel_events(spark):
    h = 60  # minutes
    rows = [
        # u1 full conversion: view 0h, click 1h, purchase 2h
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(1 * h), 1, "click", 0.0),
        (3, _ts(2 * h), 1, "purchase", 0.0),
        # u2: click BEFORE view — must not count as converted
        (4, _ts(1 * h), 2, "click", 0.0),
        (5, _ts(2 * h), 2, "view", 0.0),
        # u3: click outside the 24h window from entry
        (6, _ts(0), 3, "view", 0.0),
        (7, _ts(25 * h), 3, "click", 0.0),
        # u4: two clicks after view — FIRST one sets the step time,
        # purchase between them converts only if after the first click
        (8, _ts(0), 4, "view", 0.0),
        (9, _ts(1 * h), 4, "click", 0.0),
        (10, _ts(90), 4, "purchase", 0.0),  # 1.5h, after first click
        (11, _ts(3 * h), 4, "click", 0.0),
        # u5: purchase with no click — stops at view
        (12, _ts(0), 5, "view", 0.0),
        (13, _ts(1 * h), 5, "purchase", 0.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )


def test_funnel_exact(spark, funnel_events):
    out = {r["step"]: r for r in timeseries.funnel(funnel_events).collect()}
    assert out["view"]["n_users"] == 5  # every user has a view
    assert out["click"]["n_users"] == 2  # u1, u4 (u2 order, u3 window)
    assert out["purchase"]["n_users"] == 2  # u1, u4
    # u1 lag 2h, u4 lag 1.5h from entry -> 3.5h total in µs
    assert out["purchase"]["total_lag_us"] == int(3.5 * 3600 * 1e6)
    assert out["view"]["total_lag_us"] == 0


def test_rolling_window_frame_semantics(spark):
    """Trailing 1-hour frame: events at 0, 30, 59.5, 61 min — the
    61-min event's frame drops the t=0 event (61 - 60 > window-1µs
    back) but keeps 30 and 59.5; ties share frames (RANGE peers)."""
    rows = [
        (1, _ts(0), "a", 1.0),
        (2, _ts(30), "a", 2.0),
        (3, _ts(59.5), "a", 4.0),
        (4, _ts(61), "a", 8.0),
        (5, _ts(61), "a", 16.0),  # tie with event 4 -> same frame
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        r["event_id"]: r
        for r in timeseries.rolling_window_stats(
            ev, keys=("event_type",)
        ).collect()
    }
    assert out[1]["n_win"] == 1 and out[1]["v_win"] == 1.0
    assert out[3]["n_win"] == 3 and out[3]["v_win"] == 7.0
    # 61-min frame: [1min+1µs .. 61min] -> drops t=0, includes both ties
    assert out[4]["n_win"] == 4 and out[4]["v_win"] == 30.0
    assert out[5]["n_win"] == 4 and out[5]["v_win"] == 30.0  # peer rows agree


def test_cohort_retention_triangle(spark):
    d = 24 * 60  # minutes per day, period = 1 day
    rows = [
        # u1 first day 0, active days 0, 1, 3
        (1, _ts(0), 1), (2, _ts(1 * d), 1), (3, _ts(3 * d), 1),
        # u2 first day 0, active day 0 only
        (4, _ts(10), 2),
        # u3 first day 2, active days 2, 3
        (5, _ts(2 * d), 3), (6, _ts(3 * d + 5), 3),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in timeseries.cohort_retention(
            ev, period_us=24 * 3600 * 1_000_000
        ).collect()
    }
    assert out == {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 3): 1,  # u1
        (2, 0): 1,  # u3
        (2, 1): 1,  # u3
    }
