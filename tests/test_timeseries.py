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
