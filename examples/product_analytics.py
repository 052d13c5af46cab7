"""Event-stream product analytics end-to-end — the warehouse-analytics
family added beyond the reference, composed over one events scan:

  events ──► funnel (view → click → purchase, 24 h window)
     │
     ├────► cohort retention triangle (1-day periods, rare events)
     │
     ├────► trailing 1-hour per-(type, user) RANGE-frame aggregates
     │
     └────► hypertable gap-fill: 15-min grid, LOCF + linear interp

Run against any testdata scale:

    python examples/product_analytics.py [sf_dir]

Every stage here is also a hash-gated driver query (funnel_steps,
cohort_retention, rolling_window, gap_fill_events) — this example just
shows them composed the way a product team would read them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amadeus_spark import get_spark
from amadeus_spark.operators import timeseries
from amadeus_spark.tables import load_events

DAY_US = 24 * 3600 * 1_000_000


def main(sf_dir: str) -> None:
    spark = get_spark("product_analytics")
    ev = load_events(spark, sf_dir)

    print("== conversion funnel (24h window) ==")
    for r in timeseries.funnel(ev).collect():
        mean_lag_m = (
            r["total_lag_us"] / r["n_users"] / 60e6 if r["n_users"] else 0.0
        )
        print(
            f"  {r['stage']}. {r['step']:<9} {r['n_users']:>6} users"
            f"  mean entry→step lag {mean_lag_m:7.1f} min"
        )

    print("== cohort retention (1-day periods, value > 28 events) ==")
    tri = timeseries.cohort_retention(
        ev.filter(F.col("value") > 28.0), period_us=DAY_US
    ).collect()
    cohorts = sorted({r["cohort"] for r in tri})
    cells = {(r["cohort"], r["offset"]): r["n_users"] for r in tri}
    width = max(r["offset"] for r in tri) + 1
    for c in cohorts:
        row = " ".join(f"{cells.get((c, o), 0):>5}" for o in range(width))
        print(f"  cohort {c:>3}: {row}")

    print("== trailing 1-hour load, busiest (type,user) series ==")
    roll = timeseries.rolling_window_stats(ev)
    top = (
        roll.groupBy("event_type", "user_id")
        .agg(F.max("n_win").alias("peak_1h"))
        .orderBy(F.desc("peak_1h"), "event_type", "user_id")
        .limit(5)
        .collect()
    )
    for r in top:
        print(
            f"  {r['event_type']:<10} user {r['user_id']:>5}"
            f"  peak {r['peak_1h']} events/hour"
        )

    print("== gap-filled 15-min series (value > 15 events) ==")
    filled = timeseries.gap_fill(ev.filter(F.col("value") > 15.0))
    stats = (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.sum(F.col("observed").cast("long")).alias("observed"),
        )
        .orderBy("event_type")
        .collect()
    )
    for r in stats:
        pct = 100.0 * r["observed"] / r["buckets"]
        print(
            f"  {r['event_type']:<10} {r['buckets']:>6} buckets,"
            f" {pct:5.1f}% observed (rest LOCF/interpolated)"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
