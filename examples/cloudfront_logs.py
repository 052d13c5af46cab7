"""The reference's flagship example re-expressed Spark-first.

Reference (examples/cloudfront_logs.rs:31-45): read CloudFront access
logs from S3, then in ONE pass take a 10-row reservoir sample AND a
per-hour request histogram via ``fork``.

Here: spark.read.text over s3a:// (or a local dir), the W3C parse as
column expressions, and fork = persist + two actions (or a single
``agg`` when both sinks aggregate). Run against any CloudFront log dir:

    python examples/cloudfront_logs.py /path/to/logs
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from amadeus_spark import get_spark
from amadeus_spark.operators import aggregates, sampling
from amadeus_spark.sources import cloudfront


def main(path: str) -> None:
    spark = get_spark("cloudfront_logs_example")
    rows = cloudfront.read_cloudfront(spark, path)

    sample, histogram = aggregates.fork(
        rows,
        lambda df: sampling.reservoir_sample(df, 10, seed=42).collect(),
        lambda df: cloudfront.hourly_histogram(df).collect(),
    )

    print(f"sample ({len(sample)} rows):")
    for r in sample[:3]:
        print("  ", r.time, r.remote_ip, r.url)
    print("hourly histogram:")
    for r in histogram:
        print("  ", r.hour, r.requests)

    # The reference's EXACT flagship shape — request count AND a bounded
    # deterministic sample PER HOUR in one aggregation pass (group_by with
    # a nested (count, sample) sink, examples/cloudfront_logs.rs:33-40) —
    # is ONE group_by_sink call: no persist, no second action, state
    # bounded per partition.
    from pyspark.sql import functions as F

    from amadeus_spark.operators import group_sink as gs

    per_hour = gs.group_by_sink(
        rows.withColumn("hour", F.date_trunc("hour", "time")),
        ["hour"],
        {"requests": gs.count(), "sampled_ips": gs.sample_k("remote_ip", 3)},
    ).orderBy("hour")
    print("one-pass per-hour count + sample:")
    for r in per_hour.collect():
        print("  ", r.hour, r.requests, list(r.sampled_ips))

    # Same query once more through the fluent facade (amadeus_spark.flow)
    # — reads character-for-character like the reference's
    # source.par_stream().fork(sample, histogram) chain:
    from amadeus_spark.flow import Flow

    sample2, histogram2 = (
        Flow(rows)
        .update(hour=F.date_trunc("hour", "time"))
        .fork(
            lambda df: sampling.reservoir_sample(df, 10, seed=42).collect(),
            lambda df: cloudfront.hourly_histogram(df).collect(),
        )
    )
    assert [r.asDict() for r in histogram2] == [r.asDict() for r in histogram]
    print(f"flow facade: same histogram, sample of {len(sample2)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cloudfront_logs")
