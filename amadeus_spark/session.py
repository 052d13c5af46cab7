"""SparkSession factory, tuned for both local testing and cluster scale.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the config
below is chosen so the *same* logical plans would hold on a 1000-executor
cluster reading 100 TB:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is superseded by AQE's coalescing from an intentionally
  high initial number.
- Arrow enabled so the Pandas-UDF slow path is batch-vectorized.
- Broadcast threshold left at default (10 MB) — dimension tables
  (region/nation/supplier/part at any SF where they fit) broadcast;
  fact-fact joins shuffle on their keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.shuffle.partitions": None,  # filled from cpus at build time
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # testdata events.parquet uses TIMESTAMP(NANOS); read as long ns
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "48g",
    # At 100 TB the scan parallelism comes from file splits; keep the
    # default 128 MB split size (maxPartitionBytes) — small local files
    # still give one task per file.
}


def get_spark(app_name: str = "amadeus_spark", **overrides: str) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    Any ``overrides`` are applied last, so tests can pin configs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    ncpu = os.cpu_count() or 8 if cpus == "*" else int(cpus)
    conf["spark.sql.shuffle.partitions"] = str(ncpu)
    conf["spark.default.parallelism"] = str(ncpu)
    conf.update(overrides)
    for k, v in conf.items():
        if v is not None:
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
