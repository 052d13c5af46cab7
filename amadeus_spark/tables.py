"""Test-table registry: the driver's deterministic TPC-H-ish star schema
(/root/testdata/sf*/ — see TESTDATA.md) plus ``documents`` and
``embeddings`` for the LLM-pipeline operators.

At 100 TB these would be partitioned/ bucketed tables in a lakehouse; here
each is one parquet file. We still express reads so Catalyst gets full
pushdown: ``spark.read.parquet`` + lazy registration as temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic SF.
#: region/nation are bounded by geography; supplier/part grow with SF but
#: remain << fact tables — at 100 TB, revisit part/supplier per actual size.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Schema-adaptive events reader. The testdata's ``ts`` encoding has
    changed across regenerations (TIMESTAMP(NANOS) in earlier drops,
    ``timestamp[us]`` now), so branch on the dtype Spark actually sees
    rather than hard-coding one physical type:

    - TIMESTAMP(NANOS) parquet is rejected by Spark's reader unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case it
      arrives as ``bigint`` nanos → derive µs with exact integer division
      (ns values ~1.7e18 exceed double precision — never divide as float).
    - ``timestamp`` / ``timestamp_ntz`` (µs-precision parquet) → use the
      column as-is; Spark already reads it at µs precision.
    """
    from pyspark.sql import functions as F

    # Harmless for µs data; required to even *read* TIMESTAMP(NANOS).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type.startswith("timestamp"):
        return raw
    raise TypeError(f"events.ts has unsupported dtype {ts_type!r}")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every test table lazily; optionally register temp views so the
    SQL API sees the same names the DuckDB oracle uses."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_events(spark, sf_dir) if name == "events" else spark.read.parquet(path)
        dfs[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return dfs
