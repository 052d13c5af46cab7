"""Custom aggregation framework — the reference's FolderSync/CombinerSync
contract (par_sink/folder.rs:63-71: {zero, push, done}; combiner.rs:54-58:
associative combine), which is exactly Spark's Aggregator topology
(partial per task → merge → finish).

In PySpark the native form is the GROUPED_AGG pandas UDF: Spark runs it
per group with map-side partial application when possible, Arrow-batched.
For mergeable sketch state (the reference's UnionAssign), the streaming
variant is applyInPandasWithState (see streaming/events.py).

Hot-path warning (SURVEY §2.2): these are the *slow path* — built-in agg
expressions are codegen'd JVM; use a UDAF only when no expression exists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def sum_long_udaf(v: pd.Series) -> int:
    """fold (par_stream.rs:151-166) example: integer sum as an explicit
    UDAF — zero=0, push=+, merge=+ (Spark applies it per group)."""
    return int(v.sum())


@pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """count (par_sink/count.rs) as a UDAF — Spark disallows mixing
    GROUPED_AGG pandas UDFs with JVM aggregates in one agg, so the whole
    tuple sink goes through the pandas path."""
    return len(v)


@pandas_udf("double")
def mean_exact_udaf(v: pd.Series) -> float:
    """mean (par_sink/mean.rs) as a UDAF. The reference Kahan-compensates;
    over integral-valued doubles the plain sum is already exact, which
    keeps the result engine-portable for oracle checks."""
    return float(v.sum()) / len(v)


def grouped_custom_agg(df: DataFrame, key: str, value: str) -> DataFrame:
    """group_by(sink) with a custom sink (par_sink/group_by.rs): per-key
    count + UDAF sum + UDAF mean in one grouped pass."""
    return (
        df.groupBy(key)
        .agg(
            count_udaf(F.col(value)).alias("cnt"),
            sum_long_udaf(F.col(value).cast("long")).alias("udaf_sum"),
            mean_exact_udaf(F.col(value)).alias("udaf_mean"),
        )
        .orderBy(key)
    )
