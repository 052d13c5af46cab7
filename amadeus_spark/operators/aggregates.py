"""Terminal aggregations — SURVEY.md §2.4.

The reference's UDAF contract is FolderSync {zero, push, done} +
CombinerSync {combine} (amadeus-core/src/par_sink/folder.rs:63-71,
combiner.rs:54-58), run partial-per-thread then merged at the driver.
Spark's HashAggregate partial/final is the same topology with a real
exchange, so every reference aggregation maps to a built-in expression —
JVM-side, codegen'd, mergeable, spill-aware (the reference's group_by
held all state in one IndexMap in memory, group_by.rs:146; Spark spills).

``fork`` / tuple sinks (par_sink/fork.rs, tuple.rs) — several sinks in one
pass — map to a single ``df.agg(e1, e2, ...)`` (one scan, one partial/final
pass) or ``df.groupBy(k).agg(...)`` for the grouped form.

Notes on semantics preserved:
- ``mean`` in the reference is Kahan-compensated (par_sink/mean.rs:47-69);
  Spark's avg is a plain double sum/count. The hot path keeps the plain
  sum with a quantified bound (``mean_error_bound``); the opt-in
  ``compensated_moments`` matches-or-beats the reference's compensation
  (fsum partials + Chan merge) when the bound is not acceptable.
- ``stddev`` in the reference is **population** σ (divides by n,
  stddev.rs:62) → F.stddev_pop, not stddev_samp.
- ``histogram`` returns value→count sorted by value
  (par_sink/histogram.rs:54-110) → groupBy().count().orderBy(value).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: IEEE-754 double unit roundoff (2⁻⁵³).
MACHINE_EPS = 2.0**-53


def mean_error_bound(n: int, sum_abs: float) -> float:
    """The quantified "documented tolerance" for the un-ported Kahan
    compensation (reference mean.rs:47-97 / Welford stddev.rs:46-98):
    Spark's avg is plain recursive double summation (partials per
    partition, then a merge), whose forward error is bounded by
    |ŝ − s| ≤ (n−1)·u·Σ|xᵢ| to first order (Higham, *Accuracy and
    Stability of Numerical Algorithms*, §4.2 — standard public result);
    the partitioned merge is a re-bracketing of the same sum, so the
    bound holds for any partitioning. For the MEAN, divide by n and add
    two more u·|mean| ≤ u·Σ|x|/n terms for the final division's roundoff
    on each side of a comparison — (n+1)·u·Σ|x|/n total. Kahan would
    tighten (n−1)·u to 2u; we accept the looser bound and *test* it
    (tests/test_float_tolerance.py) instead of porting compensation into
    the JVM hot path."""
    if n <= 1:
        return 0.0
    return (n + 1) * MACHINE_EPS * sum_abs / n


def summary_agg(df: DataFrame, col: str) -> DataFrame:
    """One-pass multi-aggregate (reference: tuple sinks / ``fork``,
    par_sink/tuple.rs:57+, fork.rs:24-121): count, sum, mean, population
    stddev, min, max of a numeric column in a single scan."""
    c = F.col(col)
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(c).alias("total"),
        F.avg(c).alias("mean"),
        F.stddev_pop(c).alias("stddev"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
    )


def histogram(df: DataFrame, col: str) -> DataFrame:
    """Exact value→count, sorted by value (par_sink/histogram.rs:37-110)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).orderBy(col)


def max_by(df: DataFrame, value_col: str, ord_col: str) -> DataFrame:
    """max_by/min_by (par_stream.rs:268-292; par_sink/max.rs) → F.max_by."""
    return df.agg(F.max_by(value_col, ord_col).alias("max_by_val"))


def min_by(df: DataFrame, value_col: str, ord_col: str) -> DataFrame:
    return df.agg(F.min_by(value_col, ord_col).alias("min_by_val"))


def compensated_moments(df: DataFrame, col: str) -> DataFrame:
    """Compensated count/sum/mean/variance — the reference's numeric
    behavior (Kahan-compensated sum/mean, par_sink/mean.rs:47-69;
    Welford-style stddev, par_sink/stddev.rs:46-72) re-expressed as
    Spark's two-level topology rather than ported as a sequential fold:

    - **Per-partition partials** (Arrow-batched ``mapInPandas``): each
      batch contributes an exactly-rounded ``math.fsum`` sum and a
      centered second moment; batches merge into the partition state
      with Chan's parallel-variance formula. This is strictly tighter
      than the reference's sequential Kahan loop per thread (fsum is
      error-free per batch; Kahan is 2u per element).
    - **Deterministic final merge**: the per-partition rows (ONE row per
      partition — the same tiny-final-stage shape as the percentile
      cut-point pattern) are repartition(1)'d and merged in sorted
      partition-id order, so the result is bit-identical across runs of
      the same partitioning regardless of task scheduling — a guarantee
      the reference's thread-race merge order cannot make.

    This is the documented slow path for when ``summary_agg``'s plain
    double sums (error bound: ``mean_error_bound``) are not acceptable;
    it keeps ``summary_agg`` JVM-side and codegen'd for the hot path.

    Output (1 row): n BIGINT, total/mean/var_pop/stddev_pop DOUBLE.
    Nulls/NaNs are dropped (SQL aggregate semantics); an empty input
    yields n=0 with NULL moments.
    """
    import math

    import numpy as np
    import pandas as pd

    part_schema = "pid bigint, n bigint, psum double, mean double, m2 double"

    def _chan(n, mean, m2, nb, mb, m2b):
        if nb == 0:
            return n, mean, m2
        if n == 0:
            return nb, mb, m2b
        tot = n + nb
        d = mb - mean
        return (
            tot,
            mean + d * nb / tot,
            m2 + m2b + d * d * n * nb / tot,
        )

    def _partials(batches):
        pid = -1
        n, mean, m2 = 0, 0.0, 0.0
        batch_sums: list[float] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            v = pdf["__v"].to_numpy(dtype="float64")
            v = v[~np.isnan(v)]
            if v.size == 0:
                continue
            s = math.fsum(v)
            batch_sums.append(s)
            mb = s / v.size
            m2b = float(np.sum((v - mb) ** 2))
            n, mean, m2 = _chan(n, mean, m2, int(v.size), mb, m2b)
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "n": [n],
                    "psum": [math.fsum(batch_sums)],
                    "mean": [mean],
                    "m2": [m2],
                }
            )

    def _final(batches):
        chunks = [b for b in batches if len(b)]
        rows = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame()
        )
        if len(rows) == 0:
            # nullable Float64 + pd.NA so Arrow emits SQL NULLs, not NaN
            # doubles — None vs nan stringify differently (iron rule 9),
            # and the docstring promises NULL moments on empty input.
            null = pd.array([pd.NA], dtype="Float64")
            yield pd.DataFrame(
                {
                    "n": pd.array([0], dtype="int64"),
                    "total": null,
                    "mean": null,
                    "var_pop": null,
                    "stddev_pop": null,
                }
            )
            return
        rows = rows.sort_values("pid")
        n, mean, m2 = 0, 0.0, 0.0
        for r in rows.itertuples():
            n, mean, m2 = _chan(n, mean, m2, int(r.n), r.mean, r.m2)
        total = math.fsum(rows["psum"].to_numpy(dtype="float64"))
        var = m2 / n
        yield pd.DataFrame(
            {
                "n": pd.array([n], dtype="int64"),
                "total": [total],
                "mean": [total / n],
                "var_pop": [var],
                "stddev_pop": [math.sqrt(var)],
            }
        )

    partials = (
        df.select(
            F.spark_partition_id().alias("__pid"),
            F.col(col).cast("double").alias("__v"),
        )
        .mapInPandas(_partials, schema=part_schema)
        # repartition(1), NOT coalesce(1): coalesce propagates upstream
        # and would collapse the scan itself into one task.
        .repartition(1)
    )
    return partials.mapInPandas(
        _final,
        schema=(
            "n bigint, total double, mean double,"
            " var_pop double, stddev_pop double"
        ),
    )


def group_agg(
    df: DataFrame, keys: Sequence[str], exprs: Sequence[Column]
) -> DataFrame:
    """``group_by(sink)`` (par_sink/group_by.rs:23-91): any aggregation per
    key. Arbitrary agg expressions cover the reference's nested-sink
    generality for everything except per-group *collection* sinks, which
    map to collect_list/collect_set or applyInPandas."""
    return df.groupBy(*keys).agg(*exprs)


def fork(df: DataFrame, sink_a, sink_b):
    """One pass, two sinks (par_stream.rs:521-547, par_sink/fork.rs:24-121;
    flagship use: examples/cloudfront_logs.rs:33-40 — reservoir sample +
    hourly histogram over one S3 read).

    When both sinks are aggregations, express them as one ``df.agg(...)``
    instead — single scan, no materialization. This helper covers the
    mixed case (collect-like + aggregate): persist once so the source is
    read once, run both actions, unpersist. At 100 TB choose
    StorageLevel/checkpoint consciously; the documented divergence
    (SURVEY §7 hard part #3) is that Spark materializes where the
    reference streamed both sinks in one pull.

    Each sink callable MUST trigger its action (collect/count/write)
    before returning — the persist is released when this function exits,
    so a lazily-returned DataFrame would re-scan the source when finally
    evaluated."""
    df = df.persist()
    try:
        return sink_a(df), sink_b(df)
    finally:
        df.unpersist()


def all_match(df: DataFrame, predicate: Column) -> bool:
    """Short-circuiting ∀ (par_sink/all.rs:18-80): no row violates the
    predicate. Spark short-circuits via isEmpty's limit-1 scan."""
    return df.filter(~predicate).isEmpty()


def any_match(df: DataFrame, predicate: Column) -> bool:
    """Short-circuiting ∃ (par_sink/any.rs:18-62)."""
    return not df.filter(predicate).isEmpty()


def key_skew_profile(
    df: DataFrame, group_col: str, key_col: str, top_k: int = 10
) -> DataFrame:
    """Per-group key-skew diagnostics — the pre-join/pre-agg profiling
    pass a 100 TB pipeline runs BEFORE choosing a shuffle strategy
    (salting width, AQE skew thresholds, broadcast candidates). Per
    group: distinct keys, total rows, the heaviest key's row count, the
    row fraction covered by the top-k keys, and the skew factor
    max_key_rows x n_keys / n_rows (1.0 = perfectly uniform; the factor
    by which the hottest shuffle partition exceeds the average).

    Physical plan: ONE shuffle builds the (group, key) count frame; it
    feeds two consumers (full-group rollup + top-k), so it persists
    through the tracked registry. The top-k branch filters on a LITERAL
    row_number bound, so Spark's WindowGroupLimit rule truncates every
    map task to top_k rows per group BEFORE the window shuffle — the
    window never sees the full key frame (same discipline as
    mixture_sample). All outputs are exact integers plus two single
    IEEE divisions, so the DuckDB twin is bit-identical."""
    from pyspark.sql import Window

    from amadeus_spark.cache import tracked_persist

    per_key = tracked_persist(
        df.groupBy(group_col, key_col).agg(F.count(F.lit(1)).alias("c"))
    )
    overall = per_key.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("c"), F.asc(key_col))
    top = (
        per_key.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .groupBy(group_col)
        .agg(F.sum("c").cast("long").alias("topk_rows"))
    )
    return (
        overall.join(top, group_col)
        .select(
            group_col,
            "n_keys",
            "n_rows",
            "max_key_rows",
            (F.col("topk_rows") / F.col("n_rows")).alias("topk_frac"),
            (F.col("max_key_rows") * F.col("n_keys") / F.col("n_rows")).alias(
                "skew_factor"
            ),
        )
        .orderBy(group_col)
    )


def key_skew_profile_oracle(
    table: str, group_col: str, key_col: str, top_k: int = 10
) -> str:
    """DuckDB twin of key_skew_profile — same tie-break (count desc,
    key asc), same integer-then-one-division arithmetic."""
    return f"""
WITH per_key AS (
  SELECT {group_col} AS g, {key_col} AS k, COUNT(*) AS c
  FROM {table} GROUP BY 1, 2
), overall AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_rows, MAX(c) AS max_key_rows
  FROM per_key GROUP BY g
), top AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS topk_rows FROM (
    SELECT g, c, ROW_NUMBER() OVER (PARTITION BY g ORDER BY c DESC, k) AS rn
    FROM per_key
  ) WHERE rn <= {top_k} GROUP BY g
)
SELECT o.g AS {group_col}, n_keys, n_rows, max_key_rows,
       topk_rows / n_rows AS topk_frac,
       max_key_rows * n_keys / n_rows AS skew_factor
FROM overall o JOIN top t ON o.g = t.g ORDER BY 1
"""
