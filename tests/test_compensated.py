"""compensated_moments — the opt-in Kahan/Welford parity path
(reference: par_sink/mean.rs:47-69 Kahan sum, stddev.rs:46-72 Welford).

Acceptance posture mirrors the reference's own numeric discipline:
the compensated result must match the exactly-rounded fsum ground
truth to ~1e-12 relative, INCLUDING on adversarial sequences where
Spark's plain partitioned double sum (summary_agg / F.avg) loses the
answer entirely — that contrast is the test that the compensation is
real, not decorative.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from amadeus_spark.operators.aggregates import compensated_moments


def _exact(xs: list[float]) -> tuple[int, float, float, float]:
    n = len(xs)
    total = math.fsum(xs)
    mean = total / n
    var = math.fsum((x - mean) ** 2 for x in xs) / n
    return n, total, mean, var


def _run(spark, xs: list[float], n_parts: int):
    df = spark.createDataFrame(
        [(float(x),) for x in xs], "v double"
    ).repartition(n_parts)
    return compensated_moments(df, "v").collect()[0]


def test_matches_fsum_ground_truth(spark):
    rng = np.random.default_rng(7)
    xs = (rng.standard_normal(20_000) * 1e6 + 3.0).tolist()
    n, total, mean, var = _exact(xs)
    row = _run(spark, xs, 13)
    assert row["n"] == n
    assert abs(row["total"] - total) <= 1e-12 * abs(total)
    assert abs(row["mean"] - mean) <= 1e-12 * abs(mean)
    assert abs(row["var_pop"] - var) <= 1e-9 * abs(var)
    assert row["stddev_pop"] == pytest.approx(math.sqrt(var), rel=1e-9)


def test_adversarial_mean_where_plain_sum_collapses(spark):
    """[1e16, 1.0 ×100k, -1e16]: each +1.0 vanishes into 1e16 under
    sequential accumulation (eps(1e16)=2), so Spark's plain avg returns
    ~0 when the big values land first in their partition; the
    compensated path recovers the true mean ≈ 1.0."""
    xs = [1e16] + [1.0] * 100_000 + [-1e16]
    n, total, mean, _ = _exact(xs)
    assert mean == pytest.approx(1.0, rel=1e-4)

    # one partition => worst-case sequential order for the plain sum
    df = spark.createDataFrame(
        [(float(x),) for x in xs], "v double"
    ).coalesce(1)
    plain = df.agg(F.avg("v").alias("m")).collect()[0]["m"]
    comp = compensated_moments(df, "v").collect()[0]

    assert abs(plain - mean) / abs(mean) > 0.5  # plain sum lost it
    assert comp["n"] == n
    assert abs(comp["mean"] - mean) <= 1e-6 * abs(mean)
    assert abs(comp["total"] - total) <= 1e-6 * max(abs(total), 1.0)


def test_variance_cancellation_resistance(spark):
    """Huge-offset data (mean 1e9, stddev 1e-2): the naive
    sum-of-squares formula cancels catastrophically; the Welford/Chan
    merge keeps full relative accuracy at any partitioning."""
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(50_000) * 1e-2
    xs = (1e9 + noise).tolist()
    _, _, _, var = _exact(xs)
    for n_parts in (1, 7, 32):
        row = _run(spark, xs, n_parts)
        assert row["var_pop"] == pytest.approx(var, rel=1e-6), n_parts


def test_deterministic_across_runs_same_partitioning(spark):
    rng = np.random.default_rng(3)
    xs = (rng.standard_normal(5_000) * 1e8).tolist()
    df = spark.createDataFrame(
        [(float(x),) for x in xs], "v double"
    ).repartition(8)
    a = compensated_moments(df, "v").collect()[0]
    b = compensated_moments(df, "v").collect()[0]
    # bit-identical, not approx: the final merge sorts by partition id
    assert (a["total"], a["mean"], a["var_pop"]) == (
        b["total"],
        b["mean"],
        b["var_pop"],
    )


def test_nulls_dropped_and_empty_input(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,)], "v double"
    ).repartition(3)
    row = compensated_moments(df, "v").collect()[0]
    assert row["n"] == 2
    assert row["mean"] == pytest.approx(2.0)
    assert row["var_pop"] == pytest.approx(1.0)

    empty = spark.createDataFrame([], "v double")
    row = compensated_moments(empty, "v").collect()[0]
    assert row["n"] == 0
    # SQL NULLs, not NaN doubles — the docstring's promise, and what an
    # oracle twin would need (None vs nan stringify differently).
    for c in ("total", "mean", "var_pop", "stddev_pop"):
        assert row[c] is None, (c, row[c])


def test_final_stage_is_tiny_not_global(spark):
    """The scan stays parallel: only the one-row-per-partition partials
    frame is repartition(1)'d — the plan must NOT coalesce the source
    read into a single task."""
    df = (
        spark.range(0, 100_000, 1, 16)
        .select(F.col("id").cast("double").alias("v"))
    )
    plan = compensated_moments(df, "v")._jdf.queryExecution().executedPlan().toString()
    # two mapInPandas stages with an exchange between them
    assert plan.count("MapInPandas") == 2
    assert "Coalesce" not in plan
