"""Quantify the un-ported Kahan/Welford compensation (VERDICT r1 item
#10): the "documented tolerance" becomes a *property* — Spark's plain
partitioned double summation stays within the Higham forward-error
bound encoded in aggregates.mean_error_bound, on adversarial float
sequences and any partitioning."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from amadeus_spark.operators.aggregates import mean_error_bound

#: slack over the first-order bound (it drops O(u²) terms)
SLACK = 1.25

finite_floats = st.floats(
    min_value=-1e18, max_value=1e18, allow_nan=False, allow_infinity=False
)


def _partitioned_sum(xs: list[float], n_parts: int) -> float:
    """Spark's summation topology in miniature: sequential partial sum
    per partition, then sequential merge of partials — a re-bracketing
    of recursive summation (same error class)."""
    parts = [xs[i::n_parts] for i in range(n_parts)]
    partials = []
    for p in parts:
        s = 0.0
        for x in p:
            s += x
        partials.append(s)
    total = 0.0
    for s in partials:
        total += s
    return total


@given(st.lists(finite_floats, min_size=2, max_size=300), st.integers(1, 32))
@settings(max_examples=300, deadline=None)
def test_partitioned_mean_within_bound(xs, n_parts):
    n = len(xs)
    exact_sum = math.fsum(xs)
    sum_abs = math.fsum(abs(x) for x in xs)
    approx_mean = _partitioned_sum(xs, n_parts) / n
    exact_mean = exact_sum / n
    assert abs(approx_mean - exact_mean) <= SLACK * mean_error_bound(n, sum_abs) + 1e-300


@given(st.lists(finite_floats, min_size=2, max_size=120), st.integers(1, 8), st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_partitioning_invariance_of_bound(xs, p1, p2):
    """Two different partitionings both sit within the bound of the SAME
    exact value — so any two cluster layouts agree within 2× the bound
    (the reference's par/dist parity discipline, tolerance-quantified)."""
    n = len(xs)
    sum_abs = math.fsum(abs(x) for x in xs)
    exact = math.fsum(xs) / n
    tol = SLACK * mean_error_bound(n, sum_abs) + 1e-300
    assert abs(_partitioned_sum(xs, p1) / n - exact) <= tol
    assert abs(_partitioned_sum(xs, p2) / n - exact) <= tol


def test_spark_mean_within_bound_adversarial(spark):
    """The real engine on canonical cancellation-adversarial data: large
    opposite magnitudes hiding a small true mean. Asserts Spark's avg is
    within mean_error_bound of the fsum-exact mean."""
    from pyspark.sql import functions as F

    cases = [
        [1e16, 1.0, -1e16] * 50,
        [1e15, -1e15, 3.14159] * 100,
        [2.0**52, 1.0, 1.0, -(2.0**52)] * 25,
    ]
    for xs in cases:
        n = len(xs)
        exact = math.fsum(xs) / n
        sum_abs = math.fsum(abs(x) for x in xs)
        df = spark.createDataFrame([(x,) for x in xs], "v double").repartition(8)
        got = df.agg(F.avg("v").alias("m")).collect()[0].m
        assert abs(got - exact) <= SLACK * mean_error_bound(n, sum_abs)
