"""TDigest quantile-sketch guarantees: rank-error bound, mergeability,
bounded state — the mergeable-sketch invariants (reference
amadeus-streaming traits family)."""

from __future__ import annotations

import random

import pytest

from amadeus_spark.functions.sketch_lib import TDigest, quantile_sketch

QS = (0.01, 0.1, 0.5, 0.9, 0.99)


def _rank_err(est: float, values: list[float], q: float) -> float:
    import bisect

    values = sorted(values)
    r = bisect.bisect_left(values, est) / len(values)
    return abs(r - q)


def test_rank_error_bound_local():
    rng = random.Random(7)
    vals = [rng.lognormvariate(0, 1.5) for _ in range(20000)]
    d = TDigest(100)
    d.push_sorted(sorted(vals))
    for q in QS:
        assert _rank_err(d.quantile(q), vals, q) <= 0.02, q


def test_merge_matches_single_build():
    rng = random.Random(11)
    vals = [rng.gauss(0, 10) for _ in range(30000)]
    parts = [vals[i::7] for i in range(7)]
    merged = TDigest(100)
    for p in parts:
        d = TDigest(100)
        d.push_sorted(sorted(p))
        merged.merge(d)
    assert merged.total == len(vals)
    for q in QS:
        assert _rank_err(merged.quantile(q), vals, q) <= 0.03, q


def test_state_bounded():
    rng = random.Random(3)
    d = TDigest(100)
    for _ in range(20):
        d.push_sorted(sorted(rng.random() for _ in range(5000)))
    # centroid count stays O(compression) no matter how much data
    assert len(d.centroids) <= 2 * 100


def test_distributed_sketch_error(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    vals = [r["l_extendedprice"] for r in df.select("l_extendedprice").collect()]
    d = quantile_sketch(df.repartition(13), "l_extendedprice", 100)
    assert d.total == len(vals)
    for q in QS:
        assert _rank_err(d.quantile(q), vals, q) <= 0.03, q
