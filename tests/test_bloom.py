"""Broadcast Bloom membership (functions/bloom.py): no false negatives,
bounded false positives, build invariance under partitioning, and the
self-checking decontamination twin vs the exact semi-join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amadeus_spark.functions import bloom
from amadeus_spark.functions.dedup import decontamination_stats
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def words(spark):
    members = [(f"member-{i}",) for i in range(2000)]
    others = [(f"other-{i}",) for i in range(4000)]
    return (
        spark.createDataFrame(members, "s string"),
        spark.createDataFrame(others, "s string"),
    )


def test_no_false_negatives_and_fp_band(spark, words):
    members, others = words
    spec = bloom.build_bloom(members, "s", capacity=2000, fp_rate=0.01)
    got = bloom.with_bloom_member(spark, members, "s", spec).agg(
        F.sum(F.col("bloom_member").cast("bigint")).alias("hits"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert got["hits"] == got["n"]  # NEVER miss an inserted value

    fp = bloom.with_bloom_member(spark, others, "s", spec).agg(
        F.avg(F.col("bloom_member").cast("double")).alias("rate")
    ).collect()[0]["rate"]
    assert fp <= 0.03  # 3x target: generous band, catches sizing bugs


def test_bitmap_invariant_under_partitioning(spark, words):
    members, _ = words
    a = bloom.build_bloom(members.repartition(1), "s", 2000, 0.01)
    b = bloom.build_bloom(members.repartition(13), "s", 2000, 0.01)
    assert a.bitmap == b.bitmap  # OR-merge is order/partition invariant
    assert a.m_bits == b.m_bits and a.k == b.k
    assert 0 < a.n_set_bits <= a.k * 2000


def test_build_collects_treed_partials_only(spark, words):
    """The driver-side merge must see ≤ ceil(partitions/fan_in) rows no
    matter how the probe set is partitioned — the executor-side OR level
    is what keeps a 100M-entry bitmap build off the driver."""
    import math

    members, _ = words
    m, k = bloom.optimal_params(2000, 0.01)
    for n_parts, fan_in in [(40, 8), (40, 64), (7, 2)]:
        states = bloom._reduced_partials(
            members.repartition(n_parts), "s", m, k, fan_in=fan_in
        )
        n_rows = states.count()
        assert n_rows <= math.ceil(n_parts / fan_in), (n_parts, fan_in, n_rows)
    # treed and flat builds produce the identical bitmap
    flat = bloom.build_bloom(members.repartition(3), "s", 2000, 0.01)
    treed = bloom.build_bloom(members.repartition(40), "s", 2000, 0.01, fan_in=8)
    assert flat.bitmap == treed.bitmap


def test_optimal_params_sane():
    m, k = bloom.optimal_params(100_000_000, 0.01)
    assert m % 64 == 0
    assert m / 8 / 1024 / 1024 == pytest.approx(114.3, abs=1.0)  # ~114 MiB
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom.optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom.optimal_params(100, 1.5)


def test_decontamination_bloom_matches_exact(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rep = {
        r["lang"]: r
        for r in bloom.decontamination_bloom_stats(spark, docs).collect()
    }
    exact = {
        r["lang"]: r["n_contaminated"]
        for r in decontamination_stats(docs).collect()
    }
    assert rep, "no streams reported"
    for lang, r in rep.items():
        assert r["n_missed"] == 0, (lang, r.asDict())  # no false negatives
        assert r["n_exact"] == exact[lang], (lang, r.asDict())
        assert r["n_exact"] <= r["n_bloom"] <= r["n_docs"]
