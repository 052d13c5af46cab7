"""Unit tests for operator helpers not fully covered by the oracle
queries: fork (one-pass multi-sink), transforms, asof directions,
samplers, aggregates helpers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from amadeus_spark.operators import aggregates, joins, sampling, sketches, transforms
from amadeus_spark.tables import load_events
from tests.conftest import SF_SMOKE


def _li(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))


def test_fork_one_pass_mixed_sinks(spark):
    """The cloudfront_logs.rs:33-40 shape: sample + hourly histogram from
    one source pass."""
    ev = load_events(spark, SF_SMOKE)
    sample, hist = aggregates.fork(
        ev,
        lambda d: sampling.reservoir_sample(d, 10, seed=7).collect(),
        lambda d: d.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .count()
        .orderBy("h")
        .collect(),
    )
    assert len(sample) == 10
    assert sum(r["count"] for r in hist) == ev.count()


def test_summary_agg_single_pass(spark):
    row = aggregates.summary_agg(_li(spark), "l_quantity").first()
    assert row.cnt == 6000
    assert row.min_val >= 1 and row.max_val <= 50
    assert abs(row.mean - row.total / row.cnt) < 1e-9


def test_max_by_min_by(spark):
    cu = spark.read.parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    top = aggregates.max_by(cu, "c_name", "c_acctbal").first().max_by_val
    exact = cu.orderBy(F.desc("c_acctbal")).first().c_name
    assert top == exact


def test_all_any(spark):
    li = _li(spark)
    assert aggregates.all_match(li, F.col("l_quantity") > 0)
    assert not aggregates.all_match(li, F.col("l_quantity") > 25)
    assert aggregates.any_match(li, F.col("l_quantity") > 25)
    assert not aggregates.any_match(li, F.col("l_quantity") > 10000)


def test_transforms_chain_and_map(spark):
    li = _li(spark)
    a = li.filter(F.col("l_returnflag") == "A")
    b = li.filter(F.col("l_returnflag") == "R")
    both = transforms.chain(a, b)
    assert both.count() == a.count() + b.count()
    mapped = transforms.map_rows(
        li, rev=F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    assert "rev" in mapped.columns and mapped.count() == li.count()


def test_asof_forward_and_backward(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 200), (3, "v", 150)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 150, "b"), ("u", 250, "c"), ("v", 150, "d")],
        "k string, t long, tag string",
    )
    back = {
        r.id: r.r_tag
        for r in joins.asof_join(left, right, ["k"], "t", "t", "backward", ["id"]).collect()
    }
    assert back == {1: "a", 2: "b", 3: "d"}  # latest at-or-before
    fwd = {
        r.id: r.r_tag
        for r in joins.asof_join(left, right, ["k"], "t", "t", "forward", ["id"]).collect()
    }
    assert fwd == {1: "b", 2: "c", 3: "d"}  # earliest at-or-after


def test_semi_anti(spark):
    cu = spark.read.parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    od = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet")).withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    semi = joins.semi_join(cu, od, "c_custkey").count()
    anti = joins.anti_join(cu, od, "c_custkey").count()
    assert semi + anti == cu.count()


def test_bernoulli_sample_band(spark):
    li = _li(spark)
    n = sampling.bernoulli_sample(li, 0.1, seed=3).count()
    assert 400 < n < 800  # ~600 expected


def test_most_frequent_exact(spark):
    li = _li(spark)
    top = sketches.most_frequent(li, "l_returnflag", 2).collect()
    hist = {
        r.l_returnflag: r.cnt
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.l_returnflag, r.freq) for r in top] == want
