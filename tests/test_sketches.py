"""Sketch-parity tests: CMS+TopK (reference most_frequent semantics) and
the exact/approx operator variants. Acceptance bands per SURVEY §7 hard
part #1 — sketches are checked against exact answers within ε·N, not by
hash equality."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from amadeus_spark.functions.sketch_lib import CountMinTopK, cms_params, most_frequent_sketch
from amadeus_spark.operators import sketches


def test_sketch_state_size_independent_of_rows_seen():
    """streaming_topk_sketch holds one ``CountMinTopK.dumps()`` string
    per group as applyInPandasWithState state — the reference's
    mergeable-sketch invariant (amadeus-streaming's Top/CMS traits)
    requires that state to be O(width·depth + k), NEVER a function of
    rows or distinct keys seen. Pin the structure (counter grid fixed,
    candidate map trim-capped) and the serialized size (counter values
    grow only in digit width, log of the count) across a 40k-distinct-
    key stream."""
    import json

    sk = CountMinTopK(5, 0.99, 0.01)

    def check_structure():
        o = json.loads(sk.dumps())
        assert len(o["t"]) == sk.depth
        assert all(len(row) == sk.width for row in o["t"])
        assert len(o["c"]) <= 4 * sk.k  # trim cap, not key cardinality
        return len(sk.dumps())

    for i in range(500):
        sk.push(f"warm-{i}")
    early = check_structure()
    for i in range(40_000):
        sk.push(f"key-{i % 20_000}")
    late = check_structure()
    # 80x more pushes, 40x more distinct keys: byte size may creep only
    # via counter digits (~log10 of count), never proportionally
    assert late <= early * 2, (early, late)


def test_cms_params_reference_sizing():
    # count_min.rs:58-77: width=ceil(e/tol), depth=ceil(ln(1-p)/ln(0.5))
    w, d = cms_params(0.99, 0.001)
    assert w == 2719 and d == 7
    w, d = cms_params(0.9, 0.01)
    assert w == 272 and d == 4


def test_cms_topk_local_exactish():
    rng = random.Random(1)
    # zipf-ish: key_i appears ~ 10000/i times
    sk = CountMinTopK(5, 0.99, 0.001)
    truth = {}
    for i in range(1, 60):
        n = 10000 // i
        truth[f"k{i}"] = n
    items = [(k, n) for k, n in truth.items()]
    rng.shuffle(items)
    for k, n in items:
        sk.push(k, n)
    top = sk.top()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [k for k, _ in top] == [k for k, _ in want]
    total = sum(truth.values())
    for (k, est), (_, exact) in zip(top, want):
        assert exact <= est <= exact + 0.001 * total  # CMS upper bound band


def test_cms_merge_equals_single_pass():
    a, b = CountMinTopK(3, 0.99, 0.001), CountMinTopK(3, 0.99, 0.001)
    one = CountMinTopK(3, 0.99, 0.001)
    for i, (sk_half, key, n) in enumerate(
        [(a, "x", 50), (a, "y", 30), (b, "x", 25), (b, "z", 40), (b, "y", 5)]
    ):
        sk_half.push(key, n)
    for key, n in [("x", 75), ("y", 35), ("z", 40)]:
        one.push(key, n)
    merged = a.merge(b)
    assert [k for k, _ in merged.top()] == [k for k, _ in one.top()] == ["x", "z", "y"]
    # serialization round-trip preserves state
    rt = CountMinTopK.loads(merged.dumps())
    assert rt.top() == merged.top()


def test_most_frequent_sketch_distributed(spark):
    """Distributed sketch top-k == exact top-k on skewed synthetic data."""
    rows = []
    for i in range(1, 40):
        rows += [(f"key{i:02d}",)] * (4000 // i)
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = most_frequent_sketch(df, "k", 5, probability=0.99, tolerance=0.001)
    exact = {
        r.k: r.cnt
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [k for k, _ in got] == [k for k, _ in want]
    n = sum(exact.values())
    for (k, est), (_, ex) in zip(got, want):
        assert ex <= est <= ex + 0.001 * n


def test_exact_vs_approx_distinct_band(spark):
    import os

    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))
    exact = sketches.most_distinct(li, "l_suppkey", "l_partkey", 100).collect()
    approx = sketches.most_distinct(
        li, "l_suppkey", "l_partkey", 100, error_rate=0.02
    ).collect()
    em = {r.l_suppkey: r.distinct_vals for r in exact}
    for r in approx:
        rel = abs(r.distinct_vals - em[r.l_suppkey]) / em[r.l_suppkey]
        assert rel < 0.1, (r.l_suppkey, r.distinct_vals, em[r.l_suppkey])


def test_cms_tree_merge_matches_flat(spark):
    """The executor-side tree level (fan_in exceeded) must produce the
    same top-k as the flat driver merge — merging is associative on the
    counter table."""
    rows = []
    for i in range(1, 30):
        rows += [(f"key{i:02d}",)] * (3000 // i)
    df = spark.createDataFrame(rows, "k string").repartition(16)
    flat = most_frequent_sketch(df, "k", 5, fan_in=1000)  # 16 <= 1000: flat
    tree = most_frequent_sketch(df, "k", 5, fan_in=2)  # 16 > 2: 8 groups
    assert flat == tree


def test_hll_sketch_rollup_merges_without_rescan(spark):
    """Sketch-as-data (the reference's mergeable-sketch design): fine
    partials merged to a coarser key give the same estimate as
    sketching the coarse groups directly, and land within the HLL
    error band of exact."""
    from amadeus_spark.operators import sketches as sk

    import os

    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))
    # fine partials: per (returnflag, linestatus)
    fine = sk.hll_sketch_rollup(
        li, ["l_returnflag", "l_linestatus"], "l_partkey"
    )
    # merge partials up to per-returnflag — raw table untouched
    merged = {
        r.l_returnflag: r.distinct_est
        for r in sk.hll_merge_estimate(fine, ["l_returnflag"]).collect()
    }
    direct = {
        r.l_returnflag: r.distinct_est
        for r in sk.hll_merge_estimate(
            sk.hll_sketch_rollup(li, ["l_returnflag"], "l_partkey"),
            ["l_returnflag"],
        ).collect()
    }
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    # union-of-partials tracks direct sketching closely (Datasketches
    # HLL unions are not bit-identical across sparse/dense promotion,
    # so this is a tight band, not equality) and both track exact
    for k, est in merged.items():
        assert abs(est - direct[k]) / direct[k] < 0.03
        assert abs(est - exact[k]) / exact[k] < 0.05  # lg_k=12 band
        assert abs(direct[k] - exact[k]) / exact[k] < 0.05


def test_hll_set_estimates_within_band(spark):
    """Inclusion-exclusion set estimates from stored sketch partials:
    each term within the HLL band, intersection within the compounded
    band (3 terms' error), never negative, raw table never rescanned
    (the frame is built purely from the rollup output)."""
    import duckdb

    from amadeus_spark.operators import sketches

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    sk = sketches.hll_sketch_rollup(li, ["l_returnflag"], "l_orderkey")
    got = sketches.hll_set_estimates(sk, "l_returnflag", ["A"], ["N"]).first()
    a, b, u = duckdb.sql(
        """SELECT
        (SELECT COUNT(DISTINCT l_orderkey) FROM '/root/testdata/sf0.01/lineitem.parquet' WHERE l_returnflag='A'),
        (SELECT COUNT(DISTINCT l_orderkey) FROM '/root/testdata/sf0.01/lineitem.parquet' WHERE l_returnflag='N'),
        (SELECT COUNT(DISTINCT l_orderkey) FROM '/root/testdata/sf0.01/lineitem.parquet' WHERE l_returnflag IN ('A','N'))
        """
    ).fetchone()
    band = 0.03  # lg_k=12 → rsd ≈ 1.6%; 2σ headroom
    assert abs(got.est_a - a) <= band * a
    assert abs(got.est_b - b) <= band * b
    assert abs(got.est_union - u) <= band * u
    inter = a + b - u
    assert abs(got.est_intersection - inter) <= 3 * band * inter
    assert got.est_intersection >= 0 and got.est_a_minus_b >= 0


def test_sketch_state_size_independent_of_stream_length():
    """The mergeable-sketch invariant the streaming operators rely on
    (streaming_topk_sketch / streaming_group_sample state stays
    O(k·width) per group regardless of rows seen — r6 verdict item 8):
    serialized state size must plateau, not grow with pushes."""
    from amadeus_spark.functions.sketch_lib import CountMinTopK, TDigest

    small = CountMinTopK(5, 0.99, 0.01)
    big = CountMinTopK(5, 0.99, 0.01)
    for i in range(200):
        small.push(f"k{i % 40}")
    for i in range(20000):
        big.push(f"k{i % 40}")
    # same table geometry, candidate set capped at 4k either way
    assert len(big.table) == len(small.table)
    assert len(big.table[0]) == len(small.table[0])
    assert len(big.candidates) <= 4 * big.k
    assert len(big.dumps()) <= len(small.dumps()) * 2  # count digits only

    d_small, d_big = TDigest(50), TDigest(50)
    d_small.push_sorted(sorted(float(i % 97) for i in range(500)))
    for _ in range(40):
        d_big.push_sorted(sorted(float(i % 97) for i in range(5000)))
    assert len(d_big.centroids) <= 2 * 50
    assert len(d_big.centroids) <= max(2 * len(d_small.centroids), 100)
