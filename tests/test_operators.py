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


def test_range_join_matches_naive(spark):
    """Binned plan is exact: same pairs as the naive cross+filter, bounds
    inclusive, multi-bin intervals and negative coordinates included."""
    pts = spark.createDataFrame(
        [(1, -17), (2, 0), (3, 5), (4, 10), (5, 42), (6, 100)], "pid long, v long"
    )
    ivals = spark.createDataFrame(
        [(10, -20, 0), (20, 0, 10), (30, 5, 5), (40, 7, 90)], "iid long, lo long, hi long"
    )
    got = {
        (r.pid, r.iid)
        for r in joins.range_join(pts, ivals, "v", "lo", "hi", bin_width=4).collect()
    }
    naive = {
        (p.pid, i.iid)
        for p in pts.collect()
        for i in ivals.collect()
        if i.lo <= p.v <= i.hi
    }
    assert got == naive and (2, 10) in got and (2, 20) in got  # inclusive both ends


def test_range_join_with_equi_keys(spark):
    pts = spark.createDataFrame([("a", 5), ("b", 5)], "k string, v long")
    ivals = spark.createDataFrame([("a", 0, 10)], "k string, lo long, hi long")
    out = joins.range_join(pts, ivals, "v", "lo", "hi", on_keys=["k"]).collect()
    assert [(r.k, r.v) for r in out] == [("a", 5)]


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


def test_time_rollup_merge_is_exact(spark):
    """The hypertable property: day resolution derived by merging hourly
    partials must equal a direct day-level aggregation of raw events —
    exact, because partials carry integer micro-units."""
    ev = load_events(spark, SF_SMOKE)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("v_us"),
    )
    merged = {
        (str(r.bucket), r.event_type): (r.n, r.v_us)
        for r in hourly.groupBy(
            F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("v_us").alias("v_us"))
        .collect()
    }
    direct = {
        (str(r.bucket), r.event_type): (r.n, r.v_us)
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("v_us"),
        )
        .collect()
    }
    assert merged == direct


def test_range_join_randomized_vs_naive(spark):
    """Fixed-seed fuzz: 300 points x 60 intervals, fractional bin width,
    values straddling zero and bin boundaries — binned plan == naive."""
    import random

    rng = random.Random(4242)
    pts_rows = [(i, rng.randint(-100, 100)) for i in range(300)]
    iv_rows = []
    for i in range(60):
        lo = rng.randint(-110, 100)
        iv_rows.append((i, lo, lo + rng.randint(0, 40)))
    pts = spark.createDataFrame(pts_rows, "pid long, v long")
    ivals = spark.createDataFrame(iv_rows, "iid long, lo long, hi long")
    got = {
        (r.pid, r.iid)
        for r in joins.range_join(pts, ivals, "v", "lo", "hi", bin_width=7.5).collect()
    }
    naive = {
        (pid, iid)
        for pid, v in pts_rows
        for iid, lo, hi in iv_rows
        if lo <= v <= hi
    }
    assert got == naive


def test_connected_components_chain_and_cliques(spark):
    """Label propagation must merge transitively (a-b, b-c, ... chains
    deeper than one round) and keep disjoint components apart. A 7-node
    path needs ~log-diameter rounds — exercises the convergence loop,
    not just single-hop merges."""
    from amadeus_spark.functions import dedup

    pairs = spark.createDataFrame(
        # path 1-2-3-4-5-6-7 (one component, min=1), clique {10,11,12},
        # isolated pair (20,21)
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
         (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    comp = {r.id: r.cluster for r in dedup.connected_components(pairs, "doc_a", "doc_b").collect()}
    assert all(comp[i] == 1 for i in range(1, 8))
    assert all(comp[i] == 10 for i in (10, 11, 12))
    assert comp[20] == 20 and comp[21] == 20

    stats = dedup.neardup_cluster_stats(pairs, "doc_a", "doc_b").collect()
    got = {r.cluster_rep: (r.cluster_size, r.n_dropped) for r in stats}
    assert got == {1: (7, 6), 10: (3, 2), 20: (2, 1)}


def test_for_each_side_effect_via_accumulator(spark):
    """for_each (par_sink/for_each.rs): the closure runs once per row on
    executors; an accumulator observes exactly the row count, and the
    per-partition variant sees every row too."""
    from amadeus_spark.operators import transforms

    df = spark.range(0, 1000).repartition(7)
    acc = spark.sparkContext.accumulator(0)

    def per_row(row):
        acc.add(1)

    transforms.for_each(df, per_row, per_partition=False)
    assert acc.value == 1000

    acc2 = spark.sparkContext.accumulator(0)

    def per_part(rows):
        n = sum(1 for _ in rows)
        acc2.add(n)

    transforms.for_each(df, per_part)
    assert acc2.value == 1000


def test_error_propagation_from_executor(spark):
    """Reference parity (tests/panic.rs): a panic inside a task fails the
    whole job and surfaces the original message at the driver — it does
    not hang the pool or silently drop the partition. Spark analog: an
    exception in executor-side Python propagates with its message, and
    the session stays usable afterwards."""
    import pytest as _pytest

    df = spark.range(0, 100, numPartitions=4)

    def boom(batches):
        for pdf in batches:
            if (pdf["id"] == 57).any():
                raise ValueError("boom at 57")
            yield pdf

    with _pytest.raises(Exception, match="boom at 57"):
        df.mapInPandas(boom, "id long").collect()

    # the pool survives: the session runs the next job normally
    assert spark.range(5).count() == 5


def test_flat_map_udtf_stateful_expansion(spark):
    """Spark 4 Python UDTF: per-row expansion with per-partition state
    (running sequence counter + terminate-time flush) — the flat_map
    generality a Generate-node explode can't express."""
    from pyspark.sql.functions import udtf

    from amadeus_spark.operators import transforms

    @udtf(returnType="kind: string, token: string, n: int")
    class Tokenize:
        def __init__(self):
            self.seen = 0

        def eval(self, row):
            for t in row.text.split():
                self.seen += 1
                yield "tok", t, self.seen
        def terminate(self):
            yield "eof", None, self.seen

    df = spark.createDataFrame(
        [("a b",), ("c",)], "text string"
    ).coalesce(1)
    out = transforms.flat_map_udtf(spark, Tokenize, df, "tokenize_udtf")
    rows = {(r.kind, r.token, r.n) for r in out.collect()}
    assert ("tok", "a", 1) in rows and ("tok", "c", 3) in rows
    assert ("eof", None, 3) in rows  # terminate saw partition state


def test_weighted_sample_biases_toward_heavy_items(spark):
    """Items with 100x weight must be overrepresented vs uniform: with
    10 heavy of 1000 keys and k=100, uniform picks ~1 heavy; the
    weight-biased rank should pick far more."""
    from amadeus_spark.operators import sampling

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = sampling.weighted_sample(df, "k", "w", 100)
    heavy = got.filter(F.col("k") < 10).count()
    assert heavy >= 5  # ~10 expected under weighting, ~1 under uniform
    assert got.count() == 100


def test_temporal_join_picks_current_version(spark):
    """Fact rows land on the SCD2 version current at their timestamp;
    pre-first-version facts get NULLs (cold start)."""
    from datetime import datetime

    from amadeus_spark.operators.joins import temporal_join

    ts = lambda s: datetime.fromisoformat(s)
    versions = spark.createDataFrame(
        [
            (1, ts("2024-01-01"), "v1"),
            (1, ts("2024-02-01"), "v2"),
            (2, ts("2024-01-15"), "x1"),
        ],
        "k long, start timestamp, label string",
    )
    facts = spark.createDataFrame(
        [
            (1, ts("2024-01-20"), 10.0),  # inside v1
            (1, ts("2024-02-01"), 20.0),  # boundary -> v2 (inclusive)
            (1, ts("2024-03-01"), 30.0),  # after last -> v2 still current
            (2, ts("2024-01-01"), 40.0),  # before first version -> NULL
        ],
        "k long, t timestamp, amount double",
    )
    got = {
        (r.k, r.amount, r.r_label)  # right cols come out r_-prefixed
        for r in temporal_join(facts, versions, ["k"], "t", "start").collect()
    }
    assert got == {
        (1, 10.0, "v1"),
        (1, 20.0, "v2"),
        (1, 30.0, "v2"),
        (2, 40.0, None),
    }


def test_token_budget_boundary_doc_included(spark):
    """The doc that CROSSES the budget is kept (cum-before < budget),
    everything after it is dropped — verified against a naive
    single-ordered recompute in Python."""
    import hashlib

    rows = [("en", i, 10 + (i % 7)) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tok long")
    budget = 137
    kept = sorted(
        r["doc_id"]
        for r in sampling.token_budget_sample(
            df, "lang", "doc_id", "n_tok", {"en": budget}
        ).collect()
    )

    def h(doc_id):
        return int(
            hashlib.md5(
                (sampling.TOKEN_BUDGET_SALT + str(doc_id)).encode()
            ).hexdigest()[:8],
            16,
        )

    order = sorted(rows, key=lambda r: (h(r[1]), r[1]))
    want, cum = [], 0
    for _, doc_id, n in order:
        if cum < budget:
            want.append(doc_id)
        cum += n
    assert kept == sorted(want)
    tok = {r[1]: r[2] for r in rows}
    total = sum(tok[d] for d in kept)
    assert total >= budget  # boundary doc included...
    assert total - max(tok[d] for d in kept) < budget  # ...but only one


def test_token_budget_missing_stratum_quota_zero(spark):
    """Strata absent from the budget dict are dropped entirely."""
    df = spark.createDataFrame(
        [("en", 1, 5), ("de", 2, 5)], "lang string, doc_id long, n_tok long"
    )
    out = sampling.token_budget_sample(df, "lang", "doc_id", "n_tok", {"en": 100})
    assert [r["lang"] for r in out.collect()] == ["en"]


def test_key_skew_profile_crafted(spark):
    """Known skew: key 1 holds 6 of 10 rows among 3 keys → max=6,
    skew_factor = 6*3/10, top-2 covers 9/10."""
    rows = [("a", 1)] * 6 + [("a", 2)] * 3 + [("a", 3)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = aggregates.key_skew_profile(df, "g", "k", top_k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_keys"], r["n_rows"], r["max_key_rows"]) == (3, 10, 6)
    assert r["topk_frac"] == 9 / 10
    assert r["skew_factor"] == 6 * 3 / 10


def test_cluster_safe_split_no_leakage(spark):
    """Every near-dup pair lands in ONE split: hand-built pair chains
    (1-2, 2-3 → one cluster; 10-11 → another) can never straddle, and
    the per-split cluster counts sum to the number of distinct reps."""
    from amadeus_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21, 30)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = dedup.cluster_safe_split_stats(docs, pairs).collect()
    assert sum(r["n_docs"] for r in out) == 8
    # 5 clusters: {1,2,3}, {10,11}, and three singletons (20, 21, 30)
    assert sum(r["n_clusters"] for r in out) == 5
    assert sum(r["n_grouped_docs"] for r in out) == 3  # ids 2,3,11


def test_cluster_keep_best_argmax_and_ties(spark):
    """Keep-one-per-cluster: the padded-key argmax keeps the HIGHEST
    score, ties break toward the LOWEST id, singletons keep themselves,
    and dropped score mass is exactly the cluster remainder."""
    from amadeus_spark.functions import dedup

    docs = spark.createDataFrame(
        # cluster {1,2,3}: scores 5,9,9 -> keep id 2 (tie 9 vs 9)
        # cluster {10,11}: scores 4,7 -> keep id 11
        # singleton 20: keeps itself
        [(1, "aaaaa"), (2, "bbbbbbbbb"), (3, "ccccccccc"),
         (10, "dddd"), (11, "eeeeeee"), (20, "ff")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {
        r["cluster_size"]: r
        for r in dedup.cluster_keep_best_stats(docs, pairs).collect()
    }
    assert out[3]["n_clusters"] == 1
    assert out[3]["sum_kept_score"] == 9
    assert out[3]["sum_dropped_score"] == 5 + 9
    assert out[3]["min_keep_id"] == out[3]["max_keep_id"] == 2
    assert out[2]["sum_kept_score"] == 7
    assert out[2]["min_keep_id"] == 11
    assert out[1]["n_clusters"] == 1 and out[1]["sum_kept_score"] == 2
    assert out[1]["sum_dropped_score"] == 0


def test_cluster_keep_best_negative_scores(spark):
    """Negative scores rank properly (the pre-widening encoding
    clamped them to 0, degenerating every negative cluster's winner to
    lowest-id): the least-negative doc wins, mixed-sign clusters keep
    the positive max, and dropped mass stays the raw remainder."""
    from amadeus_spark.functions import dedup

    docs = spark.createDataFrame(
        # cluster {1,2,3}: scores -5,-2,-9 -> keep id 2 (max = -2)
        # cluster {10,11}: scores -4,3 -> keep id 11 (positive beats)
        [(1, -5), (2, -2), (3, -9), (10, -4), (11, 3)],
        "doc_id long, s long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {
        r["cluster_size"]: r
        for r in dedup.cluster_keep_best_stats(
            docs, pairs, score_sql="s"
        ).collect()
    }
    assert out[3]["sum_kept_score"] == -2
    assert out[3]["min_keep_id"] == out[3]["max_keep_id"] == 2
    assert out[3]["sum_dropped_score"] == -14
    assert out[2]["sum_kept_score"] == 3
    assert out[2]["min_keep_id"] == 11
    assert out[2]["sum_dropped_score"] == -4


def test_token_budget_extremes(spark):
    """budget 0 keeps nothing; budget >= total keeps everything."""
    rows = [("en", i, 10) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tok long")
    zero = sampling.token_budget_sample(df, "lang", "doc_id", "n_tok", {"en": 0})
    assert zero.count() == 0
    full = sampling.token_budget_sample(df, "lang", "doc_id", "n_tok", {"en": 1000})
    assert full.count() == 10


def test_cluster_keep_best_plan_has_no_window(spark):
    """The argmax must stay a partial-aggregable MIN — no Window
    operator anywhere in the plan (a per-cluster window would sort a
    giant boilerplate cluster through one task), and the padded-key
    MIN must appear as a hash aggregate with a partial phase."""
    from amadeus_spark import plans
    from amadeus_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, "t" * (i % 7 + 1)) for i in range(50)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    txt = plans.plan_text(dedup.cluster_keep_best_stats(docs, pairs))
    assert "Window" not in txt, txt
    assert "partial_min" in txt or "HashAggregate" in txt, txt
