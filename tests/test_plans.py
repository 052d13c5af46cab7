"""Plan-quality regression tests (amadeus_spark.plans): the physical
plan properties that make queries scale are asserted, not assumed."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from amadeus_spark import plans
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_q6_is_pure_scan_agg(spark):
    df = entrymod.q_tpch_q6_forecast(spark, SF_ORACLE)
    plans.assert_pushed_filters(
        df, "GreaterThanOrEqual(l_discount,0.05)", "LessThan(l_quantity,24.0)"
    )
    plans.assert_read_schema(
        df,
        must_have=["l_extendedprice", "l_discount", "l_quantity"],
        must_not_have=["l_orderkey", "l_shipdate"],
    )
    assert plans.shuffle_count(df) <= 1  # single final-agg exchange


def test_q3_broadcasts_customer(spark):
    df = entrymod.q_tpch_q3_shipping(spark, SF_ORACLE)
    plans.assert_broadcast_join(df, expected=1)
    plans.assert_no_python_udf(df)


def test_share_broadcasts_all_dims(spark):
    df = entrymod.q_supplier_part_share(spark, SF_ORACLE)
    plans.assert_broadcast_join(df, expected=3)
    plans.assert_no_python_udf(df)


def test_hot_queries_have_no_row_python(spark):
    """No registered query may plan a row-at-a-time Python UDF."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        plans.assert_no_python_udf(df)


def test_range_join_never_nested_loop(spark):
    """The binned range join must stay an equi-join: a non-equi interval
    join would plan as BroadcastNestedLoopJoin (O(N*M) compares, mandatory
    broadcast) — the exact scale-killer the operator exists to avoid."""
    df = entrymod.q_range_join(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "BroadcastNestedLoop" not in txt and "Cartesian" not in txt
    plans.assert_no_python_udf(df)


def test_q5_broadcasts_all_dims(spark):
    """supplier/nation/region must broadcast; the fact chain must not."""
    df = entrymod.q_tpch_q5_local_supplier(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert txt.count("BroadcastExchange") >= 3
    plans.assert_no_python_udf(df)


def test_q18_aggregates_before_joining(spark):
    """The HAVING subquery must reduce lineitem BEFORE any join: the
    aggregate's child scan is lineitem, and no join sits below it."""
    import re

    df = entrymod.q_tpch_q18_large_orders(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    # formatted-plan node ids increase child-to-parent: the aggregate's
    # id must be smaller than every join's id (it sits below them)
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", txt)]
    join_ids = [
        int(m)
        for m in re.findall(
            r"\((\d+)\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", txt
        )
    ]
    assert agg_ids and join_ids and min(agg_ids) < min(join_ids)


def test_time_rollup_reads_raw_once(spark):
    """Day resolution merges hourly partials — events parquet appears in
    the plan exactly once (the continuous-aggregate property)."""
    df = entrymod.q_time_rollup(spark, SF_SMOKE)
    txt = plans.plan_text(df)
    assert txt.count("events.parquet") <= 1 or "InMemory" in txt


def test_top_n_avoids_global_sort(spark):
    df = entrymod.q_sort_n_by(spark, SF_ORACLE)
    assert "TakeOrderedAndProject" in plans.plan_text(df)


def test_projection_prunes_unused_columns(spark):
    li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    df = li.filter(F.col("l_quantity") > 10).select("l_orderkey")
    plans.assert_read_schema(
        df, must_have=["l_orderkey", "l_quantity"], must_not_have=["l_extendedprice"]
    )


def test_embedding_neardup_never_nested_loop(spark):
    """Near-dup candidates must come from the banded LSH equi-join; the
    pre-r3 all-pairs `id_a < id_b` join planned as
    BroadcastNestedLoopJoin — O(n²) pairs, the one perf scale-killer the
    round-2 verdict flagged."""
    df = entrymod.q_embedding_neardup(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "BroadcastNestedLoop" not in txt and "Cartesian" not in txt
    plans.assert_no_python_udf(df)


def test_minhash_registered_queries_cap_buckets(spark):
    """Registered MinHash queries must run with the band-bucket cap ON:
    one boilerplate bucket going quadratic is the known skew risk at
    corpus scale. Since the r16 bucket-group rewrite the cap is a
    size(ds) <= N filter on the grouped band lists (the old
    count-over-window stage folded into it) — assert the size-bounded
    filter is in the plan, and that the old window stage stayed gone."""
    for fn in (entrymod.q_minhash_lsh, entrymod.q_training_pipeline):
        txt = plans.plan_text(fn(spark, SF_ORACLE))
        assert "(size(ds" in txt and "<= " in txt, fn.__name__
        assert "Window" not in txt, fn.__name__


def test_set_ops_single_scan(spark):
    """set_ops is one declarative plan: a single orders scan feeding a
    two-level aggregate — not two eager .count() jobs."""
    import re

    df = entrymod.q_set_ops(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    # node-detail headers only: formatted explain prints each node in the
    # tree AND the detail section (same convention as plans.shuffle_count)
    assert len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M)) == 1, txt


def test_runtime_bloom_filter_join_pruning(spark):
    """100 TB posture: a selective filter on the orders side of a
    shuffle join injects a runtime bloom filter into the lineitem scan
    (rows that can't join are dropped AT THE SCAN, before the shuffle).
    Spark 4 has this on by default with size thresholds tuned for real
    data; tiny local files miss them, so the test pins the capability by
    forcing the thresholds — the assert is that the engine we configure
    still injects bloom_filter_agg/might_contain when sizes warrant."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))
        od = spark.read.parquet(os.path.join(SF_ORACLE, "orders.parquet")).filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy("o_orderstatus").count()
        txt = plans.plan_text(j)
        assert "bloom_filter" in txt.lower(), txt[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decontamination_single_documents_scan(spark):
    """The staged tokenize+shingle projection is persisted; probe,
    corpus, and totals branches must all read the cache — exactly one
    parquet scan of documents in the physical plan (r3 verdict #6)."""
    import re

    df = entrymod.q_decontamination(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M)) <= 1, txt
    assert "InMemoryTableScan" in txt or "TableCacheQueryStage" in txt


# --- round-4 TPC-H subquery-shape pack --------------------------------------


def test_q17_aggregate_below_join_and_broadcasts(spark):
    """The correlated AVG subquery must plan as aggregate-below-join:
    a HashAggregate on the branded lineitem subset feeds a broadcast,
    never a per-row subquery or a nested loop."""
    df = entrymod.q_tpch_q17_small_qty(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "BroadcastNestedLoop" not in txt and "Cartesian" not in txt
    assert "BroadcastExchange" in txt  # part prune + avg frame broadcast
    plans.assert_no_python_udf(df)


def test_q21_semi_join_no_nested_loop(spark):
    """EXISTS/NOT EXISTS self-correlations must resolve to equi-joins on
    l_orderkey (semi + two aggregates), never a correlated nested loop."""
    df = entrymod.q_tpch_q21_waiting(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "BroadcastNestedLoop" not in txt and "Cartesian" not in txt
    assert "LeftSemi" in txt
    plans.assert_no_python_udf(df)


def test_q16_not_in_is_broadcast_anti(spark):
    """The complaint-supplier NOT IN must plan as a broadcast LEFT ANTI
    join (tiny exclusion list), not a shuffle or a nested loop."""
    df = entrymod.q_tpch_q16_partsupp(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "LeftAnti, BuildRight" in txt or (
        "LeftAnti" in txt and "BroadcastExchange" in txt
    )
    assert "BroadcastNestedLoop" not in txt
    plans.assert_no_python_udf(df)


def test_q2_window_min_single_lineitem_scan(spark):
    """The per-part MIN correlation is a window over the offer frame:
    lineitem must be scanned ONCE (the correlated-subquery formulation
    scans it twice), and no nested loop may appear."""
    import re

    df = entrymod.q_tpch_q2_min_cost(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    li_scans = len(re.findall(r"Location:.*lineitem\.parquet", txt))
    assert li_scans == 1, txt
    assert "BroadcastNestedLoop" not in txt
    plans.assert_no_python_udf(df)


def test_q15_single_lineitem_scan(spark):
    """The scalar MAX subquery is a 1-row aggregate over the PERSISTED
    post-agg revenue frame broadcast back onto it, so lineitem is
    scanned once — the classic view+subquery form scans the fact table
    twice, and the previous empty-partitionBy window form sorted the
    whole frame through one task."""
    import re

    df = entrymod.q_tpch_q15_top_supplier(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    li_scans = len(re.findall(r"Location:.*lineitem\.parquet", txt))
    assert li_scans == 1, txt
    plans.assert_no_python_udf(df)


def test_q19_pushes_disjunction_and_broadcasts_part(spark):
    """Brand/size live on part, quantity on lineitem: the OR-of-ANDs
    can't fully push to either scan, but the partial disjunction on
    l_quantity must reach the lineitem scan and part must broadcast."""
    df = entrymod.q_tpch_q19_disjunctive(spark, SF_ORACLE)
    txt = plans.plan_text(df)
    assert "BroadcastExchange" in txt
    assert "PushedFilters" in txt
    plans.assert_no_python_udf(df)


def test_no_single_partition_window_anywhere(spark):
    """SWEEP: no registered query may plan a Window with an empty
    partitionSpec (`Window.partitionBy()` / `OVER (ORDER BY ..)` with no
    PARTITION BY). Every such window funnels its whole input through one
    task — the round-4/5 verdicts flagged equidepth_histogram (global
    ntile) and Q11/Q15 (global sum/max) as exactly this class of
    100×-scale killer; this sweep pins the fix for every present and
    FUTURE registry entry."""
    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        hits = plans.single_partition_windows(df)
        if hits:
            offenders[name] = hits
    assert not offenders, f"single-partition windows planned: {offenders}"


def test_ngram_jaccard_registered_cap_is_on(spark):
    """The REGISTERED ngram_jaccard must apply the stop-shingle df cap
    (r4/r5 verdicts: a boilerplate shingle in d docs emits O(d²)
    self-join rows — cap machinery existing but OFF is the failure
    mode), and the cap's doc-count must be a broadcast 1-row aggregate,
    not an eager driver-side count."""
    df = entrymod.q_ngram_jaccard(spark, SF_SMOKE)
    txt = plans.plan_text(df)
    assert "CEIL(" in txt and "__ndocs" in txt, txt[:2000]
    plans.assert_no_python_udf(df)


def test_ranked_limit_queries_get_window_group_limit(spark):
    """Every registered per-group ranked-prefix query must plan
    Partial+Final WindowGroupLimit (map-side truncation before the
    shuffle). mixture_sample needs its literal max-quota conjunct for
    this — the CASE quota alone defeats the rule and a few strata would
    sort the whole corpus through a few tasks."""
    for fn in (
        entrymod.q_mixture_sample,
        entrymod.q_stratified_sample,
        entrymod.q_grouped_topn,
        entrymod.q_key_skew_profile,
        entrymod.q_hard_negatives,
    ):
        txt = plans.plan_text(fn(spark, SF_ORACLE))
        assert txt.count("WindowGroupLimit") >= 2, (fn.__name__, txt[:3000])


def test_late_r7_ops_broadcast_their_small_sides(spark):
    """The late-r7 operators' BOUNDED small frames must BROADCAST
    (cumsum offsets, DSIR model + selection, skew top-k): a shuffle
    join against the corpus on any of these would be the 100x-scale
    mistake the designs exist to avoid. Also: no nested-loop join
    anywhere. (cluster_safe_split's comp frame is NOT bounded — its
    join strategy is deliberately AQE-decided; see the dedicated test
    below.)"""
    for fn, min_bc in (
        (entrymod.q_token_budget_sample, 1),
        (entrymod.q_dsir_select, 2),
        (entrymod.q_key_skew_profile, 1),
    ):
        df = fn(spark, SF_ORACLE)
        txt = plans.plan_text(df)
        assert txt.count("BroadcastHashJoin") >= min_bc, (fn.__name__, txt[:2000])
        # the only nested-loop join allowed is the 1-row-aggregate
        # broadcast (a Cross with a single-row build side — the repo's
        # standard totals pattern); any keyed BNLJ is a scale bug.
        # formatted mode puts the join type in the Arguments: line, so
        # every BNLJ node must pair with a "BuildRight, Cross".
        for line in txt.splitlines():
            if "BroadcastNestedLoopJoin" in line and "Build" in line:
                assert " Cross " in line, (fn.__name__, line)
        plans.assert_no_python_udf(df)


def test_no_query_triple_scans_a_table(spark):
    """Registry-wide multi-consumer sweep: no registered query may scan
    the same parquet file 3+ times — a subtree feeding N consumers
    re-executes per consumer (the CLAUDE.md rule; fuzzy_self_join and
    semantic_dedup both shipped with this bug before their persists).
    Two scans stay legal (dim+fact double-reads, deliberate re-reads);
    three is always a missing persist."""
    import re
    from collections import Counter

    offenders = {}
    for name, fn in entrymod.queries().items():
        txt = plans.plan_text(fn(spark, SF_ORACLE))
        scans = re.findall(r"^\(\d+\) Scan parquet.*?/(\w+)\.parquet", txt, re.M)
        c = Counter(scans)
        if c and max(c.values()) >= 3:
            offenders[name] = dict(c)
    assert not offenders, offenders


def test_parquet_aggregate_pushdown_capability(spark):
    """100 TB posture: MIN/COUNT over parquet can be answered from
    footer statistics without scanning rows — needs the DSv2 reader
    (useV1SourceList excludes parquet) plus aggregatePushdown. Pin the
    capability so a Spark upgrade or conf regression is caught."""
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))
        df = li.agg(F.min("l_quantity"), F.count(F.lit(1)))
        txt = plans.plan_text(df)
        assert "PushedAggregation: [MIN(l_quantity), COUNT(*)]" in txt, txt[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_nested_schema_pruning(spark):
    """Selecting one struct leaf must prune the parquet ReadSchema to
    that leaf — reading the whole struct for a leaf projection is the
    nested-data scale mistake."""
    fx = spark.read.parquet(os.path.join("fixtures", "deep_struct.parquet"))
    df = fx.select(F.col("s.name"))
    txt = plans.plan_text(df)
    assert "ReadSchema: struct<s:struct<name:string>>" in txt, txt[:1500]
    # the deep sibling subtree (inner.score/deep.flag/deep.n) is pruned
    assert "score" not in txt and "flag" not in txt


def test_cluster_safe_split_comp_join_is_aqe_decided(spark):
    """comp (component labels) covers every doc in some near-dup pair —
    at web-crawl dup rates that is O(corpus), so the comp<->corpus join
    must NOT carry a forced broadcast hint: a driver-fed broadcast
    relation OOMs at 100x with no AQE escape. Contract: no join hint in
    the optimized logical plan (the join degrades gracefully to a
    shuffled join on doc id when comp is large), and at THIS scale AQE
    still converts it to a broadcast join at runtime."""
    from amadeus_spark.functions import dedup

    docs = spark.range(0, 2000).selectExpr("id AS doc_id")
    pairs = spark.range(0, 200).selectExpr(
        "id AS doc_a", "id + 1000 AS doc_b"
    )
    df = dedup.cluster_safe_split_stats(docs, pairs)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower(), logical
    df.collect()
    txt = plans.plan_text(df)
    assert "isFinalPlan=true" in txt
    # AQE chose broadcast for the (small here) comp side at runtime
    assert "BroadcastHashJoin" in txt, txt[:3000]
    plans.assert_no_python_udf(df)
