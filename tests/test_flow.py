"""Fluent façade (amadeus_spark.flow.Flow): the reference's
combinator-chain API shape must (a) produce the identical results as
the direct operator calls it delegates to, and (b) stay a zero-cost
veneer — one declarative plan per chain, combinators lazy, sinks
terminal."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.flow import Flow
from amadeus_spark.operators import sketches
from amadeus_spark.operators.group_sink import count as gs_count
from amadeus_spark.operators.group_sink import money_sum


def _lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_chain_reads_like_the_reference(spark):
    """source.par_stream().map().filter().count() — the reference's
    flagship shape (par_stream.rs doc examples) left-to-right."""
    li = _lineitem(spark)
    n = (
        Flow(li)
        .map(revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .filter(F.col("revenue") > 1000.0)
        .count()
    )
    direct = li.withColumn(
        "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).filter(F.col("revenue") > 1000.0).count()
    assert n == direct > 0


def test_combinators_are_lazy_sinks_terminal(spark):
    """Building a chain runs NO job; the whole chain is one Catalyst
    plan (no materialization boundary per combinator)."""
    li = _lineitem(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    f = (
        Flow(li)
        .map(q=F.col("l_quantity") * 2)
        .filter(F.col("q") > 10)
        .flat_map(k=F.col("l_orderkey"), q=F.col("q"))
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # nothing ran
    plan = f.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Scan" in plan or "Relation" in plan  # single fused plan


def test_flow_matches_direct_operators(spark):
    li = _lineitem(spark)
    got = Flow(li).most_frequent("l_returnflag", 2).collect()
    want = sketches.most_frequent(li, "l_returnflag", 2).collect()
    assert got == want

    got = Flow(li).max_by("l_orderkey", "l_extendedprice").collect()
    assert got[0][0] is not None

    assert Flow(li).all(F.col("l_quantity") > 0)
    assert not Flow(li).any(F.col("l_quantity") < 0)


def test_flow_group_by_sink_and_chain(spark):
    li = _lineitem(spark)
    half_a = Flow(li).filter(F.col("l_orderkey") % 2 == 0)
    half_b = Flow(li).filter(F.col("l_orderkey") % 2 == 1)
    rejoined = half_a.chain(half_b)
    assert rejoined.count() == li.count()

    got = {
        r["l_returnflag"]: (r["n"], r["rev"])
        for r in rejoined.group_by(
            ["l_returnflag"],
            {"n": gs_count(), "rev": money_sum("l_extendedprice")},
        ).collect()
    }
    want = {
        r["l_returnflag"]: (r["n"], r["rev"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.expr("cast(round(l_extendedprice * 1e6) as bigint)"))
                / F.lit(1e6)
            ).alias("rev"),
        )
        .collect()
    }
    assert got == want


def test_flow_of_and_pipe(spark):
    f = Flow.of(spark, [(1, "a"), (2, "b"), (3, "a")], "id long, tag string")

    def dedup_tags(fl: Flow) -> Flow:
        return Flow(fl.df.select("tag").distinct())

    assert f.pipe(dedup_tags).count() == 2
    assert f.cloned().count() == 3
    assert f.identity() is f


def test_corpus_flow_chain(spark):
    """The LLM-pipeline façade: quality -> exact dedup -> near dedup ->
    mixture reads left-to-right and matches the operators called
    directly; stages stay lazy, reports are terminal."""
    import os

    from pyspark.sql import functions as F

    from amadeus_spark.flow import CorpusFlow
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    cf = CorpusFlow(docs).quality(min_tokens=5).dedup_exact().dedup_near(0.8)
    assert isinstance(cf, CorpusFlow)  # lazy so far
    out = cf.mixture(100, {"en": 0.6, "de": 0.4}).to_df()
    comp = {r["lang"]: r["cnt"] for r in
            out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert comp.get("en", 0) <= 60 and comp.get("de", 0) <= 40
    assert set(comp) <= {"en", "de"}

    rep = CorpusFlow(docs).quality_report()
    assert rep.count() > 0 and "pass_all" in rep.columns

    split = CorpusFlow(docs).split_report()
    assert sum(r["n_docs"] for r in split.collect()) == docs.count()

    tb = CorpusFlow(docs).token_budget({"en": 2000, "de": 800})
    assert set(r["lang"] for r in tb.to_df().select("lang").distinct().collect()) == {"en", "de"}


def test_corpusflow_r8_stages_compose(spark):
    """normalize -> c4 -> chunk -> temperature chain end-to-end: every
    stage stays lazy, the terminal frame is consistent."""
    from pyspark.sql import functions as F

    from amadeus_spark.flow import CorpusFlow

    good = "alpha beta gamma delta epsilon zeta."
    rows = [
        (i, "en" if i % 2 else "de", "“" + good + "”\n" + good + "\n" + good)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    flow = CorpusFlow(docs).normalize().c4().chunk(window=4, stride=3)
    df = flow.to_df()
    assert "chunk_id" in df.columns
    out = df.collect()
    assert len(out) > 40  # chunking multiplies rows
    assert all('“' not in r["text"] for r in out)  # normalized
    picked = CorpusFlow(docs).normalize().c4().temperature(10).to_df().collect()
    assert 0 < len(picked) <= 12
