"""plans.barrier.plan_barrier — the Generate-node projection pin.

Pins the r15 optimization contract: rows/schema/order-in-partition are
untouched, downstream consumers read attributes instead of re-inlined
producer expressions, and predicates do not get substituted back
through the barrier (the duplication channel that made corpusflow_e2e
evaluate its normalize chain 13x)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.plans import plan_barrier, plan_text

#: an expression expensive enough that the optimizer would normally be
#: wrong to duplicate it — and textually greppable in the plan
MARKER = "regexp_replace(txt, 'aa+', 'A')"


def _base(spark):
    return spark.createDataFrame(
        [(i, "aab" * (i % 3 + 1)) for i in range(100)],
        "id long, txt string",
    ).select("id", F.expr(MARKER).alias("norm"))


def test_rows_and_schema_preserved(spark):
    df = _base(spark)
    pinned = plan_barrier(df)
    assert pinned.schema == df.schema
    assert sorted(map(tuple, pinned.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_consumers_share_one_copy(spark):
    """Filter + two derived columns over the pinned producer must leave
    exactly ONE copy of the producer expression in the executed plan;
    the unpinned shape inlines it into each consumer."""
    def consume(df):
        return (
            df.where(F.length("norm") > 1)
            .select(
                "id",
                F.length("norm").alias("a"),
                F.upper("norm").alias("b"),
            )
        )

    pinned_plan = plan_text(consume(plan_barrier(_base(spark))))
    plain_plan = plan_text(consume(_base(spark)))
    assert pinned_plan.count("regexp_replace") == 1
    assert plain_plan.count("regexp_replace") > 1
    # and the rows agree
    assert sorted(map(tuple, consume(plan_barrier(_base(spark))).collect())) \
        == sorted(map(tuple, consume(_base(spark)).collect()))


def test_c4_clean_pinned_plan(spark):
    """c4_clean(pinned=True) must keep a single copy of an expensive
    text producer even under its keep_doc filter (the flow.c4 shape);
    pinned=False is the flat-aggregate escape hatch with no Generate."""
    from amadeus_spark.functions import c4

    docs = spark.createDataFrame(
        [(i, "good line is here.\nsecond good line here.\n"
             "third good line here.") for i in range(10)],
        "doc_id long, text string",
    ).select("doc_id", F.expr(MARKER.replace("txt", "text")).alias("text"))

    pinned = c4.c4_clean(docs).where(F.col("keep_doc"))
    assert plan_text(pinned).count("regexp_replace") == 1
    flat = c4.c4_clean(docs, pinned=False)
    assert "Generate" not in plan_text(flat)
    # identical outputs either way
    assert sorted(map(tuple, c4.c4_clean(docs).collect())) == sorted(
        map(tuple, flat.collect())
    )
