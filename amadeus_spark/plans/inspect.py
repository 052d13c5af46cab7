"""Physical-plan introspection — the engine's "is this the plan I want?"
toolkit.

The reference has no runtime plan (its plan is a compile-time Rust type,
SURVEY §3); on Spark the physical plan is observable, so we make plan
*quality* a tested property: filters reach the scan, projections prune
the read schema, dim joins broadcast, hot paths stay off Python UDFs.
Tests call these asserts so a regression that silently de-optimizes a
plan (e.g. a cast blocking pushdown) fails CI, not production at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes — every one is a full shuffle of its
    input; the first thing to check when a plan is slower than expected.
    Counts node-detail headers ("(3) Exchange") so each physical node is
    counted once (formatted explain prints nodes in tree AND detail)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan_text(df), re.MULTILINE))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the scan's PushedFilters."""
    plan = plan_text(df)
    lines = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert lines, f"no PushedFilters in plan:\n{plan}"
    joined = " ".join(lines)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed: {joined}"


def assert_read_schema(
    df: DataFrame, must_have: list[str], must_not_have: list[str] = ()
) -> None:
    """Assert column pruning reached the scan (ReadSchema)."""
    plan = plan_text(df)
    lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert lines, f"no ReadSchema in plan:\n{plan}"
    joined = " ".join(lines)
    for col in must_have:
        assert col in joined, f"{col} missing from ReadSchema: {joined}"
    for col in must_not_have:
        assert col not in joined, f"{col} not pruned from ReadSchema: {joined}"


def assert_broadcast_join(df: DataFrame, expected: int = 1) -> None:
    plan = plan_text(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= expected, f"expected ≥{expected} broadcast joins, got {n}:\n{plan}"


def single_partition_windows(df: DataFrame) -> list[str]:
    """Window nodes in the optimized logical plan whose partitionSpec is
    EMPTY — i.e. `Window.partitionBy()` / `OVER (ORDER BY ...)`. Such a
    window funnels its entire input through ONE task (Spark even warns
    "No Partition Defined for Window operation") — fine on a 20-row
    frame today, a guaranteed straggler at 100×. Returns the offending
    nodes' simpleString()s so the assert message names the window."""
    out: list[str] = []

    def walk(node) -> None:
        if node.getClass().getName().endswith("logical.Window"):
            if node.partitionSpec().size() == 0:
                out.append(node.simpleString(120))
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def assert_no_python_udf(df: DataFrame) -> None:
    """Hot-path guard: no row-at-a-time Python evaluation in the plan
    (BatchEvalPython = pickled per-row UDF; ArrowEvalPython/pandas is the
    sanctioned slow path and is allowed)."""
    plan = plan_text(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF in plan:\n{plan}"
