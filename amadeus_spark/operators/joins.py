"""Joins — SURVEY.md §2.3, plus the join types Spark adds for free and the
as-of/range joins a timeseries/training pipeline needs.

The reference has exactly two joins, both broadcast-hash with an
in-memory right side cloned into every task (par_stream/join.rs:14-125):
``inner_join`` and ``left_join``. At 100 TB that only works when the right
side fits in executor memory — Spark's planner picks broadcast vs
shuffled-hash vs sort-merge by size (plus AQE runtime demotion), so our
wrappers *hint* broadcast for known-small dims and otherwise let Catalyst
choose. Null keys never match (reference key equality is Eq+Hash on
non-null values ≈ Spark's null-unsafe equi-join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inner_join(
    left: DataFrame, right: DataFrame, on, broadcast_right: bool = True
) -> DataFrame:
    """Reference ``inner_join`` (par_stream.rs:118-126, join.rs:71-125).
    broadcast_right=True reproduces the reference's physical strategy;
    set False for fact-fact joins so Catalyst/AQE picks shuffle-side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="inner")


def left_join(
    left: DataFrame, right: DataFrame, on, broadcast_right: bool = True
) -> DataFrame:
    """Reference ``left_join`` (par_stream.rs:107-115, join.rs:14-67)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — beyond the reference (Spark-native left_semi)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — beyond the reference (left_anti)."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_keys: Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    left_id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time (direction='backward'; 'forward' = earliest
    right_time >= left_time), per key. Not in the reference; standard in
    timeseries engines.

    Implementation: range join + window dedup. Catalyst plans the
    inequality as a broadcast-nested-loop unless the equi-keys dominate —
    with equi-keys present it is a SortMergeJoin on the keys with the time
    predicate as a post-join filter, then one window per left row keeps the
    closest match. Scales as O(matches) through the shuffle; for dense
    timeseries prefer bucketing both sides by key.
    """
    from pyspark.sql import Window

    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = rt <= lt if direction == "backward" else rt >= lt
    for k in on_keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    # a synthetic row id guarantees 1:1 output with left input even when
    # the left side contains fully-duplicate rows (partitioning on all
    # left columns would collapse them to one output row)
    if left_id_cols:
        left_keyed = left
        part_cols = list(left_id_cols)
    else:
        left_keyed = left.withColumn("__lid", F.monotonically_increasing_id())
        part_cols = ["__lid"]
    l, r = left_keyed.alias("l"), right.alias("r")
    joined = l.join(r, on=cond, how="left")
    order = rt.desc() if direction == "backward" else rt.asc()
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in part_cols]).orderBy(order)
    ranked = joined.withColumn("__rn", F.row_number().over(w))
    keep = [F.col(f"l.{c}").alias(c) for c in left.columns] + [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns
    ]
    return ranked.filter(F.col("__rn") == 1).select(*keep)
