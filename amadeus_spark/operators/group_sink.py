"""Composable per-group sinks — the reference's ``group_by(sink)``
generality (amadeus/src/par_sink/group_by.rs:23-392, nested-sink contract
par_sink/folder.rs:17-71): a GroupBy sink nests an ARBITRARY inner sink —
reservoir sample, top-n, count-distinct sketch, scalar folds — evaluated
per key in one pass over the stream. ``groupBy().agg()`` already covers
scalar folds; what it lacks is BOUNDED per-group collection sinks composed
with scalars in the same pass, without ever holding a whole group in one
task.

This module compiles a ``{name: Sink}`` spec into a two-level aggregation
tree — the reference's push/merge folder contract mapped onto Spark:

- **level 1** groups by ``(keys, spark_partition_id())``: every group
  slice is confined to its input partition, so no aggregation state ever
  exceeds one ~128 MB partition, regardless of key skew (the push step);
  bounded sinks truncate to their bound here.
- **level 2** groups by ``keys`` and merges partials: sums of counts,
  HLL union, sort+flatten+re-slice for bounded sinks (the merge step).
  Each (key, partition) contributes O(bound) bytes, so the level-2
  shuffle and reducer state are O(bound × partitions-per-key) — a
  hot key at 100 TB costs kilobytes here, not an OOM.

The price vs a naive single ``groupBy`` is one extra exchange of the
collected columns; the naive plan's final merge holds the LARGEST GROUP
in one task, which is exactly the skew profile (boilerplate keys, null
keys) that kills corpus-scale jobs. No windows (the empty/low-cardinality
partitionBy trap), no UDFs, no driver loops — every stage is codegen'd
Catalyst aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Sink:
    """One per-group sink: contributes partial aggregates (level 1),
    merge aggregates (level 2), and a finishing expression."""

    def partials(self, tag: str) -> list[tuple[str, Column]]:
        raise NotImplementedError

    def merges(self, tag: str) -> list[tuple[str, Column]]:
        raise NotImplementedError

    def final(self, tag: str, out: str) -> Column:
        raise NotImplementedError


@dataclass(frozen=True)
class count(Sink):  # noqa: N801 — sink specs read as lowercase combinators
    """Row count per group (par_sink/count.rs)."""

    def partials(self, tag):
        return [(f"{tag}_c", F.count(F.lit(1)))]

    def merges(self, tag):
        return [(f"{tag}_c", F.sum(f"{tag}_c"))]

    def final(self, tag, out):
        return F.col(f"{tag}_c").cast("bigint").alias(out)


@dataclass(frozen=True)
class money_sum(Sink):  # noqa: N801
    """Exact money sum per group (par_sink/sum.rs with the repo's
    micro-unit discipline): per-row round to integer micro-units, sum
    longs (order-independent, engine-exact), finish as double."""

    col: str

    def partials(self, tag):
        v = F.round(F.col(self.col) * 1e6).cast("long")
        return [(f"{tag}_us", F.sum(v))]

    def merges(self, tag):
        return [(f"{tag}_us", F.sum(f"{tag}_us"))]

    def final(self, tag, out):
        return (F.col(f"{tag}_us") / F.lit(1e6)).alias(out)


@dataclass(frozen=True)
class max_(Sink):  # noqa: N801
    col: str

    def partials(self, tag):
        return [(f"{tag}_m", F.max(self.col))]

    def merges(self, tag):
        return [(f"{tag}_m", F.max(f"{tag}_m"))]

    def final(self, tag, out):
        return F.col(f"{tag}_m").alias(out)


@dataclass(frozen=True)
class min_(Sink):  # noqa: N801
    col: str

    def partials(self, tag):
        return [(f"{tag}_m", F.min(self.col))]

    def merges(self, tag):
        return [(f"{tag}_m", F.min(f"{tag}_m"))]

    def final(self, tag, out):
        return F.col(f"{tag}_m").alias(out)


@dataclass(frozen=True)
class approx_distinct(Sink):  # noqa: N801
    """Mergeable per-group HLL (par_sink/distinct.rs:138-260): level 1
    builds a Datasketches HLL per (key, partition), level 2 unions the
    binary sketches — raw values cross the wire once, the merge moves
    only sketch bytes (the reference's UnionAssign posture)."""

    col: str
    lgk: int = 12

    def partials(self, tag):
        return [(f"{tag}_h", F.hll_sketch_agg(self.col, F.lit(self.lgk)))]

    def merges(self, tag):
        return [(f"{tag}_h", F.hll_union_agg(f"{tag}_h"))]

    def final(self, tag, out):
        return F.hll_sketch_estimate(f"{tag}_h").cast("bigint").alias(out)


@dataclass(frozen=True)
class sample_k(Sink):  # noqa: N801
    """Exact-k deterministic per-group sample (par_sink/sample.rs:125-185
    semantics, engine-reproducible): rank rows by md5(salt || key) — a
    fixed uniform permutation — keep the k smallest. Truncates to k at
    level 1, so a group's sample state is k rows per partition no matter
    how many rows the group has. Output: array of the k sampled keys in
    hash order (use ``array_join`` for a scalar projection)."""

    key: str
    k: int
    salt: str = "rs"

    def _item(self) -> Column:
        h = F.md5(F.concat(F.lit(self.salt), F.col(self.key).cast("string")))
        return F.struct(h.alias("h"), F.col(self.key).alias("v"))

    def partials(self, tag):
        return [
            (
                f"{tag}_s",
                F.slice(F.sort_array(F.collect_list(self._item())), 1, self.k),
            )
        ]

    def merges(self, tag):
        return [
            (
                f"{tag}_s",
                F.slice(
                    F.sort_array(F.flatten(F.collect_list(f"{tag}_s"))),
                    1,
                    self.k,
                ),
            )
        ]

    def final(self, tag, out):
        return F.expr(f"transform({tag}_s, x -> x.v)").alias(out)


@dataclass(frozen=True)
class top_n(Sink):  # noqa: N801
    """Bounded per-group top-n by a value column, descending, ties broken
    by the payload key (sort.rs:24-31 / par_sink/top.rs nested per group).
    Same two-level truncation as sample_k — a group never contributes
    more than n rows per partition past level 1."""

    val: str
    key: str
    n: int

    def _item(self) -> Column:
        # negate numeric val so ascending struct sort = descending value;
        # tie-break ascending on key for engine determinism
        return F.struct(
            (-F.col(self.val)).alias("nv"), F.col(self.key).alias("v")
        )

    def partials(self, tag):
        return [
            (
                f"{tag}_t",
                F.slice(F.sort_array(F.collect_list(self._item())), 1, self.n),
            )
        ]

    def merges(self, tag):
        return [
            (
                f"{tag}_t",
                F.slice(
                    F.sort_array(F.flatten(F.collect_list(f"{tag}_t"))),
                    1,
                    self.n,
                ),
            )
        ]

    def final(self, tag, out):
        return F.expr(f"transform({tag}_t, x -> x.v)").alias(out)


def group_by_sink(
    df: DataFrame, keys: Sequence[str], spec: dict[str, Sink]
) -> DataFrame:
    """Evaluate every sink in ``spec`` per group of ``keys`` in one pass.

    Returns one row per group with the keys plus one column per sink
    name. See module docstring for the two-level plan shape.
    """
    keys = list(keys)
    partials: list[Column] = []
    merges: list[Column] = []
    finals: list[Column] = [F.col(k) for k in keys]
    for i, (out, sink) in enumerate(spec.items()):
        tag = f"__s{i}"
        partials.extend(c.alias(a) for a, c in sink.partials(tag))
        merges.extend(c.alias(a) for a, c in sink.merges(tag))
        finals.append(sink.final(tag, out))
    level1 = df.withColumn("__pid", F.spark_partition_id()).groupBy(
        *keys, "__pid"
    )
    merged = level1.agg(*partials).groupBy(*keys).agg(*merges)
    return merged.select(*finals)
