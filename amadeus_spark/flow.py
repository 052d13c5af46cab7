"""Fluent ParallelStream façade — the reference's combinator-chain API
shape (``source.par_stream().map(..).filter(..).count()``,
par_stream.rs:61-547) over a Spark DataFrame, so a reference user's
query reads the same left-to-right way here.

This is a ZERO-COST veneer: every combinator delegates to the module
that owns the operator (operators/transforms, aggregates, sampling,
sketches, group_sink) and just re-wraps the resulting DataFrame — no
logic lives here, so Catalyst sees one declarative plan per chain and
the plan-quality test suite keeps applying. Combinators are LAZY
(return ``Flow``); sinks are terminal (run a job, return a value or a
small DataFrame) — exactly the reference's DistributedPipe/Sink split.

Column-expression closures, not Python lambdas: the reference's map
takes an arbitrary Rust closure; here the fast path is a Catalyst
Column per the repo's no-row-Python rule, and the fully-general escape
hatch is :meth:`Flow.map_partitions` (Arrow-batched), mirroring
transforms.map_partitions_pandas.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession

from amadeus_spark.operators import aggregates, sampling, sketches, transforms
from amadeus_spark.operators.group_sink import Sink, group_by_sink


class Flow:
    """A lazily-composed stream of rows (the reference's ParallelStream /
    DistributedStream — one type here, since partitioning is Spark's
    concern; SURVEY §2.7)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ---- sources (par_stream.rs: IteratorParallelStream / Source) ----

    @classmethod
    def of(cls, spark: SparkSession, rows, schema=None) -> "Flow":
        """In-memory collection source (the reference's
        ``.into_par_stream()`` on iterators)."""
        return cls(spark.createDataFrame(rows, schema))

    # ---- combinators: lazy, return Flow (par_stream.rs:61-135) ----

    def map(self, **cols: Column) -> "Flow":
        """1→1 named column transforms (``map``, par_stream.rs:79-85);
        also covers ``update`` when a name overwrites an existing
        column (par_stream.rs:70-76)."""
        return Flow(transforms.map_rows(self.df, **cols))

    update = map  # the reference's update is map-overwrite

    def filter(self, cond: Column) -> "Flow":
        return Flow(self.df.filter(cond))

    def flat_map(self, **out_cols: Column) -> "Flow":
        """1→N: generator expressions (explode/posexplode/inline) expand
        in the Generate node (par_stream.rs:88-95)."""
        return Flow(transforms.flat_map(self.df, dict(out_cols)))

    def inspect(self, observation, *metrics: Column) -> "Flow":
        return Flow(transforms.inspect(self.df, observation, *metrics))

    def chain(self, *others: "Flow") -> "Flow":
        return Flow(transforms.chain(self.df, *[o.df for o in others]))

    def map_partitions(
        self, fn: Callable[[Iterable], Iterable], schema
    ) -> "Flow":
        """Fully-general closure escape hatch (Arrow-batched, never
        row-at-a-time) — the reference's arbitrary-closure map."""
        return Flow(transforms.map_partitions_pandas(self.df, fn, schema))

    def identity(self) -> "Flow":  # par_stream Identity combinator
        return self

    def cloned(self) -> "Flow":
        """The reference's ``cloned`` exists for Rust ownership; a
        DataFrame is immutable, so this is a plan-sharing alias."""
        return Flow(self.df)

    def pipe(self, fn: Callable[["Flow"], "Flow"]) -> "Flow":
        """Apply a reusable sub-pipeline (the reference's ``pipe``)."""
        return fn(self)

    # ---- distribution knobs (§2.7: ThreadPool/ProcessPool analogs) ----

    def repartition(self, n: int, *cols) -> "Flow":
        return Flow(self.df.repartition(n, *cols))

    # ---- sinks: terminal, run a job (par_sink/*) ----

    def count(self) -> int:
        return self.df.count()

    def collect(self) -> list:
        return self.df.collect()

    def to_df(self) -> DataFrame:
        return self.df

    def for_each(self, f: Callable, per_partition: bool = True) -> None:
        transforms.for_each(self.df, f, per_partition)

    def summary(self, col: str) -> DataFrame:
        """count/sum/mean/stddev_pop in ONE pass (the reference's tuple
        sink, par_sink/tuple.rs via fork)."""
        return aggregates.summary_agg(self.df, col)

    def histogram(self, col: str) -> DataFrame:
        return aggregates.histogram(self.df, col)

    def max_by(self, value_col: str, ord_col: str) -> DataFrame:
        return aggregates.max_by(self.df, value_col, ord_col)

    def min_by(self, value_col: str, ord_col: str) -> DataFrame:
        return aggregates.min_by(self.df, value_col, ord_col)

    def all(self, predicate: Column) -> bool:
        return aggregates.all_match(self.df, predicate)

    def any(self, predicate: Column) -> bool:
        return aggregates.any_match(self.df, predicate)

    def fork(self, sink_a, sink_b):
        """Two sinks, one pass (par_sink/fork.rs)."""
        return aggregates.fork(self.df, sink_a, sink_b)

    def group_by(self, keys: list[str], sinks: dict[str, Sink]) -> DataFrame:
        """``group_by(nested sink)`` in its full generality
        (par_sink/group_by.rs): any composition of the Sink specs."""
        return group_by_sink(self.df, keys, sinks)

    def most_frequent(self, col: str, k: int) -> DataFrame:
        return sketches.most_frequent(self.df, col, k)

    def most_distinct(self, key_col: str, val_col: str, k: int) -> DataFrame:
        return sketches.most_distinct(self.df, key_col, val_col, k)

    def sort_n_by(self, n: int, *order: Column) -> DataFrame:
        return sampling.sort_n_by(self.df, n, *order)

    def sample_unstable(self, k: int, seed: int = 42) -> DataFrame:
        return sampling.reservoir_sample(self.df, k, seed)
