"""Row transforms / projections / filters — SURVEY.md §2.2.

In the reference these are arbitrary serialized Rust closures
(map/flat_map/filter/update/inspect, par_stream.rs:61-135). The Spark-first
translation keeps the hot path in Catalyst expressions (JVM,
whole-stage-codegen) and only drops to Pandas UDFs when a transform can't
be expressed as columns — the reference's closure generality is the *slow*
path here, not the default.

map        → select/withColumn           (par_stream.rs:79-85)
flat_map   → select(explode(...))        (par_stream.rs:88-95)
filter     → df.filter(expr)             (par_stream.rs:98-104)
update     → withColumn overwrite        (par_stream.rs:70-76)
inspect    → df.foreach / observe        (par_stream.rs:61-67)
chain      → unionAll                    (par_stream.rs:129-135)
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame


def map_rows(df: DataFrame, **cols: Column) -> DataFrame:
    """1→1 transform via named column expressions (the fast path for the
    reference's ``map``)."""
    return df.withColumns(dict(cols))


def flat_map(df: DataFrame, out_cols: dict[str, Column]) -> DataFrame:
    """1→N transform: every expression in ``out_cols`` may be a generator
    (explode/posexplode/inline) — Spark expands them in the Generate node."""
    return df.select(*[c.alias(n) for n, c in out_cols.items()])


def chain(*dfs: DataFrame) -> DataFrame:
    """Concatenate streams (reference ``chain`` = union-all, no dedup)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionAll(d)
    return out


def inspect(df: DataFrame, observation, *metrics: Column) -> DataFrame:
    """Side-effecting peek (reference ``inspect``, par_stream.rs:61-67):
    ``df.observe`` attaches named metrics evaluated during the next
    action without altering the stream — the scalable analog of the
    reference's &item closure (no driver round-trip, no extra pass).
    ``observation``: a pyspark Observation (read back via ``.get``) or a
    string name (read back via QueryExecutionListener)."""
    return df.observe(observation, *metrics)


def map_partitions_pandas(
    df: DataFrame, fn: Callable[[Iterable[pd.DataFrame]], Iterable[pd.DataFrame]], schema
) -> DataFrame:
    """Escape hatch for closures with no expression equivalent — the
    reference's fully-general ``map``. Arrow-batched (mapInPandas), never
    row-at-a-time."""
    return df.mapInPandas(fn, schema=schema)


def for_each(df: DataFrame, f: Callable, per_partition: bool = True) -> None:
    """Terminal side-effecting sink (reference ``for_each``,
    par_sink/for_each.rs: consume the stream, apply a closure per item,
    return nothing).

    Spark-first shape: ``foreachPartition`` by default so the closure
    amortizes any setup (connections, buffers) across a partition — the
    per-item variant (``per_partition=False``) is the literal reference
    semantic but pays per-row overhead. Runs distributed; the closure
    executes on executors, so side effects must be executor-safe
    (idempotent under task retries)."""
    if per_partition:
        df.foreachPartition(lambda rows: f(rows))
    else:
        df.foreach(f)


def flat_map_udtf(spark, cls, table_arg: DataFrame, name: str) -> DataFrame:
    """1→N transform as a Spark 4 Python UDTF over a whole table — the
    API member that matches the reference's closure-based ``flat_map``
    most literally: a Python class whose ``eval`` yields any number of
    rows per input row (plus optional ``terminate`` for end-of-partition
    state flush, which a pure explode can't express).

    Registers ``cls`` (already decorated with @udtf) under ``name`` and
    applies it to ``table_arg`` via TABLE(...) syntax. This is the SLOW
    path — prefer ``flat_map`` (Generate node) whenever the expansion is
    expressible as explode/inline; a UDTF exists for generators that
    carry per-partition Python state."""
    spark.udtf.register(name, cls)
    table_arg.createOrReplaceTempView(f"__{name}_in")
    return spark.sql(f"SELECT * FROM {name}(TABLE(__{name}_in))")
