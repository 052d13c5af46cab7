"""Plan-shape barrier — pin a projection so the optimizer cannot
re-inline its column expressions into every downstream consumer.

CollapseProject and filter-pushdown substitution duplicate a produced
column's defining EXPRESSION into each consumer that references it; for
an expensive producer (a regexp_replace normalize chain, an interpreted
HOF) that multiplies the hottest per-row work by the consumer count —
corpusflow_e2e's fully collapsed plan carried 13 inlined copies of the
9-deep normalize chain before this barrier existed (measured 2.2x
whole-query).

``plan_barrier`` packs the row into a single-element struct array and
explodes it back: the Generate node evaluates the projection exactly
once per row, and its outputs are *generated attributes* that neither
CollapseProject nor predicate substitution can rewrite through. The
struct round trip is codegen'd JVM work — no shuffle, no Python
boundary, per-partition order and cardinality preserved.

Costs to know about: one struct copy per row (negligible next to any
expression worth pinning), and attribute METADATA does not survive the
struct round trip (re-apply ``withWatermark`` after the barrier on
streaming frames, not before). Requires distinct column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_barrier(df: DataFrame) -> DataFrame:
    """Materialize every column of ``df`` exactly once per row behind a
    Generate node (see module docstring). Same rows, same schema.

    The barrier also blocks column PRUNING below the Generate (every
    packed column is scanned even if downstream reads two) — project to
    the columns you need BEFORE pinning. Column names must be distinct
    or ``getField`` silently resolves every duplicate to the first."""
    cols = df.columns
    if len(set(cols)) != len(cols):
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(
            f"plan_barrier needs distinct column names (duplicated: "
            f"{dupes}) — getField would misresolve the copies"
        )
    packed = F.explode(
        F.array(F.struct(*[F.col(c) for c in cols]))
    ).alias("__pin")
    return df.select(packed).select(
        *[F.col("__pin").getField(c).alias(c) for c in cols]
    )
