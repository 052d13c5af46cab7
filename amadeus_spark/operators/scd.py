"""Slowly-changing-dimension (SCD type 2) assembly from a change log —
the dimension-management operator every warehouse pipeline hand-rolls:
given an event stream of (key, ts, attributes), produce versioned
intervals (one row per attribute VALUE EPISODE, with its validity
window), collapsing consecutive rows whose tracked attributes did not
change.

Pure window math, so the semantics are exactly expressible in both
engines (the gate query's DuckDB oracle mirrors it clause for clause):

  1. change detection: lag(attrs) over (key ORDER BY ts, tie) — a row
     opens a new episode iff it is the first for its key or its
     attributes differ from the previous row's;
  2. interval close: lead(ts) over the same ordering on the EPISODE
     rows — each episode runs until the next one opens; the last is
     the current version.

Scale: two window passes over the same (key)-partitioned, (ts, tie)-
ordered shuffle — Spark reuses the sort between them; state per key is
one row. A 100 TB change log becomes a dimension table in two passes
with no self-join (the naive formulation joins the log to itself on
key + ts ranges, which is quadratic inside hot keys).

Reference anchor: amadeus has no temporal operators; this extends the
§2.6 beyond-reference family (as-of join, sessionization, rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Returns one row per attribute episode:

    key cols..., ``seq`` (1-based episode number per key), attr cols...,
    ``duration_us`` (microseconds until the next episode; -1 for the
    still-current version — encoded so the output stays BIGINT and
    engine-portable; ``timestampdiff`` is the NTZ-safe gap primitive).
    """
    order = [F.col(ts_col), F.col(tie_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # null-SAFE inequality: a tracked attribute that is or becomes NULL
    # must still open an episode (plain != returns NULL there and the
    # filter would silently drop the boundary); eqNullSafe also covers
    # the first-row case (prev NULL -> not equal -> kept)
    changed = df.withColumn("__prev", F.lag(attrs).over(w)).filter(
        ~attrs.eqNullSafe(F.col("__prev"))
    )
    return (
        changed.withColumn("seq", F.row_number().over(w).cast("long"))
        .withColumn(
            "duration_us",
            F.coalesce(
                F.expr(
                    f"timestampdiff(MICROSECOND, {ts_col},"
                    f" lead({ts_col}) over (partition by"
                    f" {', '.join(key_cols)} order by {ts_col}, {tie_col}))"
                ).cast("long"),
                F.lit(-1).cast("long"),
            ),
        )
        .select(*key_cols, "seq", *attr_cols, "duration_us")
    )
