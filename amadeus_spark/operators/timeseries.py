"""Time-series grid gap-filling — the other half of the hypertable
pattern (q_time_rollup is the continuous-aggregate half): TimescaleDB's
``time_bucket_gapfill + locf + interpolate`` shape, re-expressed as
Spark windows over a generated dense grid.

Beyond the reference (constellation-rs/amadeus has no time-series
operators; the brief names hypertable rollups as a target family).

Engine-portability design (the oracle hash-compares stringified rows):

- **Bucket indices are integers relative to each key's first
  observation** — ``(ts - min(ts) over key) div bucket_us``. Relative
  differences cancel any session-timezone offset (the absolute-epoch
  form would diverge between Spark session TZ and DuckDB epoch_us),
  and integer floor-div is exact in both engines.
- **Bucket value = last event in the bucket**, tie-broken by
  (ts, event_id) via row_number — fully deterministic, no float
  aggregation at all; the only doubles in the output are the raw
  values and the interpolation, whose expression SHAPE (prev + diff *
  frac) is written identically in both dialects so IEEE evaluation is
  bit-identical.
- **The dense grid is generated, not joined from a calendar table**:
  per key, ``sequence(0, max_idx)`` explodes to exactly the grid rows
  (DuckDB: ``range``). Grid length is bounded by time-range /
  bucket-width — independent of event volume, so at 100 TB the grid
  side stays tiny while the event side does one bucketing shuffle.
- **LOCF / interpolation are ignore-nulls windows per key**: the
  partition is the series key (a sensor/device/type), never empty —
  per-key window length is the grid length, bounded as above.

Bucket 0 is always observed (the anchor is the key's min ts) and the
grid ends at the last observed bucket, so LOCF never yields NULL and
interpolation always has both endpoints — no NULL-semantics divergence
to paper over (iron rule 9 satisfied by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default grid: 15-minute buckets, in µs
BUCKET_US = 15 * 60 * 1_000_000


def gap_fill(
    ev: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    bucket_us: int = BUCKET_US,
) -> DataFrame:
    """Dense per-key time grid with LOCF and linear interpolation.
    Output: key, bucket_idx BIGINT, observed BOOLEAN, v_locf DOUBLE,
    v_lerp DOUBLE — ordered by (key, bucket_idx)."""
    t0 = ev.groupBy(key_col).agg(F.min(ts_col).alias("__t0"))
    idx = F.expr(
        f"timestampdiff(MICROSECOND, __t0, {ts_col}) div {bucket_us}"
    ).alias("__idx")
    events = ev.join(F.broadcast(t0), key_col).select(
        key_col, idx, F.col(val_col).alias("__v0"), ts_col, id_col
    )
    w_rn = Window.partitionBy(key_col, "__idx").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    bucketed = (
        events.withColumn("__rn", F.row_number().over(w_rn))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__idx", F.col("__v0").alias("__v"))
    )
    grid = (
        bucketed.groupBy(key_col)
        .agg(F.max("__idx").alias("__maxi"))
        .select(
            key_col,
            F.explode(F.sequence(F.lit(0).cast("long"), "__maxi")).alias(
                "__idx"
            ),
        )
    )
    filled = grid.join(bucketed, [key_col, "__idx"], "left")

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("__idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("__idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("__v").isNotNull(), F.col("__idx"))
    staged = filled.select(
        key_col,
        "__idx",
        "__v",
        F.last("__v", ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(obs_idx, ignorenulls=True).over(w_prev).alias("__pi"),
        F.first("__v", ignorenulls=True).over(w_next).alias("__nv"),
        F.first(obs_idx, ignorenulls=True).over(w_next).alias("__ni"),
    )
    # lerp shape MUST match the oracle token-for-token: pv + (nv - pv)
    # * (CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
    lerp = F.expr(
        "CASE WHEN __v IS NOT NULL THEN __v ELSE"
        " __pv + (__nv - __pv) *"
        " (CAST(__idx - __pi AS DOUBLE) / CAST(__ni - __pi AS DOUBLE))"
        " END"
    )
    return (
        staged.select(
            key_col,
            F.col("__idx").alias("bucket_idx"),
            F.col("__v").isNotNull().alias("observed"),
            F.col("__pv").alias("v_locf"),
            lerp.alias("v_lerp"),
        )
        .orderBy(key_col, "bucket_idx")
    )


def gap_fill_oracle(
    table_expr: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    bucket_us: int = BUCKET_US,
) -> str:
    """DuckDB twin of gap_fill — same relative-integer bucketing, same
    tie-break, same window frames, same lerp expression shape."""
    return f"""
WITH __t0f AS (
  SELECT {key_col}, MIN({ts_col}) AS __t0 FROM {table_expr} GROUP BY {key_col}
), __ev AS (
  SELECT e.{key_col},
         (epoch_us(e.{ts_col}) - epoch_us(__t0f.__t0)) // {bucket_us} AS __idx,
         e.{val_col} AS __v0, e.{ts_col}, e.{id_col}
  FROM {table_expr} e JOIN __t0f USING ({key_col})
), bucketed AS (
  SELECT {key_col}, __idx, __v0 AS __v FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {key_col}, __idx
      ORDER BY {ts_col} DESC, {id_col} DESC
    ) AS __rn FROM __ev
  ) WHERE __rn = 1
), grid AS (
  SELECT {key_col}, unnest(range(0, MAX(__idx) + 1)) AS __idx
  FROM bucketed GROUP BY {key_col}
), filled AS (
  SELECT g.{key_col}, g.__idx, b.__v
  FROM grid g LEFT JOIN bucketed b USING ({key_col}, __idx)
), staged AS (
  SELECT {key_col}, __idx, __v,
         last_value(__v IGNORE NULLS) OVER w_prev AS __pv,
         last_value(CASE WHEN __v IS NOT NULL THEN __idx END IGNORE NULLS)
           OVER w_prev AS __pi,
         first_value(__v IGNORE NULLS) OVER w_next AS __nv,
         first_value(CASE WHEN __v IS NOT NULL THEN __idx END IGNORE NULLS)
           OVER w_next AS __ni
  FROM filled
  WINDOW
    w_prev AS (PARTITION BY {key_col} ORDER BY __idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY {key_col} ORDER BY __idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT {key_col},
       CAST(__idx AS BIGINT) AS bucket_idx,
       __v IS NOT NULL AS observed,
       __pv AS v_locf,
       CASE WHEN __v IS NOT NULL THEN __v ELSE
         __pv + (__nv - __pv) *
         (CAST(__idx - __pi AS DOUBLE) / CAST(__ni - __pi AS DOUBLE))
       END AS v_lerp
FROM staged ORDER BY {key_col}, bucket_idx
"""
