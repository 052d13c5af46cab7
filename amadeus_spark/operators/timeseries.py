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
    # persist: bucketed feeds BOTH the grid-extent aggregate and the
    # grid left join — unpersisted, the scan+bucket+rank subtree (the
    # expensive part) executes once per consumer (measured 0.5 s × 2
    # of this query's 2.5 s at sf0.1).
    from amadeus_spark.cache import tracked_persist

    bucketed = tracked_persist(
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


# ---- event-sequence analytics: funnel + cohort retention ------------------

#: default conversion window for funnel steps: 24 h in µs
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000

#: default cohort period: 7 days in µs
COHORT_PERIOD_US = 7 * 24 * 3600 * 1_000_000


def rolling_window_stats(
    ev: DataFrame,
    keys: tuple[str, ...] = ("event_type", "user_id"),
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    window_us: int = 3600 * 1_000_000,
) -> DataFrame:
    """Trailing time-window aggregates per event — RANGE-frame windows
    over integer µs offsets (count + exact micro-unit value sum in the
    last ``window_us`` ending at each event, peers included on ties
    exactly as SQL RANGE frames define). Offsets are relative to each
    key's min ts so timezone offsets cancel (the gap_fill trick); sums
    are integer micro-units (iron rule 2) so the trailing sum is
    bit-identical in both engines.

    ``keys`` is the scale lever: a RANGE frame cannot be sharded
    (frames span neighbors), so one series key = one window task —
    the default keys on a FINE series (per user per type) so the
    partition count grows with the data, unlike a coarse
    per-type-only key whose windows become whole-corpus stragglers
    at 100× (the sequence_packing lesson from round 4)."""
    keylist = list(keys)
    t0 = ev.groupBy(*keylist).agg(F.min(ts_col).alias("__t0"))
    base = ev.join(F.broadcast(t0), keylist).select(
        *keylist,
        F.col(id_col).alias("event_id"),
        F.expr(f"timestampdiff(MICROSECOND, __t0, {ts_col})").alias(
            "off_us"
        ),
        F.round(F.col(val_col) * 1e6).cast("long").alias("__v_us"),
    )
    w = (
        Window.partitionBy(*keylist)
        .orderBy("off_us")
        .rangeBetween(-(window_us - 1), 0)
    )
    return base.select(
        *keylist,
        "event_id",
        "off_us",
        F.count(F.lit(1)).over(w).alias("n_win"),
        (F.sum("__v_us").over(w) / F.lit(1e6)).alias("v_win"),
    ).orderBy(*keylist, "off_us", "event_id")


def rolling_window_oracle(
    table_expr: str,
    keys: tuple[str, ...] = ("event_type", "user_id"),
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    window_us: int = 3600 * 1_000_000,
) -> str:
    """DuckDB twin of rolling_window_stats — same RANGE frame."""
    ks = ", ".join(keys)
    eks = ", ".join(f"e.{k}" for k in keys)
    return f"""
WITH __t0f AS (
  SELECT {ks}, MIN({ts_col}) AS __t0 FROM {table_expr} GROUP BY {ks}
), base AS (
  SELECT {eks}, e.{id_col} AS event_id,
         epoch_us(e.{ts_col}) - epoch_us(__t0f.__t0) AS off_us,
         CAST(ROUND(e.{val_col} * 1000000) AS BIGINT) AS __v_us
  FROM {table_expr} e JOIN __t0f USING ({ks})
)
SELECT {ks}, event_id, CAST(off_us AS BIGINT) AS off_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
       CAST(SUM(__v_us) OVER w AS DOUBLE) / 1000000 AS v_win
FROM base
WINDOW w AS (PARTITION BY {ks} ORDER BY off_us
             RANGE BETWEEN {window_us - 1} PRECEDING AND CURRENT ROW)
ORDER BY {ks}, off_us, event_id
"""


def funnel(
    ev: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_us: int = FUNNEL_WINDOW_US,
) -> DataFrame:
    """Ordered-step conversion funnel: a user converts step i when an
    event of type ``steps[i]`` happens STRICTLY AFTER their step-(i-1)
    completion, within ``window_us`` of their step-0 entry (first
    qualifying event wins each step — the standard product-analytics
    semantics).

    Plan: each stage is (filter by type) ⋈ (previous stage's per-user
    frame) → per-user min — the stage frames carry ONE ROW PER
    CONVERTED USER, shrinking monotonically, so every join after the
    first is against an ever-smaller key set; no windows, no event-side
    state. Output one row per stage: stage BIGINT, step STRING,
    n_users BIGINT, total_lag_us BIGINT (sum of entry→step latency,
    exact integer µs — divide by n_users for the mean offline).
    """
    t1 = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t1"))
        .withColumn("__tp", F.col("__t1"))
    )
    stages = [t1]
    for st in steps[1:]:
        prev = stages[-1]
        nxt = (
            ev.filter(F.col(type_col) == st)
            .join(prev.select(user_col, "__t1", "__tp"), user_col)
            .filter(
                (F.col(ts_col) > F.col("__tp"))
                & (
                    F.expr(f"timestampdiff(MICROSECOND, __t1, {ts_col})")
                    <= window_us
                )
            )
            .groupBy(user_col)
            .agg(
                F.min("__t1").alias("__t1"),
                F.min(ts_col).alias("__tp"),
            )
        )
        stages.append(nxt)
    outs = []
    for i, (st, frame) in enumerate(zip(steps, stages), 1):
        outs.append(
            frame.agg(
                F.lit(i).cast("bigint").alias("stage"),
                F.lit(st).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
                F.coalesce(
                    F.sum(F.expr("timestampdiff(MICROSECOND, __t1, __tp)")),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("total_lag_us"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("stage")


def funnel_oracle(
    table_expr: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_us: int = FUNNEL_WINDOW_US,
) -> str:
    """DuckDB twin of funnel — identical stage recursion."""
    ctes = [
        f"""s1 AS (
  SELECT {user_col}, MIN({ts_col}) AS __t1, MIN({ts_col}) AS __tp
  FROM {table_expr} WHERE {type_col} = '{steps[0]}' GROUP BY {user_col}
)"""
    ]
    for i, st in enumerate(steps[1:], 2):
        ctes.append(
            f"""s{i} AS (
  SELECT e.{user_col}, MIN(p.__t1) AS __t1, MIN(e.{ts_col}) AS __tp
  FROM {table_expr} e JOIN s{i - 1} p USING ({user_col})
  WHERE e.{type_col} = '{st}' AND e.{ts_col} > p.__tp
    AND epoch_us(e.{ts_col}) - epoch_us(p.__t1) <= {window_us}
  GROUP BY e.{user_col}
)"""
        )
    selects = [
        f"""SELECT CAST({i} AS BIGINT) AS stage, '{st}' AS step,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(epoch_us(__tp) - epoch_us(__t1)), 0) AS BIGINT)
         AS total_lag_us
FROM s{i}"""
        for i, st in enumerate(steps, 1)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY stage"
    )


def cohort_retention(
    ev: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = COHORT_PERIOD_US,
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen period,
    counted as retained in each later period they were active. All
    integer arithmetic anchored at the GLOBAL min ts — obtained as a
    1-row aggregate broadcast-cross-joined in (the Q11 pattern; never
    an empty-partitionBy window). Output: cohort BIGINT, offset BIGINT
    (periods since cohort), n_users BIGINT."""
    anchor = ev.agg(F.min(ts_col).alias("__g0"))
    base = ev.select(user_col, ts_col).crossJoin(F.broadcast(anchor))
    period = F.expr(
        f"timestampdiff(MICROSECOND, __g0, {ts_col}) div {period_us}"
    )
    activity = base.select(
        user_col, period.cast("bigint").alias("__p")
    ).distinct()
    cohorts = activity.groupBy(user_col).agg(F.min("__p").alias("__c"))
    return (
        activity.join(cohorts, user_col)
        .groupBy(
            F.col("__c").alias("cohort"),
            (F.col("__p") - F.col("__c")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "offset")
    )


def cohort_retention_oracle(
    table_expr: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = COHORT_PERIOD_US,
) -> str:
    """DuckDB twin of cohort_retention — same anchored integer math."""
    return f"""
WITH __anchor AS (
  SELECT MIN({ts_col}) AS __g0 FROM {table_expr}
), activity AS (
  SELECT DISTINCT {user_col},
         (epoch_us({ts_col}) - epoch_us(__g0)) // {period_us} AS __p
  FROM {table_expr} CROSS JOIN __anchor
), cohorts AS (
  SELECT {user_col}, MIN(__p) AS __c FROM activity GROUP BY {user_col}
)
SELECT CAST(c.__c AS BIGINT) AS cohort,
       CAST(a.__p - c.__c AS BIGINT) AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity a JOIN cohorts c USING ({user_col})
GROUP BY 1, 2 ORDER BY cohort, "offset"
"""
