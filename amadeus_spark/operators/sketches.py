"""Approximate / sketch aggregations — the reference's distinctive surface.

Reference (constellation-rs/amadeus):
- ``most_frequent(n, probability, tolerance)`` — Top-k heavy hitters via a
  Top<Item,usize> ordered map + Count-Min sketch with conservative update
  (amadeus-core/src/par_stream.rs:334-348; amadeus-streaming/src/top.rs:18-45,
  count_min.rs:43-96).
- ``most_distinct(n, probability, tolerance, error_rate)`` — top-k keys by
  approximate COUNT(DISTINCT value): Top<A, HyperLogLogMagnitude<B>>
  (par_stream.rs:351-372; amadeus-streaming/src/distinct.rs:138-166, with
  p = ceil(2*log2(1.04/error_rate)) — the same ε→precision relationship
  Spark's HLL++ ``approx_count_distinct(rsd)`` uses).

Spark-first design
------------------
These are *aggregations over a grouped stream*, so the idiomatic plan is
``groupBy(key).agg(...) .orderBy(desc).limit(n)``:

- partial aggregation is map-side (Spark's HashAggregate partial/final ≈
  the reference's ReduceA/ReduceB/ReduceC folding, par_sink/folder.rs:17-57);
- the top-n is TakeOrderedAndProject — no global sort, each partition
  keeps n rows, driver merges (same algorithm as the reference's
  sort_n_by, amadeus-streaming/src/sort.rs:24-31);
- ``approx_count_distinct`` is HLL++, mergeable, fixed-size state — at
  100 TB the shuffle carries one sketch per key per partition, not the
  value set. This is the scale path; exact countDistinct shuffles every
  distinct (key, value) pair and is provided for oracle checking.

Determinism: the *exact* variants break count ties by key so LIMIT is
stable and oracle-comparable; approx variants are for scale, checked by
acceptance band instead of hash equality (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def most_frequent(
    df: DataFrame,
    key,
    n: int,
    exact: bool = True,
) -> DataFrame:
    """Top-n most frequent keys with their counts.

    Reference: par_stream.rs:334-348 (``most_frequent``). Exact mode is a
    semantic superset of the reference's CMS-backed estimate (SURVEY §2.5).
    Returns columns (key..., freq), ties broken by key ascending.
    """
    keys = [key] if isinstance(key, (str, Column)) else list(key)
    out = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), *[F.asc(k) for k in keys])
        .limit(n)
    )
    return out


def most_distinct(
    df: DataFrame,
    key,
    value,
    n: int,
    error_rate: float | None = None,
) -> DataFrame:
    """Top-n keys by (approximate) COUNT(DISTINCT value).

    Reference: par_stream.rs:351-372 (``most_distinct``), HLL at
    distinct.rs:138-166. ``error_rate`` maps to Spark HLL++ ``rsd``;
    ``None`` = exact countDistinct (oracle-checkable).
    Returns (key..., distinct_vals), ties broken by key ascending.
    """
    keys = [key] if isinstance(key, (str, Column)) else list(key)
    if error_rate is None:
        agg = F.count_distinct(F.col(value) if isinstance(value, str) else value)
    else:
        agg = F.approx_count_distinct(value, rsd=error_rate)
    return (
        df.groupBy(*keys)
        .agg(agg.alias("distinct_vals"))
        .orderBy(F.desc("distinct_vals"), *[F.asc(k) for k in keys])
        .limit(n)
    )


def count_min_width_depth(probability: float, tolerance: float) -> tuple[int, int]:
    """The reference's CMS sizing (count_min.rs:58-77):
    width = ceil(e / tolerance), depth = ceil(ln(1 - probability) / ln(0.5)).
    Exposed so a pandas-UDAF CMS can match sketch parameters exactly."""
    import math

    width = math.ceil(math.e / tolerance)
    depth = math.ceil(math.log(1.0 - probability) / math.log(0.5))
    return width, depth


def hll_sketch_rollup(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable HLL sketch COLUMNS (Spark 4 Datasketches): per-group
    distinct-count state as data — the reference's mergeable-sketch
    design (amadeus-streaming/src/traits.rs UnionAssign; HyperLogLog in
    distinct.rs) made first-class: a pre-aggregated sketch table can
    answer distinct-count queries over ANY union of groups later
    without rescanning raw data (hll_union_agg merges partials), the
    continuous-aggregate pattern time_rollup applies to sums. State is
    ~2^lg_k bytes per group regardless of cardinality."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("hll_sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_merge_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge pre-aggregated sketch partials (optionally re-grouped to a
    coarser key) and estimate: the raw table is never touched."""
    agg = [
        F.expr("hll_sketch_estimate(hll_union_agg(hll_sk))").alias(
            "distinct_est"
        ),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def hll_set_estimates(
    sketches: DataFrame, key_col: str, group_a, group_b
) -> DataFrame:
    """Set-operation estimates between two groups of a sketch table —
    union directly (HLL unions losslessly), intersection and difference
    by inclusion-exclusion over the union estimate:

        |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)
        |A \\ B| ≈ est(A ∪ B) − est(B)

    The raw table is never rescanned: both sides and their union come
    from merging the stored partials. Inclusion-exclusion inherits HLL's
    relative error on each term, so small intersections of large sets
    are noisy (clamped at 0) — the standard, documented trade; exact
    intersections need the raw data or theta sketches. Returns one row:
    est_a, est_b, est_union, est_intersection, est_a_minus_b."""
    a = sketches.filter(F.col(key_col).isin(group_a)).agg(
        F.expr("hll_union_agg(hll_sk)").alias("sk_a")
    )
    b = sketches.filter(F.col(key_col).isin(group_b)).agg(
        F.expr("hll_union_agg(hll_sk)").alias("sk_b")
    )
    return (
        a.join(b)
        .select(
            F.expr("hll_sketch_estimate(sk_a)").alias("est_a"),
            F.expr("hll_sketch_estimate(sk_b)").alias("est_b"),
            F.expr(
                "hll_sketch_estimate(hll_union(sk_a, sk_b))"
            ).alias("est_union"),
        )
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0), F.col("est_a") + F.col("est_b") - F.col("est_union")
            ).alias("est_intersection"),
            (F.col("est_union") - F.col("est_b")).alias("est_a_minus_b"),
        )
    )
