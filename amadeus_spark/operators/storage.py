"""Physical-layout operators: bucketing and skew salting — the two
techniques that keep 100 TB joins off the shuffle.

- **Bucketing**: writing both join sides bucketed by the join key (same
  bucket count) lets Spark plan a SortMergeJoin with NO Exchange on
  either side — the co-location was paid once at write time. This is the
  managed-table analog of the reference's implicit co-partitioning (its
  broadcast-only joins never shuffle because the right side ships whole,
  join.rs:71-125 — bucketing gives the same no-shuffle property without
  the fits-in-memory constraint).
- **Salting**: a skewed key (one customer with 10% of all rows) turns
  one reducer into the straggler. Salting splits each hot left-side key
  into ``n_salts`` synthetic keys and replicates the right side per
  salt — the shuffle spreads the hot key over n reducers. AQE's
  skew-join handles moderate skew automatically; explicit salting is
  for the pathological tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. Both
    sides of a recurring join should use the SAME bucket count on the
    join key; subsequent joins skip the Exchange entirely."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on) -> DataFrame:
    """Join two same-bucketed tables — plans shuffle-free when bucket
    specs line up (verify with plans.shuffle_count == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: left rows get a random salt in
    [0, n_salts), the right side is replicated once per salt, and the
    join key becomes (key, salt). Row multiplicity is unchanged (each
    left row matches exactly the one replica with its salt), so results
    equal the plain join — only the shuffle distribution differs.

    Cost: right side inflated ×n_salts — use for joins where the right
    side is modest but too big to broadcast and the left is skewed.

    Only inner/left/left_semi preserve multiplicity under salting: a
    right/full outer join would emit each unmatched right row once per
    replica, so those types are rejected."""
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: outer "
            "joins would duplicate unmatched right rows per salt replica"
        )
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")
