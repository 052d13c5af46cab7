"""Nested-type operators: array / map / struct *data* queries.

The reference makes List/Map/Group first-class in its `Value` model
(amadeus-types/src/value.rs:148-153) and its test corpus leans hard on
nested parquet (tests/parquet.rs:113-290; nested_lists.snappy /
nested_maps.snappy fixtures). The repo's type registry maps those types
(sources/readers.py); this module exercises the *data*: build nested
columns with collect_list/struct/map_from_entries, operate on them with
array HOFs / map_keys / map_values / element_at / struct field access,
explode back out, and aggregate flat — the full nested round-trip.

Scale notes:
- Nested build is one shuffle (the groupBy); everything after is
  map-side projection until the final small re-aggregation.
- Per-order arrays are bounded (O(lines per order)) — no unbounded
  collect_list. Never collect_list an unbounded group at 100 TB.
- Both queries return only BIGINT/STRING columns (driver compare rule).

Each query has a DuckDB oracle twin built here so dialects stay in
lockstep (list_sort/list(…) ≈ sort_array/collect_list; struct_pack ≈
struct; map access is ``m[k]`` (value) in Spark vs ``m[k][1]`` (list)
in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amadeus_spark.cache import tracked_persist


def nested_array_ops(li: DataFrame) -> DataFrame:
    """Per-order quantity arrays → array ops → explode back → flat stats.

    collect_list per order (sorted for determinism), element_at head/
    tail, aggregate-HOF sum, filter-HOF even count, then posexplode back
    to rows for a position-weighted sum — grouped by array length so the
    output is a small flat table.
    """
    per = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.col("l_quantity").cast("bigint"))
            ).alias("arr")
        )
    )
    # two consumers below (scalar stats + explode branch): without
    # persist the groupBy subtree runs twice (no plan-level CSE)
    per = tracked_persist(per)
    stats = per.select(
        F.size("arr").cast("bigint").alias("n_items"),
        F.element_at("arr", 1).alias("min_qty"),
        F.element_at("arr", -1).alias("max_qty"),
        F.expr("aggregate(arr, 0L, (acc, x) -> acc + x)").alias("asum"),
        F.expr("cast(size(filter(arr, x -> x % 2 = 0)) as bigint)").alias("n_even"),
    )
    agg = (
        stats.groupBy("n_items")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("asum").alias("total_qty"),
            F.sum("n_even").alias("total_even"),
            F.max("max_qty").alias("max_qty"),
            F.sum("min_qty").alias("sum_min_qty"),
        )
    )
    expl = per.select(
        F.size("arr").cast("bigint").alias("n_items"),
        F.posexplode("arr").alias("pos", "val"),
    )
    wsum = expl.groupBy("n_items").agg(
        F.sum((F.col("pos") + 1) * F.col("val")).alias("weighted_sum")
    )
    return agg.join(wsum, "n_items").orderBy("n_items")


def nested_array_ops_oracle(table: str = "lineitem") -> str:
    return f"""
WITH per AS MATERIALIZED (
  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS arr
  FROM {table} GROUP BY l_orderkey
), stats AS (
  SELECT CAST(len(arr) AS BIGINT) AS n_items, arr[1] AS min_qty, arr[-1] AS max_qty,
         CAST(list_sum(arr) AS BIGINT) AS asum,
         CAST(len(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_even
  FROM per
), agg AS (
  SELECT n_items, COUNT(*) AS n_orders, CAST(SUM(asum) AS BIGINT) AS total_qty,
         CAST(SUM(n_even) AS BIGINT) AS total_even, MAX(max_qty) AS max_qty,
         CAST(SUM(min_qty) AS BIGINT) AS sum_min_qty
  FROM stats GROUP BY n_items
), expl AS (
  SELECT CAST(len(arr) AS BIGINT) AS n_items, i AS pos, arr[i] AS val
  FROM per, unnest(range(1, len(arr) + 1)) AS t(i)
), wsum AS (
  SELECT n_items, CAST(SUM(pos * val) AS BIGINT) AS weighted_sum
  FROM expl GROUP BY n_items
)
SELECT agg.*, wsum.weighted_sum FROM agg JOIN wsum USING (n_items)
ORDER BY n_items
"""


def nested_struct_map(li: DataFrame) -> DataFrame:
    """Per-order map<returnflag, qty> (struct→map_from_entries) →
    map_keys/map_values/element_at → flat stats.

    Keys are pre-aggregated (groupBy order+flag) so they are unique by
    construction — map_from_entries rejects duplicates in both engines.
    """
    kv = li.groupBy("l_orderkey", F.col("l_returnflag").alias("k")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("v")
    )
    per = kv.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("k"), F.col("v"))))
        ).alias("m")
    )
    stats = per.select(
        F.size("m").cast("bigint").alias("n_keys"),
        F.expr("aggregate(map_values(m), 0L, (acc, x) -> acc + x)").alias("vsum"),
        F.array_max(F.map_keys("m")).alias("max_k"),
        # try_element_at: null (not ANSI error) when 'A' is absent
        F.coalesce(F.try_element_at("m", F.lit("A")), F.lit(0)).cast("bigint").alias("qty_a"),
    )
    return (
        stats.groupBy("n_keys")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("vsum").alias("total_qty"),
            F.max("max_k").alias("max_flag"),
            F.sum("qty_a").alias("total_qty_a"),
        )
        .orderBy("n_keys")
    )


def nested_struct_map_oracle(table: str = "lineitem") -> str:
    return f"""
WITH kv AS (
  SELECT l_orderkey, l_returnflag AS k, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
  FROM {table} GROUP BY 1, 2
), per AS (
  SELECT l_orderkey,
         map_from_entries(list_sort(list(struct_pack(k := k, v := v)))) AS m
  FROM kv GROUP BY l_orderkey
), stats AS (
  SELECT CAST(cardinality(m) AS BIGINT) AS n_keys,
         CAST(list_sum(map_values(m)) AS BIGINT) AS vsum,
         list_max(map_keys(m)) AS max_k,
         CAST(COALESCE(m['A'][1], 0) AS BIGINT) AS qty_a
  FROM per
)
SELECT n_keys, COUNT(*) AS n_orders, CAST(SUM(vsum) AS BIGINT) AS total_qty,
       MAX(max_k) AS max_flag, CAST(SUM(qty_a) AS BIGINT) AS total_qty_a
FROM stats GROUP BY n_keys ORDER BY n_keys
"""
