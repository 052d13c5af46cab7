"""DSIR-shaped data selection via importance resampling.

Public method: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (NeurIPS) — score every raw document by the
likelihood ratio of its HASHED n-gram features under a target
distribution vs the raw distribution, then keep the highest-importance
examples. The hashed feature space keeps the model O(buckets) no matter
the vocabulary, which is what makes it a one-broadcast-join operator at
100 TB.

This implementation is the deterministic variant: per-token ratios in
floored integer micro-units (transcendental-free — log() is not
identically rounded across libm builds, so a hash-exact dual-dialect
gate can't use it; the micro-unit ratio mean preserves the ranking the
paper's log-ratio produces for the same features), and arg-top-K
selection instead of Gumbel sampling (operators/sampling.weighted_sample
provides the stochastic path when sampling — not ranking — is wanted).

Scale plan (one corpus scan):
  1. ONE staged token frame (group, doc, bucket) — explode AFTER the
     token array is a column (CLAUDE.md HOF rule); bucket = portable
     md5-hash32 mod DSIR_BUCKETS, so the whole "model" is <= DSIR_BUCKETS
     rows regardless of corpus size.
  2. target and raw counts in ONE aggregation over that frame
     (count(*) + conditional sum — never two scans).
  3. Laplace-smoothed ratio per bucket, totals via a 1-row aggregate
     broadcast (never an empty-partitionBy window); model broadcasts
     into the per-token join.
  4. per-doc mean ratio -> global top-K via TakeOrderedAndProject
     (every task keeps K rows; no global sort, no window).
The token frame feeds two consumers (model + scoring join), so it
persists through the tracked registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amadeus_spark.cache import tracked_persist
from amadeus_spark.functions.dedup import hash32_frag, toks_frag

#: hashed feature-space width and selection size — shared by both
#: dialects (iron rule 7).
DSIR_BUCKETS = 4096
DSIR_TOP_K = 50
_RATIO = "((cast(p1 as double) * qs) / (cast(q1 as double) * ps)) * 1e6"


def dsir_importance_stats(
    df: DataFrame,
    target_pred: str,
    top_k: int = DSIR_TOP_K,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` DSIR report: n_docs, n_selected (membership in
    the corpus-wide importance top-``top_k``), and the group's mean
    per-token importance ratio (micro-unit exact integers divided
    once). ``target_pred`` is a SQL predicate over the input columns
    defining the target distribution (e.g. ``"lang = 'en'"``) — it must
    be valid in BOTH dialects (plain comparisons only)."""
    ts, _ = toks_frag(text_col)
    hs, _ = hash32_frag("tok", "")
    toks = tracked_persist(
        df.select(
            group_col,
            F.col(id_col).alias("doc"),
            F.expr(target_pred).alias("is_t"),
            F.explode(F.expr(ts)).alias("tok"),
        ).select(
            group_col, "doc", "is_t", (F.expr(hs) % n_buckets).alias("b")
        )
    )
    counts = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("q"),
        F.sum(F.col("is_t").cast("bigint")).alias("p"),
    )
    totals = counts.agg(
        (F.sum("p").cast("long") + n_buckets).alias("ps"),
        (F.sum("q").cast("long") + n_buckets).alias("qs"),
    )
    model = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("p1", F.col("p") + 1)
        .withColumn("q1", F.col("q") + 1)
        .select("b", F.floor(F.expr(_RATIO)).alias("ratio_us"))
    )
    per_doc = (
        toks.join(F.broadcast(model), "b")
        .groupBy(group_col, "doc")
        .agg(
            F.sum("ratio_us").cast("long").alias("s_us"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    selected = (
        per_doc.orderBy(
            (F.col("s_us") / F.col("n_tok")).desc(), F.asc("doc")
        )
        .limit(top_k)
        .select("doc")
        .withColumn("sel", F.lit(1))
    )
    return (
        per_doc.join(F.broadcast(selected), "doc", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("sel"), F.lit(0)).cast("long").alias("n_selected"),
            (F.sum("s_us").cast("long") / F.sum("n_tok").cast("long") / F.lit(1e6))
            .alias("avg_ratio"),
        )
        .orderBy(group_col)
    )


def dsir_importance_oracle(
    table: str,
    target_pred: str,
    top_k: int = DSIR_TOP_K,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB twin — same buckets, same Laplace smoothing, the IDENTICAL
    parenthesization of the 4-op IEEE ratio expression, same top-K
    tie-break (ratio desc, doc asc)."""
    _, td = toks_frag(text_col)
    _, hd = hash32_frag("", "tok")
    ratio_d = _RATIO
    return f"""
WITH toks AS MATERIALIZED (
  SELECT {group_col}, doc, is_t, {hd} % {n_buckets} AS b
  FROM (SELECT {group_col}, {id_col} AS doc, ({target_pred}) AS is_t,
               unnest({td}) AS tok
        FROM {table})
), counts AS (
  SELECT b, COUNT(*) AS q,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM toks GROUP BY b
), totals AS (
  SELECT CAST(SUM(p) AS BIGINT) + {n_buckets} AS ps,
         CAST(SUM(q) AS BIGINT) + {n_buckets} AS qs
  FROM counts
), model AS (
  SELECT b, CAST(FLOOR({ratio_d}) AS BIGINT) AS ratio_us
  FROM (SELECT b, p + 1 AS p1, q + 1 AS q1, ps, qs FROM counts, totals)
), per_doc AS (
  SELECT {group_col}, doc,
         CAST(SUM(ratio_us) AS BIGINT) AS s_us, COUNT(*) AS n_tok
  FROM toks t JOIN model m ON t.b = m.b
  GROUP BY {group_col}, doc
), selected AS (
  SELECT doc, 1 AS sel FROM per_doc
  ORDER BY s_us / n_tok DESC, doc LIMIT {top_k}
)
SELECT {group_col},
       COUNT(*) AS n_docs,
       CAST(COALESCE(SUM(sel), 0) AS BIGINT) AS n_selected,
       CAST(SUM(s_us) AS BIGINT) / CAST(SUM(n_tok) AS BIGINT) / 1e6 AS avg_ratio
FROM per_doc p LEFT JOIN selected s ON p.doc = s.doc
GROUP BY {group_col} ORDER BY {group_col}
"""
