"""Iterative graph analytics — PageRank in EXACT integer micro-units.

Beyond the reference's operator set (its closest surface is the
fold/combine sink family, par_sink/fold.rs — this is the iterative
driver those primitives exist to support); the link-graph rank is the
standard crawl-pipeline signal for page quality weighting (the original
Page et al. 1999 computation), and the companion operator to the
near-dup connected-components pass (functions/dedup.py) in the
"iterative joins over an edge table" family.

Exactness discipline: every iteration is PURE BIGINT arithmetic —
ranks live in micro-units, per-edge contributions are integer-divided
by out-degree, and the damping mix is ``(15·base + 85·S) div 100``.
Integer ops are associative/order-independent, so the result is
bit-identical across engines and partitionings, and the DuckDB oracle
(the same five iterations unrolled as chained CTEs) hash-matches
strictly — no double drift, ever. The truncation error vs real-valued
PageRank is < 1 micro-unit per edge per iteration, irrelevant for
ranking use.

Physical plan at 100 TB: the edge table (with precomputed out-degree)
PERSISTS once and feeds every iteration; each iteration is one shuffle
(contributions keyed by dst) plus a LEFT join back onto the node set
(nodes with no in-links keep the teleport term). Rank frames persist
per iteration (each feeds the next join AND unpersists its
predecessor); every ``checkpoint_every`` iterations a localCheckpoint
truncates the lineage (the connected-components discipline —
dedup.py's large-star/small-star loop). Convergence at micro-unit
granularity is typically < 20 iterations; the operator runs a FIXED
iteration count so results are deterministic, streaming-free state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping split in percent (Page et al.'s d = 0.85)
DAMPING_PCT = 85
#: rank scale: micro-units of probability mass
RANK_SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Exact-integer PageRank over ``edges`` (one row per directed
    link, duplicates allowed — they are counted) for every row of
    ``nodes``. Returns (node, pr_us) with pr_us the BIGINT micro-unit
    rank after ``iterations`` rounds. Dangling nodes (no out-links)
    contribute nothing (their mass exits; the standard simplification —
    callers wanting mass conservation add self-loops)."""
    from amadeus_spark.cache import tracked_persist

    n_frame = nodes.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # base teleport share: floor(1e6 / N), broadcast as a 1-row frame
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ed = tracked_persist(
        edges.join(deg, src).select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            F.col("__deg"),
        )
    )
    # STATIC node frame (r15 restructure): the per-iteration left join
    # keys the teleport term off this fixed frame instead of the
    # previous iteration's ranks — each rank frame then feeds exactly
    # ONE consumer (the contribution join), so no per-iteration
    # persist/checkpoint is needed for subtree sharing at all. The
    # pre-r15 shape joined ranks into BOTH sides and persisted lazily
    # while unpersisting the predecessor during plan BUILD — before
    # anything materialized — so the final plan re-executed every
    # iteration's subtree per consumer (measured 32 jobs ≈ 2^5 for 5
    # iterations; eager per-iteration checkpoints fixed the sharing
    # but paid ~6 stage-jobs of driver latency per round).
    nodes0 = tracked_persist(
        nodes.crossJoin(F.broadcast(n_frame)).select(
            F.col(node).alias("__node"), F.col("__n")
        )
    )
    ranks = nodes0.select(
        "__node",
        F.expr(f"CAST({RANK_SCALE} AS BIGINT) div __n").alias("__pr"),
    )
    for it in range(iterations):
        contribs = (
            ed.join(
                ranks.select(
                    F.col("__node").alias("__src"), F.col("__pr")
                ),
                "__src",
            )
            .select(
                F.col("__dst").alias("__node"),
                F.expr("__pr div __deg").alias("__c"),
            )
            .groupBy("__node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes0.join(contribs, "__node", "left")
            .select(
                "__node",
                F.expr(
                    f"(({100 - DAMPING_PCT}) * ({RANK_SCALE} div __n)"
                    f" + {DAMPING_PCT} * coalesce(__s, 0)) div 100"
                )
                .cast("long")
                .alias("__pr"),
            )
        )
        # lineage truncation only (single-consumer chain): bound the
        # analyzed plan depth on LONG runs. Spark 4.1's
        # localCheckpoint(eager=False) measured NON-lazy (it executed
        # the whole upstream chain, 27 jobs at iteration 4), so the
        # truncation is explicitly eager and the default cadence is 8
        # — a short run (the typical <=20-iteration convergence) pays
        # at most 2 truncations, and a 5-iteration run none at all
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("__node").alias(node), F.col("__pr").alias("pr_us")
    )


def pagerank_oracle(
    edges_sql: str,
    nodes_sql: str,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> str:
    """DuckDB twin — the SAME integer recurrence with the iterations
    unrolled as chained CTEs (standard SQL forbids aggregation in a
    recursive CTE term; unrolling is the equivalent plan). Returns
    (node, pr_us)."""
    steps = [
        f"""n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ({nodes_sql})),
deg AS (SELECT {src} AS s, COUNT(*) AS d FROM ({edges_sql}) GROUP BY {src}),
ed AS (SELECT e.{src} AS s, e.{dst} AS t, deg.d
       FROM ({edges_sql}) e JOIN deg ON e.{src} = deg.s),
pr0 AS (SELECT {node} AS v, CAST({RANK_SCALE} // n AS BIGINT) AS pr
        FROM ({nodes_sql}), n_)"""
    ]
    for i in range(iterations):
        steps.append(
            f"""c{i} AS (SELECT ed.t AS v, SUM(pr{i}.pr // ed.d) AS s
       FROM ed JOIN pr{i} ON ed.s = pr{i}.v GROUP BY ed.t),
pr{i + 1} AS (SELECT pr{i}.v,
       CAST((({100 - DAMPING_PCT}) * ({RANK_SCALE} // n)
             + {DAMPING_PCT} * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS pr
       FROM pr{i} LEFT JOIN c{i} ON pr{i}.v = c{i}.v, n_)"""
        )
    chain = ",\n".join(steps)
    return (
        f"WITH {chain}\n"
        f"SELECT v AS {node}, pr AS pr_us FROM pr{iterations}"
    )
