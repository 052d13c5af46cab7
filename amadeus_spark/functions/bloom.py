"""Broadcast Bloom-filter membership — the map-side scale path for
set-membership filters (benchmark decontamination, blocklist scrubs,
reference-corpus lookups).

Where it sits vs the exact path (dedup.decontamination_stats): the
exact path broadcasts the probe set as a join hash relation — right
whenever the distinct probe set fits comfortably as a broadcast join
side. When the probe set is itself large (hundreds of millions of
benchmark n-grams), a Bloom bitmap is ~10-30× smaller than the hash
relation (100M entries at 1% false-positive ≈ 120 MB) and membership
becomes a pure map-side test — no join operator at all, so the 100 TB
corpus side never shuffles and never builds probe-side hash tables per
task. The cost is a quantified false-positive rate and NO false
negatives (a Bloom filter can only over-flag; flagged docs can be
re-checked exactly against the tiny subset they select).

Design (Spark-first):

- **Hashing is JVM-side**: two ``xxhash64`` columns computed in the
  codegen'd projection; bit positions derive from them by
  Kirsch-Mitzenmacher double hashing ``g_i = h1 + i*h2 (mod m)``
  (public result: Kirsch & Mitzenmacher 2006, "Less Hashing, Same
  Performance"), so the Python stages do integer math only, never
  string hashing.
- **Build is a mergeable aggregate with a TREE merge**: per-partition
  bitmaps OR together, and OR is commutative/associative/idempotent —
  the built bitmap is BIT-IDENTICAL under any partitioning or row
  order (tested). Partials are one row per input partition, OR-reduced
  EXECUTOR-SIDE ``fan_in``-to-1 (same two-level topology as
  sketch_lib.count_min_top_k) before the driver ever collects: the
  driver sees ≤ ceil(partitions / fan_in) rows, so a 120 MB bitmap
  over a probe set read as 3000 partitions moves ~6 GB through the
  reduce level and ~6 GB/fan_in ≈ 5 rows to the driver — not 360 GB.
- **Membership is one Arrow-batched pandas UDF** over the precomputed
  hash columns — vectorized numpy bit tests against the broadcast
  bitmap, the sanctioned Python path (bytes never hit the driver).

The reference has no sketch-membership operator; this follows the same
mergeable-sketch posture as operators/sketches.py (HLL/CMS).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: second xxhash64 stream seed (any fixed odd constant; public value
#: chosen arbitrarily, embedded in both build and probe paths)
H2_SEED = 0x9E3779B9


def optimal_params(capacity: int, fp_rate: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits, k = m/n ln 2.
    m is rounded up to a multiple of 64 (whole uint64 words)."""
    if capacity <= 0 or not (0.0 < fp_rate < 1.0):
        raise ValueError("capacity > 0 and 0 < fp_rate < 1 required")
    m = math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


@dataclass(frozen=True)
class BloomSpec:
    """A built filter: the bitmap plus the parameters that address it."""

    bitmap: bytes
    m_bits: int
    k: int

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(np.frombuffer(self.bitmap, np.uint8)).sum())


def _hash_cols(col: Column) -> tuple[Column, Column]:
    return F.xxhash64(col), F.xxhash64(col, F.lit(H2_SEED))


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions, uint64 wraparound arithmetic (deterministic)."""
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (
        h1.astype(np.uint64)[:, None] + i * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m)


def _reduced_partials(
    df: DataFrame, col: str, m: int, k: int, fan_in: int = 64
) -> DataFrame:
    """Per-input-partition bitmaps, OR-reduced executor-side so the
    frame holds ≤ ceil(n_partitions / fan_in) rows (one level of the
    sketch_lib fan-in tree — OR is associative, so one level suffices
    to bound the driver collect; the final OR over the reduced rows is
    ≤ fan_in × m/8 bytes of driver work by construction)."""
    n_words = m // 64
    h1c, h2c = _hash_cols(F.col(col))

    def _partial(batches):
        bitmap = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            pos = _positions(
                pdf["h1"].to_numpy(np.int64),
                pdf["h2"].to_numpy(np.int64),
                k,
                m,
            ).ravel()
            np.bitwise_or.at(
                bitmap, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
            )
        if seen:
            yield pd.DataFrame({"w": [bitmap.tobytes()]})

    states = df.select(h1c.alias("h1"), h2c.alias("h2")).mapInPandas(
        _partial, schema="w binary"
    )
    n_parts = df.rdd.getNumPartitions()
    if n_parts > 1:
        # spark_partition_id of the states frame is the source partition
        # (mapInPandas is 1:1), so the grouping is deterministic and
        # evenly spread — same reasoning as sketch_lib.count_min_top_k.
        # Applied whenever >1 partial exists (not just past fan_in): the
        # exchange moves ≤ n_parts bitmap rows and the driver then sees
        # ceil(n_parts / fan_in) — for n_parts ≤ fan_in that's ONE row.
        n_groups = math.ceil(n_parts / fan_in)

        def _or_group(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(n_words, dtype=np.uint64)
            for w in pdf["w"]:
                acc |= np.frombuffer(w, dtype=np.uint64)
            return pd.DataFrame({"w": [acc.tobytes()]})

        states = (
            states.withColumn("g", F.spark_partition_id() % n_groups)
            .groupBy("g")
            .applyInPandas(_or_group, schema="w binary")
        )
    return states


def build_bloom(
    df: DataFrame, col: str, capacity: int, fp_rate: float = 0.01,
    fan_in: int = 64,
) -> BloomSpec:
    """Build a Bloom filter over a column's values. This RUNS A JOB
    (like the IVF k-means fit): the probe-set scan is its own bounded
    action whose result (the bitmap) then broadcasts into the main
    query — keep it off the 100 TB side. The partial bitmaps OR-merge
    executor-side ``fan_in``-to-1 first, so the driver collects at most
    ceil(n_partitions / fan_in) rows however the input is partitioned."""
    m, k = optimal_params(capacity, fp_rate)
    partials = _reduced_partials(df, col, m, k, fan_in).collect()
    bitmap = np.zeros(m // 64, dtype=np.uint64)
    for row in partials:
        bitmap |= np.frombuffer(row["w"], dtype=np.uint64)
    return BloomSpec(bitmap.tobytes(), m, k)


def with_bloom_member(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    spec: BloomSpec,
    out_col: str = "bloom_member",
) -> DataFrame:
    """Append a boolean membership column. Hashes are computed in the
    codegen'd projection; the pandas UDF does vectorized bit tests
    against the executor-broadcast bitmap. Guarantee: never false for
    an inserted value (no false negatives); true for a non-member with
    probability ~fp_rate."""
    bc = spark.sparkContext.broadcast(spec.bitmap)
    k, m = spec.k, spec.m_bits

    @F.pandas_udf("boolean")
    def _member(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint64)
        pos = _positions(h1.to_numpy(np.int64), h2.to_numpy(np.int64), k, m)
        words = bitmap[pos >> np.uint64(6)]
        bits = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    h1c, h2c = _hash_cols(F.col(col))
    return df.withColumn(out_col, _member(h1c, h2c))


def decontamination_bloom_stats(
    spark: SparkSession,
    df: DataFrame,
    probe_mod: int = 97,
    fp_rate: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "lang",
) -> DataFrame:
    """Bloom-path benchmark decontamination, SELF-CHECKING against the
    exact broadcast-semi-join path (dedup.decontamination_stats — same
    probe construction, same shingles): per stream it reports corpus
    docs, exactly-contaminated docs, bloom-flagged docs, and
    ``n_missed`` = docs the exact path flags that bloom does NOT —
    0 UNCONDITIONALLY, because the bloom is built over the SAME hash32
    column ``h`` the exact join keys on (membership then supersets the
    join relation by construction — a bloom over the raw string would
    instead open a hash32-collision window where exact flags a doc the
    bloom legitimately misses). ``n_bloom - n_exact`` is the realized
    false-positive overhang.

    fp_rate is PER SHINGLE PROBE; a doc testing s shingles is
    false-flagged with probability ≤ s·fp_rate (union bound), so the
    default 1e-4 keeps doc-level false positives ~0.5% at s≈50 where
    0.01 would false-flag ~40% of clean docs. Bits cost only
    log-linearly: 1e-4 is 2× the bitmap of 1e-2.

    Build cost: two bounded jobs on the TINY probe side (distinct
    count for sizing, then the bitmap build) — the IVF-fit posture.
    The corpus side is one exploded projection with a map-side pandas
    bit test plus one broadcast left join for the exact comparison;
    remove the exact branch in production and the corpus never joins
    at all."""
    from amadeus_spark.cache import tracked_persist
    from amadeus_spark.functions.dedup import (
        SHINGLE_K,
        hash32_frag,
        shingles_from_tokens_frag,
        toks_frag,
    )

    stok, _ = toks_frag(text_col)
    hs, _ = hash32_frag("s", "s")
    staged = tracked_persist(
        df.select(
            stream_col,
            F.col(id_col).alias("doc"),
            F.expr(stok).alias("__toks"),
        ).withColumn(
            "__sh", F.expr(shingles_from_tokens_frag("__toks", SHINGLE_K))
        )
    )
    probe = (
        staged.filter(F.col("doc") % probe_mod == 0)
        .select(F.explode("__sh").alias("s"))
        .distinct()
    )
    capacity = max(64, probe.count())
    probe_hashes = probe.select(F.expr(hs).alias("h"))
    spec = build_bloom(probe_hashes, "h", capacity, fp_rate)

    probe_hashes = probe_hashes.withColumn("__hit", F.lit(True))
    corpus_sh = (
        staged.filter(F.col("doc") % probe_mod != 0)
        .select(stream_col, "doc", F.explode("__sh").alias("s"))
        .withColumn("h", F.expr(hs))
    )
    flagged = with_bloom_member(spark, corpus_sh, "h", spec, "bloom_hit")
    per_doc = (
        flagged.join(F.broadcast(probe_hashes), "h", "left")
        .groupBy(stream_col, "doc")
        .agg(
            F.max(F.coalesce("__hit", F.lit(False))).alias("exact"),
            F.max("bloom_hit").alias("bloom"),
        )
    )
    return (
        per_doc.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("exact").cast("bigint")).alias("n_exact"),
            F.sum(F.col("bloom").cast("bigint")).alias("n_bloom"),
            F.sum(
                (F.col("exact") & ~F.col("bloom")).cast("bigint")
            ).alias("n_missed"),
        )
        .orderBy(stream_col)
    )


def with_bloom_any_member(
    spark: SparkSession,
    df: DataFrame,
    h1_arr: str,
    h2_arr: str,
    spec: BloomSpec,
    out_col: str = "bloom_any",
) -> DataFrame:
    """Doc-level membership: TRUE iff ANY element of the row's hash
    arrays is a (probable) member — the whole-document contamination
    test as ONE stateless map, no explode and no per-doc aggregation
    (which on a stream would mean update-mode state). The pandas UDF
    flattens each Arrow batch's arrays, runs the same vectorized bit
    tests as with_bloom_member, and ORs per row via reduceat."""
    bc = spark.sparkContext.broadcast(spec.bitmap)
    k, m = spec.k, spec.m_bits

    @F.pandas_udf("boolean")
    def _any(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        lens = np.fromiter((len(v) for v in h1s), dtype=np.int64, count=len(h1s))
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(h1s), dtype=bool))
        f1 = np.concatenate([np.asarray(v, dtype=np.int64) for v in h1s if len(v)])
        f2 = np.concatenate([np.asarray(v, dtype=np.int64) for v in h2s if len(v)])
        bitmap = np.frombuffer(bc.value, dtype=np.uint64)
        pos = _positions(f1, f2, k, m)
        words = bitmap[pos >> np.uint64(6)]
        member = (((words >> (pos & np.uint64(63))) & np.uint64(1)).all(axis=1))
        out = np.zeros(len(h1s), dtype=bool)
        nz = lens > 0
        starts = np.zeros(int(nz.sum()), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        out[nz] = np.logical_or.reduceat(member, starts)
        return pd.Series(out)

    return df.withColumn(out_col, _any(F.col(h1_arr), F.col(h2_arr)))
