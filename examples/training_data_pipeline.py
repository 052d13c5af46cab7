"""End-to-end training-data curation pipeline — the full LLM-pipeline
surface composed the way a data team would run it at corpus scale:

  1. quality gate      (size + token-diversity filters)
  2. exact dedup       (content fingerprint, keep first)
  3. near-dup removal  (SimHash pairs -> connected components ->
                        keep cluster minimum)
  4. decontamination   REPORT (shingle overlap vs a probe set —
                        reported, not filtered, in this example)
  5. PII scrub         (portable-regex redaction)
  6. sequence packing  (greedy context assembly)

Every stage is a declarative DataFrame transform from amadeus_spark —
one Spark job graph end-to-end, no driver-side loops over data. The
same stages run under the driver's DuckDB oracle gate individually
(`training_pipeline`, `perplexity_filter`, `decontamination`,
`pii_scrub`, `sequence_packing` in __spark_entry__.py).

    python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from amadeus_spark import get_spark, release_cached
from amadeus_spark.functions import dedup, text


def main(sf_dir: str) -> None:
    spark = get_spark("training_data_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate: minimum size + token diversity (the full
    # Gopher-family rules and the corpus-LM surprisal scorer exist as
    # per-stream REPORTING operators — repetition_stats,
    # bigram_surprisal_stats — and run under the oracle gate).
    toks = text.tokens(F.col("text"))
    staged = docs.select("doc_id", "lang", "text", toks.alias("t"))
    diversity = F.size(F.array_distinct("t")) / F.size("t")
    quality_ok = staged.filter(
        (F.size("t") >= 5) & (diversity > 0.35)
    ).select("doc_id", "lang", "text")

    # 2. exact dedup: first doc per content fingerprint wins.
    fp = text.fingerprint(F.col("text"))
    w_first = quality_ok.withColumn("fp", fp).groupBy("fp").agg(
        F.min("doc_id").alias("keep_id")
    )
    exact_unique = quality_ok.join(
        w_first, quality_ok.doc_id == w_first.keep_id, "left_semi"
    )

    # 3. near-dup clusters: SimHash pairs feed connected components;
    # each cluster keeps its minimum id.
    pairs = dedup.simhash_pairs(exact_unique, "doc_id", "text")
    clusters = dedup.connected_components(pairs, "doc_a", "doc_b")
    drop = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias("doc_id")
    )
    near_unique = exact_unique.join(drop, "doc_id", "left_anti")

    # 4. decontamination REPORT: docs sharing any 3-token shingle with
    # the probe set (doc_id % 97 == 0 stands in for the benchmark
    # corpus) are counted per language — a real pipeline would join the
    # flagged ids back as an anti-join before training.
    decon = dedup.decontamination_stats(near_unique)

    # 4b. leakage-safe split: assign train/val/test by the near-dup
    # CLUSTER representative, so near-duplicates never straddle splits
    # (the eval contamination a per-doc hash split would bake in).
    split_report = dedup.cluster_safe_split_stats(near_unique, pairs)

    # 4c. DSIR importance selection: score docs by hashed-unigram
    # likelihood ratio against the lang='en' target distribution.
    from amadeus_spark.functions import dsir

    dsir_report = dsir.dsir_importance_stats(
        near_unique, "lang = 'en'", group_col="lang"
    )

    # 5. PII scrub: redact before packing.
    clean = near_unique.select(
        "doc_id", "lang", text.redact_pii(F.col("text")).alias("text")
    )

    # 6. mixture resampling: hit a target language composition exactly
    # (round(k·w) docs per language, deterministic md5 permutation).
    from amadeus_spark.operators import sampling

    mixed = sampling.mixture_sample(
        clean, "lang", "doc_id", 200,
        {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1},
    )

    # 6b. token-budget quotas: cap each language's contribution in
    # TOKENS (two-level sharded cumsum — no whole-stratum window).
    ts2, _ = dedup.toks_frag("text")
    with_tok = clean.select(
        "lang", "doc_id", F.size(F.expr(ts2)).cast("long").alias("n_tok")
    )
    budgeted = sampling.token_budget_sample(
        with_tok, "lang", "doc_id", "n_tok",
        {"en": 4000, "zh": 1500, "es": 1500, "de": 1000, "fr": 1000},
    )

    # 7. deterministic epoch shuffle: every example gets a reproducible
    # (shard, position) per epoch — workers recompute their slice,
    # no shuffle files.
    epoch0 = sampling.epoch_shuffle(mixed, "doc_id", n_shards=8, epoch=0)

    # 8. sequence packing: greedy context assembly at 512 tokens.
    packed = text.sequence_packing(clean, capacity=512)

    # 9. export: ordered training shards — each shard directory holds
    # its epoch-ordered rows; a trainer worker partition-prunes to
    # exactly its shard.
    import tempfile

    from amadeus_spark.operators import storage

    shard_dir = tempfile.mkdtemp(prefix="shards_")
    storage.write_training_shards(mixed, shard_dir, "doc_id", n_shards=8, epoch=0)

    print(f"corpus:            {n0}")
    print(f"after quality:     {quality_ok.count()}")
    print(f"after exact dedup: {exact_unique.count()}")
    print(f"after near-dup:    {near_unique.count()}")
    print("decontamination report:")
    for r in decon.collect():
        print("  ", r.asDict())
    print("leakage-safe split:")
    for r in split_report.collect():
        print("  ", r.asDict())
    print("DSIR selection by lang:")
    for r in dsir_report.collect():
        print("  ", r.asDict())
    print("token-budget kept per lang:")
    for r in (budgeted.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("docs"),
                   F.sum("n_tok").alias("tokens")).orderBy("lang").collect()):
        print("  ", r.asDict())
    print("mixture composition:")
    for r in mixed.groupBy("lang").count().orderBy("lang").collect():
        print("  ", r.lang, r["count"])
    print("epoch-0 shard sizes:")
    for r in epoch0.groupBy("shard").count().orderBy("shard").collect():
        print("  ", r.shard, r["count"])
    print("shard export:", shard_dir)
    from amadeus_spark.operators.storage import read_training_shard
    print("  shard 0 head:",
          [r["doc_id"] for r in read_training_shard(spark, shard_dir, 0).limit(5).collect()])
    print("packed sequences:")
    for r in packed.limit(5).collect():
        print("  ", r.asDict())
    release_cached()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
