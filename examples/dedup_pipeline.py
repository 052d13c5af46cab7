"""Training-data dedup pipeline over a document corpus: exact fingerprint
dedup + MinHash-LSH near-dup detection + quality stats — the
beyond-reference LLM-pipeline surface end-to-end.

    python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from amadeus_spark import get_spark
from amadeus_spark.functions import dedup, text


def main(sf_dir: str) -> None:
    spark = get_spark("dedup_pipeline_example")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    stats = dedup.exact_dedup_stats(docs, "doc_id", text.fingerprint(F.col("text")))
    print("exact dedup:", stats.first().asDict())

    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    found = pairs.collect()
    print(f"near-duplicate pairs (jaccard ≥ 0.8): {len(found)}")
    for r in found[:5]:
        print("  ", r.doc_a, "≈", r.doc_b, f"jaccard={r.jaccard:.3f}")

    quality = docs.select(text.lang_id("text").alias("lang_pred"), "lang")
    agreement = quality.filter(F.col("lang_pred") == F.col("lang")).count()
    print(f"lang-id agreement with metadata: {agreement}/{docs.count()}")

    # span-level view: which token ranges are shared VERBATIM across
    # docs (Lee et al. substring-dedup shape) — finer than whole-doc
    # near-dup, the quantity a span-removal pass would delete
    print("duplicated spans per language (8-token shingles):")
    for r in dedup.duplicated_span_stats(docs).collect():
        frac = r.dup_tokens / max(r.total_tokens, 1)
        print(
            f"   {r.lang}: {r.n_docs_flagged}/{r.n_docs} docs,"
            f" {r.dup_tokens} dup tokens ({frac:.1%})"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
