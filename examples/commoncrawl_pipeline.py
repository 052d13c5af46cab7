"""Common Crawl ingestion end-to-end, Spark-first — the reference's
commoncrawl example (amadeus-commoncrawl: crawl id → WARC → Webpage)
extended with the full training-data scrub this engine adds on top:

  WARC files ──► response pages ──► URL canonicalization (frontier dedup)
       │                                │
       └► streamed record-at-a-time    └► HTML → text (dual-dialect regex)
                                              │
                                              ├► language id + quality stats
                                              └► exact + MinHash near-dup

Run against the committed fixture (no network) or any WARC directory:

    python examples/commoncrawl_pipeline.py [warc_dir]

For a real crawl on a cluster: warc.read_commoncrawl(spark,
"CC-MAIN-2024-10", limit=...) expands the public manifest to ~80k
.warc.gz paths — one task per file, records streamed, bodies never on
the driver.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amadeus_spark import get_spark
from amadeus_spark.functions import dedup, html, text, urls
from amadeus_spark.sources import warc


def main(path: str) -> None:
    spark = get_spark("commoncrawl_pipeline")

    pages = warc.read_warc(spark, path).filter(
        F.col("warc_type") == "response"
    )

    # frontier dedup: canonical URL collapses casing/port/tracking noise
    canon = pages.withColumn(
        "canon_url", urls.canonicalize_url(F.col("url"))
    )
    dup_urls = (
        canon.groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    print("duplicate canonical URLs:", dup_urls.count())

    # HTML → text, then language id + token stats per page
    docs = canon.select(
        F.md5("canon_url").alias("doc_id"),
        # latin-1 is total on bytes (crawl bodies are rarely clean UTF-8;
        # strict utf-8 decode aborts the job under ANSI mode)
        html.html_to_text(F.decode(F.col("contents"), "ISO-8859-1")).alias(
            "text"
        ),
    )
    scored = docs.select(
        "doc_id",
        text.lang_id("text").alias("lang"),
        text.token_count(F.col("text")).alias("n_tok"),
    )
    scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("pages"),
        F.sum("n_tok").alias("tokens"),
    ).orderBy(F.desc("pages")).show(10, truncate=False)

    # near-dup scrub on the extracted text
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    print("near-duplicate page pairs:", pairs.count())


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "warc",
    )
    main(sys.argv[1] if len(sys.argv) > 1 else default)
