"""One-JVM interleaved A/B probe for the round-15 follow-up changes
(embedding_neardup bands persist, domain_stats staged barriers).

Variant A re-creates the PRE-change builder shape inline (measurement
only — the shipped code is variant B); reps alternate A,B,A,B,... in a
single JVM so cross-JVM drift cancels. Protocol per rep mirrors
bench.py: clearCache + release_cached + System.gc before timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def old_embedding_neardup(df, threshold, id_mod, max_bucket_size):
    from amadeus_spark.cache import tracked_persist
    from amadeus_spark.functions.similarity import (
        band_buckets_frag, dot_frag, with_norm,
    )

    id_col, vec_col = "vec_id", "embedding"
    base = tracked_persist(with_norm(
        df.filter(F.col(id_col) % id_mod == 0).select(id_col, vec_col), vec_col
    ))
    band_s, _ = band_buckets_frag(vec_col)
    bands = base.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.expr("array(" + ", ".join(band_s) + ")")).alias(
            "band_id", "bucket"
        ),
    )
    w = Window.partitionBy("band_id", "bucket")
    bands = (
        bands.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )
    # NO persist here — the pre-change shape
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("norm").alias("na")
    )
    vb = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("norm").alias("nb")
    )
    ds, _ = dot_frag("va", "vb")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.expr(f"{ds} / (na * nb)"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


def old_domain_report(df, url_col="url", id_col="doc_id"):
    from amadeus_spark.functions.urls import (
        BLOCKED_DOMAINS, _HOST_RE, _bare_host, registered_domain,
    )

    host = _bare_host(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    )
    dom = registered_domain(host)
    blocked = dom.isin(*BLOCKED_DOMAINS)
    return (
        df.select(
            dom.alias("domain"),
            host.alias("__host"),
            F.col(id_col),
            blocked.alias("__blocked"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("__host").alias("n_hosts"),
            F.count_distinct(id_col).alias("n_docs"),
            F.max(F.col("__blocked")).alias("blocked"),
        )
        .orderBy("domain")
    )


def main() -> None:
    from amadeus_spark import get_spark, release_cached
    from amadeus_spark.functions import similarity, urls

    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "6"))
    spark = get_spark("amadeus_ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = entry._t(spark, sf_dir, "embeddings")
    docs = entry._t(spark, sf_dir, "documents")

    def emb_a():
        return old_embedding_neardup(
            emb, threshold=0.3, id_mod=10, max_bucket_size=entry.LSH_MAX_BUCKET
        )

    def emb_b():
        return similarity.embedding_neardup_pairs(
            emb, threshold=0.3, id_mod=10, max_bucket_size=entry.LSH_MAX_BUCKET
        )

    def dom_a():
        return old_domain_report(
            docs.select("doc_id", F.expr(entry._DOMAIN_URL_CASE).alias("url"))
        )

    def dom_b():
        return urls.domain_report(
            docs.select("doc_id", F.expr(entry._DOMAIN_URL_CASE).alias("url"))
        )

    def one_run(builder) -> float:
        spark.catalog.clearCache()
        release_cached()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        builder().collect()
        return time.perf_counter() - t0

    for label, a_fn, b_fn in (
        ("embedding_neardup", emb_a, emb_b),
        ("domain_stats", dom_a, dom_b),
    ):
        one_run(a_fn)  # warm both variants (codegen/JIT, page cache)
        one_run(b_fn)
        ta, tb = [], []
        for _ in range(reps):
            ta.append(one_run(a_fn))
            tb.append(one_run(b_fn))
        print(
            f"{label}: A(old) median={statistics.median(ta):.3f} {sorted(ta)}\n"
            f"{label}: B(new) median={statistics.median(tb):.3f} {sorted(tb)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
