"""Streaming incremental near-dup filter: stateless signature parity
with the batch MinHash path, and batch/stream agreement of the flagged
set against minhash_lsh_pairs (the SURVEY §5 #4 twin discipline applied
to the LLM-dedup family)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amadeus_spark.functions import dedup
from amadeus_spark.streaming import corpus as sc
from amadeus_spark.streaming import events as ev
from tests.conftest import SF_SMOKE


def _docs(spark):
    # synthetic event-time: docs arrive in id order, 1 minute apart
    return (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .select(
            "doc_id",
            "text",
            F.expr(
                "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,doc_id,0)"
            ).alias("ts"),
        )
    )


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docstream"))
    docs = _docs(spark)
    n = docs.count()
    # contiguous TIME ranges (rotated-log shape): disorder across file
    # boundaries stays inside the watermark, so the stateful flag dedup
    # never sees a row older than its horizon (the event_stream_dir rule)
    for i in range(3):
        docs.filter(
            (F.col("doc_id") * 3).between(i * n, (i + 1) * n - 1)
        ).coalesce(1).write.mode("append").parquet(d)
    assert spark.read.parquet(d).count() == n
    return d


def test_stateless_minhash_equals_batch_signatures(spark):
    """with_minhash_stateless must produce bit-identical signatures and
    the same distinct shingle-hash SET as the explode+agg batch plan —
    they share every constant, so any drift is a real bug."""
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    a = {
        r["doc_id"]: (sorted(r["sh"]), r["sig"])
        for r in sc.with_minhash_stateless(docs, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: (sorted(r["sh"]), r["sig"])
        for r in dedup.with_minhash(docs, "doc_id", "text").collect()
    }
    assert a == b


def test_streaming_neardup_filter_matches_batch_lsh(spark, doc_stream_dir):
    """The streamed flag set must equal the docs that minhash_lsh_pairs
    finds a partner for (threshold 0.8, no bucket cap, self-matches
    excluded) — stream-static candidates + exact verify reproduce the
    batch operator's recall exactly."""
    corpus = _docs(spark)
    bands, shingles = sc.corpus_band_index(corpus)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    flagged_stream = sc.streaming_neardup_filter(stream, bands, shingles, 0.8)
    ev.run_to_memory_sink(flagged_stream, "ndf_sink")
    got = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM ndf_sink").collect()
    }

    pairs = dedup.minhash_lsh_pairs(
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")),
        "doc_id",
        "text",
        threshold=0.8,
    ).collect()
    want = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert got == want
    # one flag per doc (the within-watermark dedup held)
    n_rows = spark.sql("SELECT COUNT(*) c FROM ndf_sink").first()["c"]
    assert n_rows == len(got)


def test_batch_twin_jaccards_match_pairwise_operator(spark):
    """neardup_flags run as a plain batch frame reports the same exact
    Jaccard per (doc, corpus partner) as minhash_lsh_pairs."""
    docs = _docs(spark)
    bands, shingles = sc.corpus_band_index(docs)
    flags = {
        (r["doc_id"], r["corpus_id"]): round(r["jaccard"], 12)
        for r in sc.neardup_flags(docs, bands, shingles, 0.8).collect()
    }
    pairs = dedup.minhash_lsh_pairs(
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")),
        "doc_id",
        "text",
        threshold=0.8,
    ).collect()
    for r in pairs:
        j = round(r["jaccard"], 12)
        assert flags[(r["doc_a"], r["doc_b"])] == j
        assert flags[(r["doc_b"], r["doc_a"])] == j


def test_streaming_exact_dedup_filter(spark, doc_stream_dir):
    """Docs whose exact text already exists in the historical store are
    dropped; in-stream exact repeats emit once; novel docs all pass."""
    corpus = _docs(spark).filter(F.col("doc_id") % 4 == 0)  # quarter known
    fps = sc.corpus_fingerprints(corpus)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    out = sc.streaming_exact_dedup_filter(stream, fps)
    ev.run_to_memory_sink(out, "xd_sink")
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM xd_sink").collect()}

    all_docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            os.path.join(SF_SMOKE, "documents.parquet")
        ).collect()
    }
    known = {hash(t) for i, t in all_docs.items() if i % 4 == 0}
    # batch expectation: novel-text docs, one per distinct text
    seen: set = set()
    want = set()
    for i in sorted(all_docs):
        t = all_docs[i]
        if hash(t) in known or t in seen:
            continue
        seen.add(t)
        want.add(i)
    # the stream emits ONE doc per novel fingerprint; which duplicate id
    # survives depends on arrival order, so compare by TEXT sets
    got_texts = sorted(all_docs[i] for i in got)
    want_texts = sorted(all_docs[i] for i in want)
    assert got_texts == want_texts


def test_streaming_bloom_decontaminate_matches_batch(spark, doc_stream_dir):
    """Batch/stream parity for the stateless Bloom decontamination:
    the streamed flags equal the batch run's flags row-for-row, and
    every EXACT-overlap doc is flagged (no false negatives)."""
    from amadeus_spark.functions import bloom as bl
    from amadeus_spark.functions.dedup import SHINGLE_K, shingles_from_tokens_frag, toks_frag

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    stok, _ = toks_frag("text")
    probe_sh = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .withColumn("__toks", F.expr(stok))
        .select(F.explode(F.expr(shingles_from_tokens_frag("__toks", SHINGLE_K))).alias("s"))
        .distinct()
    )
    spec = bl.build_bloom(probe_sh, "s", max(64, probe_sh.count()), 0.01)

    batch = {
        r["doc_id"]: r["contaminated"]
        for r in sc.streaming_bloom_decontaminate(
            spark, _docs(spark), spec
        ).collect()
    }
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    ev.run_to_memory_sink(
        sc.streaming_bloom_decontaminate(spark, stream, spec), "bd_sink"
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in spark.sql("SELECT doc_id, contaminated FROM bd_sink").collect()
    }
    assert got == batch
    # no false negatives vs exact shingle overlap
    probes = set(r["s"] for r in probe_sh.collect())
    for r in docs.collect():
        toks = [t for t in r["text"].split(" ") if t]
        sh = {
            " ".join(toks[i : i + SHINGLE_K])
            for i in range(max(len(toks) - SHINGLE_K + 1, 1))
        }
        if sh & probes:
            assert got[r["doc_id"]], r["doc_id"]


def test_stateless_cleaning_stages_batch_equals_stream(spark, doc_stream_dir):
    """normalize_text and c4_clean are stateless projections, so they
    must run unchanged on a stream and agree with batch row-for-row
    (the batch==stream discipline for every new map-only operator)."""
    from amadeus_spark.functions.c4 import c4_clean
    from amadeus_spark.functions.normalize import normalize_text

    def stage(df):
        cleaned = c4_clean(
            df.withColumn("text", normalize_text(F.col("text")))
        )
        return cleaned.select("doc_id", "keep_doc", "cleaned")

    batch = {
        r["doc_id"]: (r["keep_doc"], r["cleaned"])
        for r in stage(spark.read.parquet(doc_stream_dir)).collect()
    }
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_stream_dir)
    )
    q = (
        stage(stream)
        .writeStream.format("memory")
        .queryName("clean_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (r["keep_doc"], r["cleaned"])
            for r in spark.sql("SELECT * FROM clean_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch and len(got) > 0
