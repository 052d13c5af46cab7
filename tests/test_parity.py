"""Execution-mode parity — the reference's discipline of running every
test on a thread pool AND a process pool with identical assertions
(tests/*_dist.rs twins, SURVEY §5 #4). Spark's analog: the same operator
must produce identical results regardless of input partitioning — that's
what makes local[32] results transfer to a 1000-executor cluster."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amadeus_spark.functions import dedup, similarity, text
from amadeus_spark.operators import sketches
from tests.conftest import SF_ORACLE


def _rows(df):
    return sorted(
        tuple(str(v) for _, v in sorted(r.asDict().items())) for r in df.collect()
    )


def _docs(spark, nparts):
    return spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet")).repartition(
        nparts
    )


@pytest.mark.parametrize("nparts", [1, 7])
def test_minhash_partitioning_invariance(spark, nparts):
    base = _rows(dedup.minhash_lsh_pairs(_docs(spark, 32), "doc_id", "text"))
    other = _rows(dedup.minhash_lsh_pairs(_docs(spark, nparts), "doc_id", "text"))
    assert base == other


@pytest.mark.parametrize("nparts", [1, 7])
def test_sketch_ops_partitioning_invariance(spark, nparts):
    li32 = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet")).repartition(32)
    lin = spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet")).repartition(nparts)
    assert _rows(sketches.most_distinct(li32, "l_suppkey", "l_partkey", 10)) == _rows(
        sketches.most_distinct(lin, "l_suppkey", "l_partkey", 10)
    )
    assert _rows(sketches.most_frequent(li32, "l_partkey", 10)) == _rows(
        sketches.most_frequent(lin, "l_partkey", 10)
    )


def test_grouped_money_sum_partitioning_invariance(spark):
    """The decimal-cast discipline makes grouped money sums bit-identical
    under any partitioning (double sums would drift in the last ulps)."""
    paths = os.path.join(SF_ORACLE, "lineitem.parquet")
    out = []
    for nparts in (1, 5, 32):
        li = spark.read.parquet(paths).repartition(nparts)
        out.append(
            _rows(
                li.groupBy("l_returnflag").agg(
                    F.sum(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                            "decimal(18,6)"
                        )
                    )
                    .cast("double")
                    .alias("rev")
                )
            )
        )
    assert out[0] == out[1] == out[2]


def test_simhash_and_text_partitioning_invariance(spark):
    a = _rows(dedup.simhash_pairs(_docs(spark, 1), "doc_id", "text"))
    b = _rows(dedup.simhash_pairs(_docs(spark, 13), "doc_id", "text"))
    assert a == b
    qa = _rows(
        _docs(spark, 1).select(text.lang_id("text").alias("l")).groupBy("l").count()
    )
    qb = _rows(
        _docs(spark, 13).select(text.lang_id("text").alias("l")).groupBy("l").count()
    )
    assert qa == qb


def test_cosine_topk_partitioning_invariance(spark):
    emb = os.path.join(SF_ORACLE, "embeddings.parquet")
    a = _rows(similarity.cosine_topk(spark.read.parquet(emb).repartition(1), [0, 1], 5))
    b = _rows(similarity.cosine_topk(spark.read.parquet(emb).repartition(9), [0, 1], 5))
    assert a == b


def test_range_join_partitioning_invariance(spark):
    from amadeus_spark.operators import joins

    def run(nparts):
        li = (
            spark.read.parquet(os.path.join(SF_ORACLE, "lineitem.parquet"))
            .repartition(nparts)
            .select(
                F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01")).alias("pt"),
                "l_orderkey",
            )
        )
        od = spark.read.parquet(os.path.join(SF_ORACLE, "orders.parquet")).filter(
            F.col("o_orderkey") % 997 == 0
        )
        d = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        iv = od.select(F.col("o_orderkey").alias("iid"), d.alias("lo"), (d + 30).alias("hi"))
        j = joins.range_join(li, iv, "pt", "lo", "hi", bin_width=16)
        return _rows(j.groupBy("iid").count())

    assert run(1) == run(11) == run(32)


def test_stratified_and_rolling_fp_partitioning_invariance(spark):
    from amadeus_spark.operators import sampling

    a = _rows(sampling.stratified_sample(_docs(spark, 1).select("doc_id", "lang"), "lang", "doc_id", 5))
    b = _rows(sampling.stratified_sample(_docs(spark, 13).select("doc_id", "lang"), "lang", "doc_id", 5))
    assert a == b

    def fp(nparts):
        d = _docs(spark, nparts).withColumn(
            "__toks", F.expr("filter(split(text, ' '), x -> x != '')")
        )
        return _rows(
            d.select(text.rolling_fingerprint("__toks").alias("fp"))
            .groupBy("fp")
            .count()
        )

    assert fp(1) == fp(9)


@pytest.mark.parametrize("nparts", [1, 7])
def test_embedding_neardup_partitioning_invariance(spark, nparts):
    """The banded-LSH near-dup pairs (r3 rewrite) must be invariant to
    input partitioning: band bucket ids are pure per-row functions and
    the candidate join + exact verify carry no order dependence."""
    emb32 = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet")).repartition(32)
    embn = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet")).repartition(nparts)
    kw = dict(threshold=0.3, id_mod=10, max_bucket_size=500)
    assert _rows(similarity.embedding_neardup_pairs(emb32, **kw)) == _rows(
        similarity.embedding_neardup_pairs(embn, **kw)
    )


@pytest.mark.parametrize("nparts", [1, 7])
def test_line_dedup_partitioning_invariance(spark, nparts):
    import __spark_entry__ as entrymod

    fx = spark.read.parquet(entrymod._LINE_FIXTURE)
    base = _rows(dedup.line_dedup_stats(fx.repartition(32)))
    other = _rows(dedup.line_dedup_stats(fx.repartition(nparts)))
    assert base == other


@pytest.mark.parametrize("nparts", [1, 7])
def test_duplicated_spans_partitioning_invariance(spark, nparts):
    """The interval-union window orders by start position within each
    doc (total order), and the dup table is a commutative distinct-count
    — the stats must be identical under any input partitioning."""
    base = _rows(dedup.duplicated_span_stats(_docs(spark, 32)))
    other = _rows(dedup.duplicated_span_stats(_docs(spark, nparts)))
    assert base == other


@pytest.mark.parametrize("nparts", [1, 7])
def test_bigram_surprisal_partitioning_invariance(spark, nparts):
    base = _rows(text.bigram_surprisal_stats(_docs(spark, 32)))
    other = _rows(text.bigram_surprisal_stats(_docs(spark, nparts)))
    assert base == other


@pytest.mark.parametrize("nparts", [1, 7])
def test_group_by_sink_partitioning_invariance(spark, nparts):
    """group_by_sink's level-1 grouping includes spark_partition_id, so
    partition-layout independence is the property that must hold: the
    k-smallest-by-hash sample and top-n are global extrema (merge of
    per-partition extrema is exact), counts/sums are commutative, and
    the HLL union is order-free."""
    from amadeus_spark.operators import group_sink as gs

    def run(df):
        out = gs.group_by_sink(
            df,
            ["lang"],
            {
                "n": gs.count(),
                "chars": gs.max_("n_chars"),
                "sample": gs.sample_k("doc_id", 4, salt="pt"),
                "top": gs.top_n("n_chars", "doc_id", 3),
                "approx": gs.approx_distinct("doc_id"),
            },
        )
        return _rows(
            out.select(
                "lang", "n", "chars", "approx",
                F.expr("array_join(transform(sample, x -> cast(x as string)), ',')").alias("s"),
                F.expr("array_join(transform(top, x -> cast(x as string)), ',')").alias("t"),
            )
        )

    assert run(_docs(spark, 32)) == run(_docs(spark, nparts))


@pytest.mark.parametrize("nparts", [1, 7])
def test_mixture_sample_partitioning_invariance(spark, nparts):
    """Mixture resampling is a fixed permutation prefix per stratum —
    identical rows selected under any input partitioning, and the
    output composition hits the quotas exactly."""
    from amadeus_spark.operators import sampling

    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    base = sampling.mixture_sample(_docs(spark, 32), "lang", "doc_id", 50, weights)
    other = sampling.mixture_sample(_docs(spark, nparts), "lang", "doc_id", 50, weights)
    assert _rows(base.select("lang", "doc_id")) == _rows(other.select("lang", "doc_id"))
    comp = {r.lang: r.n for r in base.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert comp == {"en": 25, "de": 15, "fr": 10}


@pytest.mark.parametrize("nparts", [1, 7])
def test_epoch_shuffle_invariance_and_epoch_sensitivity(spark, nparts):
    """(shard, pos) assignments are a pure function of (epoch, key):
    identical under any input partitioning, different across epochs."""
    from amadeus_spark.operators import sampling

    def run(df, epoch):
        return _rows(
            sampling.epoch_shuffle(df, "doc_id", 8, epoch).select(
                "doc_id", "shard", "pos"
            )
        )

    e1 = run(_docs(spark, 32), 1)
    assert e1 == run(_docs(spark, nparts), 1)
    assert e1 != run(_docs(spark, 32), 2)  # new epoch, new permutation


@pytest.mark.parametrize("nparts", [1, 7])
def test_token_budget_partitioning_invariance(spark, nparts):
    """The two-level sharded cumsum must equal the one-level cumsum at
    ANY input partitioning — the decomposition is physical only."""
    from amadeus_spark.operators import sampling

    def run(np):
        ts, _ = dedup.toks_frag("text")
        d = _docs(spark, np).select(
            "lang", "doc_id", F.size(F.expr(ts)).cast("long").alias("n_tok")
        )
        return _rows(
            sampling.token_budget_sample(
                d, "lang", "doc_id", "n_tok", {"en": 3000, "de": 1000}
            ).select("lang", "doc_id", "n_tok")
        )

    assert run(32) == run(nparts)


@pytest.mark.parametrize("nparts", [1, 7])
def test_cluster_safe_split_partitioning_invariance(spark, nparts):
    def run(np):
        docs = _docs(spark, np)
        pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=8, limit=200)
        return _rows(dedup.cluster_safe_split_stats(docs, pairs))

    assert run(32) == run(nparts)


@pytest.mark.parametrize("nparts", [1, 7])
def test_span_scrub_partitioning_invariance(spark, nparts):
    """Coverage window is per-doc totally ordered (pos, starts-first)
    and the dup table is commutative — the rewrite md5s must be
    identical under any partitioning."""
    base = _rows(dedup.span_dedup_rewrite(_docs(spark, 32)))
    other = _rows(dedup.span_dedup_rewrite(_docs(spark, nparts)))
    assert base == other


def test_late_r7_ops_partitioning_invariance(spark):
    """decon span scrub, semantic decontamination, and hard negatives
    are all deterministic pipelines (portable hashes, integer sums,
    total tie-breaks) — identical output at any input partitioning."""
    from amadeus_spark.functions import retrieval, similarity

    docs32, docs5 = _docs(spark, 32), _docs(spark, 5)
    assert _rows(dedup.span_decontaminate(docs32)) == _rows(
        dedup.span_decontaminate(docs5)
    )
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    assert _rows(
        similarity.semantic_decontamination_stats(emb.repartition(32), 0.4)
    ) == _rows(similarity.semantic_decontamination_stats(emb.repartition(5), 0.4))
    qids = [0, 7, 21]
    assert _rows(retrieval.hard_negatives(docs32, qids, 5)) == _rows(
        retrieval.hard_negatives(docs5, qids, 5)
    )


def test_bpe_learn_partitioning_invariance(spark):
    from amadeus_spark.functions import bpe

    a = bpe.learn_bpe_merges(_docs(spark, 32), 16, 8)
    b = bpe.learn_bpe_merges(_docs(spark, 3), 16, 8)
    assert a == b


@pytest.mark.parametrize("nparts", [1, 7])
def test_cluster_keep_best_partitioning_invariance(spark, nparts):
    """The padded-key argmax is a commutative MIN and the rollup is a
    plain aggregate — identical output under any partitioning."""

    def run(np):
        docs = _docs(spark, np)
        pairs = dedup.simhash_pairs(
            docs, "doc_id", "text", max_hamming=8, limit=200
        )
        return _rows(dedup.cluster_keep_best_stats(docs, pairs))

    assert run(32) == run(nparts)
