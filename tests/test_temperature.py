"""Temperature-mixture semantics: the UniMax/mT5 up-weighting law,
quota exactness, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.operators import sampling


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_alpha_half_upweights_low_resource(spark):
    df = _corpus(spark, {"en": 900, "sw": 100})
    k = 200
    flat = sampling.temperature_mixture(df, "lang", "doc_id", k, 1.0)
    temp = sampling.temperature_mixture(df, "lang", "doc_id", k, 0.5)
    n_flat = {
        r["lang"]: r["n"]
        for r in flat.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_temp = {
        r["lang"]: r["n"]
        for r in temp.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # alpha=1 is proportional allocation; alpha=0.5 moves quota from the
    # high-resource to the low-resource stratum (sqrt flattening)
    assert n_flat["sw"] == 20 and n_flat["en"] == 180
    assert n_temp["sw"] > n_flat["sw"]
    assert n_temp["en"] < n_flat["en"]
    # sqrt weights: 30/(30+10) vs 10/40 -> en 150, sw 50
    assert n_temp == {"en": 150, "sw": 50}


def test_quota_total_within_strata_count(spark):
    df = _corpus(spark, {"a": 37, "b": 211, "c": 89, "d": 5})
    k = 100
    out = sampling.temperature_mixture(df, "lang", "doc_id", k, 0.5)
    n = out.count()
    assert abs(n - k) < 4  # round-half-up drift bounded by n_strata


def test_partitioning_invariance(spark):
    df = _corpus(spark, {"en": 300, "de": 60})
    base = sorted(
        r["doc_id"]
        for r in sampling.temperature_mixture(
            df, "lang", "doc_id", 90, 0.5
        ).collect()
    )
    shuf = sorted(
        r["doc_id"]
        for r in sampling.temperature_mixture(
            df.repartition(13), "lang", "doc_id", 90, 0.5
        ).collect()
    )
    assert base == shuf and len(base) > 0
