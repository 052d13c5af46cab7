"""Hashed-LR classifier: it must LEARN (beat the majority baseline
out-of-sample on a linearly separable-ish task), score map-only, and
keep the driver state at dim+1 floats."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.functions.classifier import (
    DIM,
    score_hashed_lr,
    train_hashed_lr,
)


def _planted_corpus(spark, n=600, seed=5):
    """Two vocab pools with partial overlap: class 1 leans on pool A,
    class 0 on pool B — linearly separable in BoW but noisy."""
    import random

    rng = random.Random(seed)
    pool_a = [f"alpha{i}" for i in range(30)]
    pool_b = [f"beta{i}" for i in range(30)]
    shared = [f"common{i}" for i in range(40)]
    rows = []
    for i in range(n):
        y = i % 2
        own = pool_a if y else pool_b
        words = [
            rng.choice(own if rng.random() < 0.5 else shared)
            for _ in range(30)
        ]
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_learns_planted_signal_out_of_sample(spark):
    labeled = _planted_corpus(spark)
    train = labeled.filter(F.col("doc_id") % 3 != 0).repartition(7)
    test = labeled.filter(F.col("doc_id") % 3 == 0)
    w = train_hashed_lr(train, "text", "y", steps=15, lr=1.0)
    assert w.shape == (DIM + 1,)
    rows = score_hashed_lr(test, "text", w).select("y", "prob").collect()
    correct = sum(1 for r in rows if (r["prob"] >= 0.5) == (r["y"] == 1))
    assert correct / len(rows) >= 0.9, (correct, len(rows))


def test_score_schema_and_range(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "el rapido zorro")],
        "doc_id long, text string",
    )
    import numpy as np

    w = np.zeros(DIM + 1)
    out = score_hashed_lr(df, "text", w)
    rows = out.collect()
    assert set(out.columns) == {"doc_id", "text", "prob"}
    assert all(r["prob"] == 0.5 for r in rows)  # zero weights -> 0.5
