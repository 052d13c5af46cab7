"""group_by_sink (operators/group_sink.py) — ground-truth and plan-shape
tests for the composable per-group sink compiler (the reference's
group_by(nested sink), par_sink/group_by.rs:23-392)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from amadeus_spark import plans
from amadeus_spark.operators import group_sink as gs


def _truth(rows, k_sample, n_top, salt):
    """Pure-Python ground truth for every sink over (key, id, val)."""
    by_key: dict[str, list[tuple[int, float]]] = {}
    for key, i, v in rows:
        by_key.setdefault(key, []).append((i, v))
    out = {}
    for key, items in by_key.items():
        ids = [i for i, _ in items]
        vals = [v for _, v in items]
        sample = [
            i
            for _, i in sorted(
                (hashlib.md5((salt + str(i)).encode()).hexdigest(), i)
                for i in ids
            )[:k_sample]
        ]
        top = [i for _, i in sorted(((-v, i) for i, v in items))[:n_top]]
        money = round(sum(int(round(v * 1e6)) for v in vals) / 1e6, 6)
        out[key] = (
            len(items),
            money,
            min(vals),
            max(vals),
            sample,
            top,
        )
    return out


def test_group_by_sink_matches_ground_truth(spark):
    """Skewed random data (one hot key with 60% of rows — exactly the
    profile the two-level tree exists for) must reproduce a pure-Python
    evaluation of every sink exactly."""
    rng = random.Random(23)
    rows = []
    for i in range(600):
        key = "hot" if rng.random() < 0.6 else f"k{rng.randrange(12)}"
        rows.append((key, i, round(rng.uniform(-100, 100), 2)))
    df = spark.createDataFrame(rows, "key string, id long, val double").repartition(9)
    got = gs.group_by_sink(
        df,
        ["key"],
        {
            "n": gs.count(),
            "money": gs.money_sum("val"),
            "lo": gs.min_("val"),
            "hi": gs.max_("val"),
            "sample": gs.sample_k("id", 5, salt="gt"),
            "top": gs.top_n("val", "id", 4),
        },
    ).collect()
    want = _truth(rows, 5, 4, "gt")
    assert len(got) == len(want)
    for r in got:
        n, money, lo, hi, sample, top = want[r.key]
        assert r.n == n, r.key
        assert abs(r.money - money) < 1e-9, r.key
        assert r.lo == lo and r.hi == hi, r.key
        assert list(r.sample) == sample, r.key
        assert list(r.top) == top, r.key


def test_group_by_sink_two_exchange_plan(spark):
    """Plan shape: exactly two exchanges (level-1 keys+pid, level-2
    keys), no window, no Python, bounded sinks sliced at BOTH levels —
    the whole point is that no stage's state scales with group size."""
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.col("id"),
        (F.col("id") * 1.5).alias("val"),
    )
    out = gs.group_by_sink(
        df, ["key"], {"n": gs.count(), "s": gs.sample_k("id", 3)}
    )
    txt = plans.plan_text(out)
    assert plans.shuffle_count(out) == 2, txt
    assert not plans.single_partition_windows(out)
    plans.assert_no_python_udf(out)
    # the slice bound appears in both the partial and the merge stage
    assert txt.count("slice(sort_array(") >= 2, txt
