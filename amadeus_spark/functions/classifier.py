"""Distributed trained text classifier — hashed-feature logistic
regression (the fastText-linear / FineWeb-classifier shape: a LINEAR
model over hashed bag-of-words features, trained data-parallel). The
model-BASED quality filtering family, complementing the rule-based
gates (gopher.py, c4.py) and the importance-ratio selector (dsir.py):
rules and ratios are fixed functions; this LEARNS weights from labeled
examples.

Architecture (all public, standard):
- features: tokens hashed into ``dim`` buckets (hashing trick,
  Weinberger et al. 2009), value = count, plus a bias term;
- model: binary logistic regression;
- training: full-batch gradient descent — each step is ONE data-parallel
  pass (mapInPandas partial gradients over Arrow batches, summed by
  Spark's TreeAggregate-shape ``summary`` reduction), driver applies
  the update to the broadcast weight vector. T steps = T passes; the
  weight vector (dim+1 doubles) is the only driver state — the classic
  parameter-server-free data-parallel GD topology, which is how MLlib's
  own LogisticRegression runs its aggregator.

100 TB posture: each pass shuffles NOTHING (partial gradients are
dim+1 doubles per partition, reduced tree-wise by Spark's agg); the
corpus is scanned T times, so callers cache the featurized frame when
memory allows, or accept scan cost (T is small). Scoring is one
map-only pass with the weights broadcast.

Determinism: float gradient sums depend on partition merge order, so
trained weights are reproducible-in-distribution, not bit-stable —
the registered query is rows-only BY DESIGN (the compensated_moments /
sketch discipline); tests pin LEARNING (accuracy beats the majority
baseline out-of-sample), not bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature-hash dimensionality (buckets) — 2^12 keeps the weight
#: vector broadcast-trivial while collisions stay rare at test vocab
DIM = 4096


def _hash_tokens(texts: pd.Series, dim: int) -> list[dict[int, float]]:
    # crc32: stable across processes (unlike hash()) and C-speed —
    # the hashing trick needs uniformity, not cryptographic strength
    from zlib import crc32

    out = []
    for t in texts:
        counts: dict[int, float] = {}
        for tok in str(t).split():
            if not tok:
                continue
            h = crc32(tok.encode()) % dim
            counts[h] = counts.get(h, 0.0) + 1.0
        out.append(counts)
    return out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def train_hashed_lr(
    df: DataFrame,
    text_col: str,
    label_col: str,
    dim: int = DIM,
    steps: int = 12,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> np.ndarray:
    """Train binary logistic regression over hashed BoW features.
    ``label_col`` must be 0/1. Returns the weight vector (dim weights +
    bias at index dim). Each step is one data-parallel pass; the
    gradient is normalized by n so ``lr`` is scale-free."""
    from amadeus_spark.cache import tracked_persist

    data = df.select(
        F.col(text_col).alias("__t"), F.col(label_col).cast("double").alias("__y")
    )

    # FEATURIZE ONCE, train over the cached sparse rows (r15
    # optimization; the module docstring always prescribed caching the
    # featurized frame): tokenize+hash is the expensive per-row Python
    # work, and the T gradient passes each re-ran it — T scans of raw
    # text became one featurize pass + T passes over (idx, val, y)
    # arrays. The count() both sizes the scale-free lr AND fills the
    # cache in the same job.
    def feat(batches):
        for pdf in batches:
            fd = _hash_tokens(pdf["__t"], dim)
            yield pd.DataFrame(
                {
                    "idx": [
                        np.fromiter(d.keys(), np.int64, len(d)) for d in fd
                    ],
                    "val": [
                        np.fromiter(d.values(), np.float64, len(d))
                        for d in fd
                    ],
                    "__y": pdf["__y"].to_numpy(),
                }
            )

    feats = tracked_persist(
        data.mapInPandas(
            feat, schema="idx array<long>, val array<double>, __y double"
        )
    )
    n_total = feats.count()
    w = np.zeros(dim + 1)

    for _ in range(steps):
        bw = w  # captured by value in the closure below

        def grad_pass(batches):
            # vectorized over whole Arrow batches: per-row z via a
            # scatter-add over the flattened (row, idx, val) triples,
            # per-feature gradient the same way — no per-row Python
            g = np.zeros(dim + 1)
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                rows_idx = pdf["idx"].to_numpy()
                lens = np.fromiter(
                    (len(a) for a in rows_idx), np.int64, n
                )
                idx = (
                    np.concatenate(rows_idx)
                    if lens.sum()
                    else np.empty(0, np.int64)
                ).astype(np.int64)
                val = (
                    np.concatenate(pdf["val"].to_numpy())
                    if lens.sum()
                    else np.empty(0, np.float64)
                ).astype(np.float64)
                row_of = np.repeat(np.arange(n), lens)
                z = np.full(n, bw[dim])
                np.add.at(z, row_of, bw[idx] * val)
                err = _sigmoid(z) - pdf["__y"].to_numpy()
                np.add.at(g, idx, err[row_of] * val)
                g[dim] += err.sum()
            yield pd.DataFrame({"g": [g.tobytes()]})

        parts = feats.mapInPandas(grad_pass, schema="g binary").collect()
        g = np.zeros(dim + 1)
        for r in parts:
            g += np.frombuffer(r["g"], dtype=np.float64)
        g /= max(n_total, 1)
        g[:dim] += l2 * w[:dim]
        w = w - lr * g
    # nothing returned references the featurized frame (only the numpy
    # weights leave) — release it now; a live registered cache adds
    # CacheManager plan-matching cost to every later analysis
    feats.unpersist()
    return w


def score_hashed_lr(
    df: DataFrame, text_col: str, weights: np.ndarray, dim: int = DIM
) -> DataFrame:
    """Map-only scoring pass: adds ``prob`` (double) using the broadcast
    weight vector. One Arrow-batched projection, no shuffle."""
    w_list = [float(x) for x in weights]

    def score(batches):
        w = np.asarray(w_list)
        for pdf in batches:
            feats = _hash_tokens(pdf[text_col], dim)
            n = len(pdf)
            lens = np.fromiter((len(d) for d in feats), np.int64, n)
            total = int(lens.sum())
            idx = np.empty(total, np.int64)
            val = np.empty(total, np.float64)
            pos = 0
            for d in feats:
                k = len(d)
                idx[pos : pos + k] = np.fromiter(d.keys(), np.int64, k)
                val[pos : pos + k] = np.fromiter(d.values(), np.float64, k)
                pos += k
            z = np.full(n, w[dim])
            np.add.at(z, np.repeat(np.arange(n), lens), w[idx] * val)
            out = pdf.copy()
            out["prob"] = _sigmoid(z)
            yield out

    fields = df.schema.simpleString()[7:-1]  # struct<...> -> ...
    return df.mapInPandas(score, schema=f"{fields},prob:double")
