"""Similarity-search quality tests: ANN variants measured by recall
against the exact brute-force top-k (the acceptance-band discipline for
non-oracle operators)."""

from __future__ import annotations

import os

from amadeus_spark.functions import similarity
from tests.conftest import SF_ORACLE

QUERIES = [0, 1, 2, 3, 4, 5, 6, 7]


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.n_id)
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    exact = _topk_sets(similarity.cosine_topk(emb, QUERIES, k=5).collect())
    ivf = _topk_sets(
        similarity.ivf_topk(emb, QUERIES, k=5, n_cells=16, n_probe=4).collect()
    )
    recalls = [
        len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact
    ]
    mean_recall = sum(recalls) / len(recalls)
    # embeddings are near-random (max cos ~0.5) — the hardest case for
    # ANN; probing 4/16 cells must still recover a solid fraction
    assert mean_recall >= 0.4, recalls


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    a = similarity.ivf_topk(emb, [0, 1], k=3).collect()
    b = similarity.ivf_topk(emb, [0, 1], k=3).collect()
    assert [(r.q_id, r.n_id) for r in a] == [(r.q_id, r.n_id) for r in b]


def test_lsh_ann_subset_of_bruteforce_scores(spark):
    """Every LSH-ANN neighbor's cosine must equal the brute-force cosine
    for the same pair (the bucketing prunes candidates, never rescores)."""
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    bf = {
        (r.q_id, r.n_id): r.cosine
        for r in similarity.cosine_topk(emb, QUERIES, k=50).collect()
    }
    ann = similarity.ann_lsh_topk(emb, QUERIES, k=5).collect()
    for r in ann:
        if (r.q_id, r.n_id) in bf:
            assert abs(bf[(r.q_id, r.n_id)] - r.cosine) == 0.0


def test_ivf_pq_recall_and_determinism(spark):
    """IVF-PQ at defaults (n_probe=4, 3-way soft assignment, 8-bit
    codebooks): recall
    ≥ 0.8 against exact cosine on the near-random fixture (the hardest
    distribution for ANN), deterministically."""
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    exact = _topk_sets(similarity.cosine_topk(emb, QUERIES, k=5).collect())
    pq = _topk_sets(similarity.ivf_pq_topk(emb, QUERIES, k=5).collect())
    recalls = [len(exact[q] & pq.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    a = similarity.ivf_pq_topk(emb, [0, 1], k=3).collect()
    b = similarity.ivf_pq_topk(emb, [0, 1], k=3).collect()
    assert [(r.q_id, r.n_id) for r in a] == [(r.q_id, r.n_id) for r in b]


def test_ivf_pq_recall_monotone_in_nprobe(spark):
    """Widening the probe must never lose recall: sweep n_probe 1→2→4
    and require monotone non-decreasing mean recall (the multi-probe
    contract), with the same index (n_assign fixed)."""
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    exact = _topk_sets(similarity.cosine_topk(emb, QUERIES, k=5).collect())

    def mean_recall(n_probe):
        got = _topk_sets(
            similarity.ivf_pq_topk(emb, QUERIES, k=5, n_probe=n_probe).collect()
        )
        rs = [len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact]
        return sum(rs) / len(rs)

    sweep = [mean_recall(p) for p in (1, 2, 4)]
    assert sweep[0] <= sweep[1] <= sweep[2], sweep
    assert sweep[2] >= 0.8, sweep


def test_semantic_dedup_matches_bruteforce(spark):
    """SemDeDup semantics pinned against numpy: same seeded centroids,
    then brute-force within-cell cosine pairs and the drop-if-lower-id-
    neighbor rule must reproduce every per-label count exactly."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    got = {
        r["label"]: (r["n_vecs"], r["n_pairs"], r["n_dropped"])
        for r in similarity.semantic_dedup_stats(emb, threshold=0.4).collect()
    }

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = {int(r["vec_id"]): r["label"] for r in rows}
    X = np.array([r["embedding"] for r in rows], dtype=float)
    base = similarity.with_norm(emb.select("vec_id", "embedding"))
    cent = similarity._fit_cells(base, "embedding", 16, 42, 4096, 8)
    cell = similarity._nearest_cells(X, cent, 1)[:, 0]
    nrm = np.linalg.norm(X, axis=1)
    want: dict = {}
    for lb in set(labels.values()):
        n_vecs = sum(1 for v in labels.values() if v == lb)
        want[lb] = [n_vecs, 0, set()]
    order = np.argsort(ids)
    for i_pos in range(len(ids)):
        for j_pos in range(len(ids)):
            i, j = order[i_pos], order[j_pos]
            if ids[i] >= ids[j] or cell[i] != cell[j]:
                continue
            cos = float(X[i] @ X[j]) / (nrm[i] * nrm[j])
            if cos >= 0.4:
                lb = labels[int(ids[j])]
                want[lb][1] += 1
                want[lb][2].add(int(ids[j]))
    exp = {
        lb: (n, p, len(d)) for lb, (n, p, d) in want.items() if p or lb in got
    }
    for lb, triple in got.items():
        assert triple == exp[lb], (lb, triple, exp[lb])


def test_ivf_pq_scores_are_exact_cosines(spark):
    """The refine step re-ranks with EXACT cosine: every returned score
    must equal the brute-force cosine for that pair."""
    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    exact = {
        (r.q_id, r.n_id): r.cosine
        for r in similarity.cosine_topk(emb, QUERIES, k=50).collect()
    }
    for r in similarity.ivf_pq_topk(emb, QUERIES, k=5).collect():
        if (r.q_id, r.n_id) in exact:
            assert abs(r.cosine - exact[(r.q_id, r.n_id)]) < 1e-12


def test_semantic_decontamination_precision_and_recall(spark):
    """Exact verify means ZERO false positives vs numpy brute force;
    banded-LSH candidates must recall >= 0.8 of the true contaminated
    set at the gate threshold (the documented miss bound)."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(SF_ORACLE, "embeddings.parquet"))
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=float)
    nrm = np.linalg.norm(X, axis=1)
    probe = ids % 97 == 0
    sims = (X[~probe] @ X[probe].T) / np.outer(nrm[~probe], nrm[probe])
    truth = set(ids[~probe][(sims >= 0.4).any(axis=1)])

    got_rows = similarity.semantic_decontamination_stats(emb, 0.4).collect()
    n_flagged = sum(r["n_contaminated"] for r in got_rows)
    assert n_flagged <= len(truth)  # exact verify: no false positives
    assert len(truth) == 0 or n_flagged >= 0.8 * len(truth), (n_flagged, len(truth))
    assert sum(r["n_corpus"] for r in got_rows) == int((~probe).sum())
