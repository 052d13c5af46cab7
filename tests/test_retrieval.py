"""BM25-shape retrieval (functions/retrieval.py): score formula checked
against an independent Python computation on crafted docs, idf
ordering (rare beats common at equal tf), and the top-k tie-break."""

from __future__ import annotations

import pytest

from amadeus_spark.functions import retrieval
from amadeus_spark.functions.retrieval import B, K1


def _py_score(tf, dl, avgdl, n, df):
    idf = (n - df + 0.5) / (df + 0.5)
    return idf * tf * (1.0 + K1) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark join other other other"),  # both terms
        (1, "spark other other other other other"),  # common term only
        (2, "join other other other other other"),  # rare term only
        (3, "spark other other other other other"),
        (4, "spark other other other other other"),
        (5, "other other other other other other"),  # no terms
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_match_independent_formula(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in retrieval.bm25_topk(
            spark, corpus, terms=("spark", "join"), k=10
        ).collect()
    }
    n, avgdl = 6.0, 6.0
    df_spark, df_join = 4.0, 2.0
    exp0 = _py_score(2, 6, avgdl, n, df_spark) + _py_score(
        1, 6, avgdl, n, df_join
    )
    assert out[0]["score"] == pytest.approx(exp0, rel=1e-12)
    assert out[0]["n_hits"] == 2
    assert out[1]["score"] == pytest.approx(
        _py_score(1, 6, avgdl, n, df_spark), rel=1e-12
    )
    assert out[2]["score"] == pytest.approx(
        _py_score(1, 6, avgdl, n, df_join), rel=1e-12
    )
    assert 5 not in out  # no query terms -> not retrieved


def test_rare_term_outscores_common_at_equal_tf(spark, corpus):
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(
            spark, corpus, terms=("spark", "join"), k=10
        ).collect()
    }
    # doc 2 (one rare 'join') must outscore doc 1 (one common 'spark')
    assert out[2] > out[1]


def test_topk_tiebreak_deterministic(spark, corpus):
    # docs 1, 3, 4 are identical -> equal scores; order must be doc_id
    rows = retrieval.bm25_topk(
        spark, corpus, terms=("spark", "join"), k=10
    ).collect()
    tied = [r["doc_id"] for r in rows if r["doc_id"] in (1, 3, 4)]
    assert tied == [1, 3, 4]


def test_hard_negatives_semantics(spark):
    """Each query doc gets exactly k negatives, never itself, every
    negative genuinely shares terms, and scores are non-increasing."""
    import os

    from amadeus_spark.functions import retrieval
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    qids = [0, 7, 21]
    rows = retrieval.hard_negatives(docs, qids, k=5).collect()
    texts = {r["doc_id"]: set(r["text"].split()) for r in docs.collect()}
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(qids)
    for q, rs in by_q.items():
        assert len(rs) == 5
        scores = [r["score_us"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r["neg_id"] != q
            shared = texts[q] & texts[r["neg_id"]]
            assert len(shared) >= 1 and r["n_shared"] >= 1


# ----- build_postings -------------------------------------------------------


def test_build_postings_semantics(spark):
    from amadeus_spark.functions.retrieval import build_postings

    df = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, "a b b"),
            (3, "a"),
            (4, "b c"),
        ],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in build_postings(df, top_n=2).collect()}
    assert rows["a"]["df"] == 3 and rows["a"]["cf"] == 5
    # head: tf desc, doc asc, capped at top_n=2
    assert rows["a"]["head"] == "1:3,2:1"
    assert rows["b"]["head"] == "2:2,1:1"
    assert rows["c"]["df"] == 1 and rows["c"]["head"] == "4:1"


def test_build_postings_truncates_before_shuffle(spark):
    """The literal rank bound must keep WindowGroupLimit active so
    posting heads truncate map-side (the mixture_sample discipline)."""
    from amadeus_spark.functions.retrieval import build_postings

    df = spark.createDataFrame(
        [(i, "x y") for i in range(50)], "doc_id long, text string"
    )
    plan = build_postings(df)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
