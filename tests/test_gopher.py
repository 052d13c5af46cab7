"""Gopher document-shape rules (functions/gopher.py): crafted docs that
trip each rule individually, evaluated in BOTH dialects on the SAME
rows — the strict stringified compare the driver gate uses."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from amadeus_spark.functions import gopher

GOOD = " ".join(["the and of a to in word alpha beta gamma"] * 6)  # 60 words

DOCS = [
    # (doc_id, lang, text, rule expected to FAIL — None = passes all)
    (0, "en", GOOD, None),
    (1, "en", "the and short", "word_count"),  # 3 words < 50
    (2, "en", " ".join(["xy"] * 60) + " the and of in", "mean_word_len"),
    (3, "en", " ".join(["####" if i % 3 == 0 else "the word and of in" for i in range(30)]), "symbol_ratio"),
    (4, "en", "\n".join(["- the and of item in word list here ok fine"] * 10)
        + "\n" + " ".join(["filler"] * 40), "bullet_lines"),  # 10/11 > 0.9
    (5, "en", "\n".join([("the and of line in continues more" + " ...") for _ in range(10)]),
        "ellipsis_lines"),  # every line ends with ellipsis
    (6, "en", " ".join(["1234 5678"] * 30) + " the and of in", "alpha_words"),
    (7, "en", " ".join(["word alpha beta gamma delta"] * 12), "stopwords"),
    (8, "en", "   ", "word_count"),  # whitespace-only: coalesce -> fail
]


@pytest.fixture(scope="module")
def frames(spark):
    pdf = pd.DataFrame(
        [(i, lang, text) for i, lang, text, _ in DOCS],
        columns=["doc_id", "lang", "text"],
    )
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("docs", pdf)
    return sdf, con


def test_rules_trip_as_designed(spark, frames):
    sdf, _ = frames
    exprs = gopher.gopher_exprs("text")
    rows = {
        r["doc_id"]: r
        for r in sdf.select(
            "doc_id", *[c.alias(k) for k, c in exprs.items()]
        ).collect()
    }
    for doc_id, _, _, fail_rule in DOCS:
        r = rows[doc_id]
        if fail_rule is not None:
            assert not r[fail_rule], (doc_id, fail_rule, r.asDict())


def test_good_doc_passes_everything(spark, frames):
    sdf, _ = frames
    exprs = gopher.gopher_exprs("text")
    r = (
        sdf.filter("doc_id = 0")
        .select(*[c.alias(k) for k, c in exprs.items()])
        .collect()[0]
    )
    assert all(r[k] for k in gopher.RULES), r.asDict()


def test_dialect_parity_strict(spark, frames):
    """The full report hash-compares across engines on the crafted rows
    (same mechanics as the driver gate)."""
    sdf, con = frames
    srep = gopher.gopher_report(sdf)
    srows = sorted(
        tuple(str(v) for _, v in sorted(r.asDict().items()))
        for r in srep.collect()
    )
    osql = gopher.gopher_report_oracle("docs")
    od = con.sql(osql).fetchdf()
    orows = sorted(
        tuple(str(v) for _, v in sorted(r.items()))
        for r in od.to_dict("records")
    )
    assert srows == orows


def test_report_is_map_only_single_shuffle(spark, frames):
    sdf, _ = frames
    plan = (
        gopher.gopher_report(sdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 2  # partial agg + the orderBy sort
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
