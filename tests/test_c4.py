"""C4 page-cleaning semantics on crafted pages — every rule branch
pinned individually (the gopher/test classification discipline)."""

from __future__ import annotations

import pytest

from amadeus_spark.functions import c4

GOOD = "alpha beta gamma delta."  # terminal + >=3 words
PAGES = [
    # doc_id, lang, page, expect_keep, expected_kept_lines
    (0, "en", f"{GOOD}\n{GOOD}\n{GOOD}", True, 3),
    (1, "en", f"{GOOD}\n{GOOD}", False, 2),  # < 3 kept lines
    (2, "en", f"{GOOD}\nno terminal here\n{GOOD}\n{GOOD}", True, 3),
    (3, "en", f"{GOOD}\ntoo short.\n{GOOD}\n{GOOD}", True, 3),
    (4, "en", f"{GOOD}\nenable JavaScript to view.\n{GOOD}\n{GOOD}", True, 3),
    (5, "en", f"{GOOD}\n{GOOD}\n{GOOD}\nlorem ipsum filler text.", False, 4),
    (6, "en", f"{GOOD}\n{GOOD}\nvar x = {{}} ok fine.\n{GOOD}", False, 4),
    (7, "en", "one two six!\nthree four six?\nfive six seven\"", True, 3),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame(
        [(i, lang, page) for i, lang, page, _, _ in PAGES],
        "doc_id long, lang string, text string",
    )
    rows = {r["doc_id"]: r for r in c4.c4_clean(df).collect()}
    assert len(rows) == len(PAGES)
    return rows


def test_keep_decisions(cleaned):
    for doc_id, _, _, expect_keep, _ in PAGES:
        assert cleaned[doc_id]["keep_doc"] is expect_keep, doc_id


def test_kept_line_counts(cleaned):
    for doc_id, _, _, _, n_kept in PAGES:
        assert cleaned[doc_id]["n_kept_lines"] == n_kept, doc_id


def test_rewrite_drops_only_bad_lines(cleaned):
    # doc 2: the terminal-less line vanishes, order preserved
    assert cleaned[2]["cleaned"] == f"{GOOD}\n{GOOD}\n{GOOD}"
    # doc 4: the javascript line vanishes even though well-formed
    assert "JavaScript" not in cleaned[4]["cleaned"]
    # doc 7: '!', '?' and '"' all count as terminal punctuation
    assert cleaned[7]["cleaned"].count("\n") == 2


def test_synth_page_branches(spark):
    """The gate query's synthesized pages exercise every rule: some
    docs dropped by lorem/brace, some lines dropped by each line rule."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "en", " ".join(f"w{j}" for j in range(23))) for i in range(60)],
        "doc_id long, lang string, text string",
    )
    staged = docs.select(
        "doc_id",
        "lang",
        F.expr("filter(split(text, ' '), w -> w != '')").alias("__w"),
    )
    pages = staged.select(
        "doc_id",
        "lang",
        F.expr(c4.synth_page_frag("__w", "doc_id", "spark")).alias("text"),
    )
    out = c4.c4_clean(pages).collect()
    kept = [r for r in out if r["keep_doc"]]
    assert 0 < len(kept) < len(out)
    assert any(r["doc_id"] % 17 == 0 and not r["keep_doc"] for r in out)
    assert any(r["doc_id"] % 23 == 0 and not r["keep_doc"] for r in out)
    assert all(r["n_kept_lines"] < r["n_lines"] for r in out)
