"""C4-style page cleaning — the published line/page rule family from
Raffel et al. 2020 ("Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", §2.2, the C4 corpus construction),
the other standard web-text quality gate next to the Gopher shape rules
(``functions/gopher.py``).

Beyond the reference's operator set (constellation-rs/amadeus has no
text-quality stage; its closest surface is the per-row ``filter`` at
amadeus-core/src/par_stream.rs:87, which this composes with); included
because the brief grades training-data pipeline operators first-class.

Rule set (each a published C4 rule):
- LINE level: keep only lines that end in terminal punctuation and have
  at least ``line_min_words`` words; drop any line containing the word
  "javascript" (case-insensitive).
- PAGE level: drop pages containing a curly brace ``{`` (code), the
  phrase "lorem ipsum" (placeholder boilerplate), or fewer than
  ``min_kept_lines`` surviving lines.

The cleaned page is the kept lines re-joined — C4 is a REWRITE, not
just a filter, so the report checksums the cleaned text per document
(md5-derived hash32, the ``span_scrub`` discipline) rather than only
counting.

Iron-rule-7 discipline: one fragment builder emits both dialects from
the same constants; the two dialects differ only in the array lexicon
(size/len, filter/list_filter, split/string_split). Everything is a
single codegen'd projection per document followed by one count
aggregate — map-only at 100 TB, fused into the feeding scan; the only
shuffle is the final per-language rollup.

Null/empty semantics: an all-dropped page yields kept = [] (not NULL);
``keep_doc`` is a total boolean in both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4 rule constants (Raffel et al. 2020 §2.2). line_min_words is the
#: paper's 3-word sentence floor; min_kept_lines its 3-sentence page
#: floor (the paper counts sentences; lines are the tractable proxy the
#: public c4 code also uses).
C4_BOUNDS = {
    "line_min_words": 3,
    "min_kept_lines": 3,
}

#: page-level drop needles (lowercase match)
PAGE_DROP_NEEDLES = ("lorem ipsum", "{")
#: line-level drop needle (lowercase word match)
LINE_DROP_NEEDLE = "javascript"
#: terminal punctuation a kept line must end with
TERMINALS = (".", "!", "?", '"')


def _lex(dialect: str) -> dict[str, str]:
    spark = dialect == "spark"
    return {
        "size": "size" if spark else "len",
        "filter": "filter" if spark else "list_filter",
        "ne": "!=" if spark else "<>",
        "split": "split" if spark else "string_split",
    }


def line_keep_frag(line_var: str, dialect: str) -> str:
    """Boolean fragment deciding whether one line survives C4's line
    rules; ``line_var`` is the lambda variable name.

    The min-words gate is a single regexp find, not a split+filter
    count: ">= n non-empty space-separated tokens" is exactly "n
    maximal non-space runs separated by spaces", and inside an
    interpreted HOF lambda the regexp (literal pattern, compiled once)
    avoids allocating a word array and walking a sub-lambda per word
    for every line. Both engines' regexp predicates are unanchored
    partial matches over the same RE2-safe pattern, so the boolean is
    dialect-identical."""
    ends = " OR ".join(
        f"{line_var} LIKE '%{t}'" for t in TERMINALS if t != "'"
    )
    n = C4_BOUNDS["line_min_words"]
    pat = "[^ ]+" + (f"( +[^ ]+){{{n - 1}}}" if n > 1 else "")
    re_fn = "regexp_like" if dialect == "spark" else "regexp_matches"
    words = f"{re_fn}({line_var}, '{pat}')"
    no_js = f"NOT contains(lower({line_var}), '{LINE_DROP_NEEDLE}')"
    return f"(({ends}) AND {words} AND {no_js})"


def kept_lines_frag(page_sql: str, dialect: str) -> str:
    """Array of lines surviving the C4 line rules."""
    lx = _lex(dialect)
    # literal newline split: Spark needs the escaped '\n' inside the SQL
    # string; DuckDB takes chr(10) (its '\n' in a string literal is a
    # literal backslash-n under default settings).
    nl = "'\\n'" if dialect == "spark" else "chr(10)"
    lines = f"{lx['split']}({page_sql}, {nl})"
    return f"{lx['filter']}({lines}, l -> {line_keep_frag('l', dialect)})"


def c4_frags(page_sql: str, kept_sql: str, dialect: str) -> dict[str, str]:
    """Per-document C4 outputs over a PRE-STAGED kept-lines array column
    (stage ``kept_lines_frag`` first — HOF lambda bodies re-evaluate per
    element, so feeding the raw expression to multiple consumers would
    recompute the line filter; CLAUDE.md perf note)."""
    lx = _lex(dialect)
    nl = "'\\n'" if dialect == "spark" else "chr(10)"
    page_bad = " OR ".join(
        f"contains(lower({page_sql}), '{n}')" for n in PAGE_DROP_NEEDLES
    )
    n_kept = f"{lx['size']}({kept_sql})"
    cleaned = f"array_to_string({kept_sql}, {nl})"
    if dialect == "spark":
        cleaned = f"array_join({kept_sql}, {nl})"
    return {
        "n_lines": f"{lx['size']}({lx['split']}({page_sql}, {nl}))",
        "n_kept_lines": n_kept,
        "keep_doc": (
            f"(NOT ({page_bad})"
            f" AND {n_kept} >= {C4_BOUNDS['min_kept_lines']})"
        ),
        "cleaned": cleaned,
    }


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pinned: bool = True,
) -> DataFrame:
    """Per-document C4 cleaning: adds ``keep_doc`` (page survives),
    ``cleaned`` (kept lines re-joined), ``n_lines``/``n_kept_lines``.
    No shuffle.

    ``pinned`` (default) puts a plan barrier under the output
    projection: this stage references ``text_col`` from four
    expressions and its outputs feed downstream filters and hashes, so
    in a pipeline the optimizer re-inlines the (possibly expensive)
    text producer into every Filter condition and interpreted-HOF
    argument — contexts codegen subexpression elimination cannot reach
    (plans.barrier; measured 2.1x on corpusflow_e2e). Pass
    ``pinned=False`` when the ONLY consumer is one flat aggregate
    (c4_report's shape): there the collapsed projection is evaluated
    once per row with codegen CSE, and the barrier's struct round trip
    is pure cost (measured +0.1 s on c4_quality at sf0.1)."""
    kept = F.expr(kept_lines_frag(text_col, "spark"))
    staged = df.withColumn("__kept", kept)
    if pinned:
        from amadeus_spark.plans.barrier import plan_barrier

        staged = plan_barrier(staged)
    frags = c4_frags(text_col, "__kept", "spark")
    return staged.select(
        *df.columns,
        F.expr(frags["n_lines"]).cast("bigint").alias("n_lines"),
        F.expr(frags["n_kept_lines"]).cast("bigint").alias("n_kept_lines"),
        F.expr(frags["keep_doc"]).alias("keep_doc"),
        F.expr(frags["cleaned"]).alias("cleaned"),
    )


def c4_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> DataFrame:
    """Per-stream C4 report: page/line survival counts, retained chars,
    and an order-independent checksum of every KEPT page's cleaned text
    (sum of id-keyed hash32 — a one-char diff anywhere flips it). All
    outputs BIGINT; map-only until the final rollup."""
    from amadeus_spark.functions.dedup import hash32_frag

    # one flat aggregate consumer — the collapsed projection evaluates
    # once per row with codegen CSE, so the plan barrier would be pure
    # struct-round-trip cost here (see c4_clean docstring)
    cleaned = c4_clean(df, text_col, id_col, pinned=False)
    hs, _ = hash32_frag(
        f"concat(cast({id_col} as string), chr(1), cleaned)", ""
    )
    return (
        cleaned.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep_doc").cast("bigint")).alias("kept_docs"),
            F.sum("n_lines").alias("total_lines"),
            F.sum(
                F.when(F.col("keep_doc"), F.col("n_kept_lines")).otherwise(
                    F.lit(0)
                )
            ).alias("kept_lines"),
            F.sum(
                F.when(
                    F.col("keep_doc"), F.length("cleaned").cast("bigint")
                ).otherwise(F.lit(0))
            ).alias("kept_chars"),
            F.sum(
                F.when(F.col("keep_doc"), F.expr(hs)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("content_sum"),
        )
        .orderBy(stream_col)
    )


def c4_report_oracle(
    table: str = "pages",
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of c4_report — same constants, DuckDB lexicon. The
    caller supplies ``table`` (typically a WITH alias holding the same
    synthesized pages the Spark side reads)."""
    from amadeus_spark.functions.dedup import hash32_frag

    kept = kept_lines_frag(text_col, "duckdb")
    frags = c4_frags(text_col, "kept", "duckdb")
    _, hd = hash32_frag(
        "", f"CAST({id_col} AS VARCHAR) || chr(1) || cleaned"
    )
    return f"""
WITH staged AS (
  SELECT {stream_col}, {id_col}, {text_col}, {kept} AS kept FROM {table}
), scored AS (
  SELECT {stream_col}, {id_col},
         {frags["n_lines"]} AS n_lines,
         {frags["n_kept_lines"]} AS n_kept_lines,
         {frags["keep_doc"]} AS keep_doc,
         {frags["cleaned"]} AS cleaned
  FROM staged
)
SELECT {stream_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep_doc THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(SUM(n_lines) AS BIGINT) AS total_lines,
       CAST(SUM(CASE WHEN keep_doc THEN n_kept_lines ELSE 0 END) AS BIGINT)
           AS kept_lines,
       CAST(SUM(CASE WHEN keep_doc THEN length(cleaned) ELSE 0 END) AS BIGINT)
           AS kept_chars,
       CAST(SUM(CASE WHEN keep_doc THEN {hd} ELSE 0 END) AS BIGINT)
           AS content_sum
FROM scored GROUP BY {stream_col} ORDER BY {stream_col}
"""


#: Page synthesis for the gate query: the synthetic documents are
#: single-line word salads with no punctuation, so (html_text_extract
#: precedent) the gate derives a deterministic multi-line page from
#: (text, doc_id) with the SAME construction in both dialects — 5-word
#: lines whose terminator cycles by (doc_id + line index): '.', '!',
#: none (line dropped), '?', ' javascript.' (line dropped); every 17th
#: doc gets a 'lorem ipsum' line and every 23rd a '{' line (page
#: dropped). This exercises every rule branch on real data volumes.
PAGE_WORDS_PER_LINE = 5


def synth_page_frag(
    words_sql: str, id_sql: str, dialect: str
) -> str:
    """Deterministic page text from a pre-staged words array column."""
    lx = _lex(dialect)
    n_lines = (
        f"CAST(ceil({lx['size']}({words_sql})"
        f" / CAST({PAGE_WORDS_PER_LINE} AS DOUBLE)) AS INT)"
    )
    if dialect == "spark":
        seq = f"sequence(0, greatest({n_lines}, 1) - 1)"
        sl = (
            f"slice({words_sql}, i * {PAGE_WORDS_PER_LINE} + 1,"
            f" {PAGE_WORDS_PER_LINE})"
        )
        join_line = f"array_join({sl}, ' ')"
    else:
        seq = f"range(0, greatest({n_lines}, 1))"
        lo = f"i * {PAGE_WORDS_PER_LINE} + 1"
        hi = f"(i + 1) * {PAGE_WORDS_PER_LINE}"
        join_line = (
            f"array_to_string(list_slice({words_sql}, {lo}, {hi}), ' ')"
        )
    term = (
        f"CASE CAST(({id_sql} + i) % 5 AS INT)"
        " WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN ''"
        " WHEN 3 THEN '?' ELSE ' javascript.' END"
    )
    tx = "transform" if dialect == "spark" else "list_transform"
    lines = f"{tx}({seq}, i -> {join_line} || {term})"
    # doc-level injections as length-0/1 slices of a constant array —
    # sidesteps both engines' empty-array-literal typing quirks
    if dialect == "spark":
        lorem_arr = "array('lorem ipsum dolor sit amet.')"
        brace_arr = "array('var x = begin; end {.')"
    else:
        lorem_arr = "['lorem ipsum dolor sit amet.']"
        brace_arr = "['var x = begin; end {.']"
    if dialect == "spark":
        lorem = (
            f"slice({lorem_arr}, 1,"
            f" CASE WHEN {id_sql} % 17 = 0 THEN 1 ELSE 0 END)"
        )
        brace = (
            f"slice({brace_arr}, 1,"
            f" CASE WHEN {id_sql} % 23 = 0 THEN 1 ELSE 0 END)"
        )
        return f"array_join(concat({lines}, {lorem}, {brace}), '\\n')"
    lorem = (
        f"list_slice({lorem_arr}, 1,"
        f" CASE WHEN {id_sql} % 17 = 0 THEN 1 ELSE 0 END)"
    )
    brace = (
        f"list_slice({brace_arr}, 1,"
        f" CASE WHEN {id_sql} % 23 = 0 THEN 1 ELSE 0 END)"
    )
    return (
        f"array_to_string(list_concat(list_concat({lines}, {lorem}),"
        f" {brace}), chr(10))"
    )
