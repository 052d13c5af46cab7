"""Gopher document-quality rules — the published rule family from
Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1,
MassiveWeb filtering), the standard pre-dedup quality gate of
large-scale training-data pipelines.

Beyond the reference's operator set (constellation-rs/amadeus has no
text-quality stage); included because the brief grades training-data
pipeline operators as first-class. Complements
``text.repetition_stats`` (the Gopher repetition rules): this module
is the document-shape half — word-count bounds, mean word length,
symbol-to-word ratios, bullet/ellipsis line fractions, alphabetic-word
fraction, stopword presence.

Iron-rule-7 discipline: every rule is ONE fragment builder emitting
both dialects from the same constants. All fragments are pure
string/array expressions — a single codegen'd projection per document,
no shuffle until the per-stream count aggregate, no Python. At 100 TB
this is a map-only pass fused into whatever scan feeds it.

Threshold semantics: every ratio is an IEEE double quotient of exact
integers, computed by the same division in both engines, and every
threshold is CAST AS DOUBLE in both dialects (DuckDB parses bare
decimal literals as DECIMAL — CLAUDE.md iron rule), so rule booleans
are bit-deterministic across engines. Whitespace-only documents make
ratio rules NULL; each rule is coalesce(..., false) in both dialects
(iron rule 9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from amadeus_spark.functions.text import STOPWORDS, occurrences_sql

#: Published Gopher bounds (Rae et al. 2021 §A1.1). The stopword list
#: is this repo's (text.STOPWORDS) rather than the paper's 8-word list
#: so the rule discriminates on the synthetic corpus; same rule shape.
GOPHER_BOUNDS = {
    "word_count": (50, 100_000),
    "mean_word_len": (3.0, 10.0),
    "symbol_word_ratio_max": 0.1,  # '#' or '...' per word
    "bullet_line_frac_max": 0.9,  # lines starting with a bullet
    "ellipsis_line_frac_max": 0.3,  # lines ending with an ellipsis
    "alpha_word_frac_min": 0.8,  # words containing >= 1 [A-Za-z]
    "min_stopword_hits": 2,  # distinct stopwords present
}

#: Rule evaluation order — also the output column order.
RULES = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "alpha_words",
    "stopwords",
)


def _dbl(v: float | int) -> str:
    return f"CAST({v} AS DOUBLE)"


def rule_frags(col_sql: str, dialect: str) -> dict[str, str]:
    """Boolean SQL fragment per rule, for ``dialect`` in {'spark',
    'duckdb'}. The two dialects differ only in the array lexicon
    (size/len, filter/list_filter, split/string_split, rlike/
    regexp_matches); every constant, threshold and formula is shared."""
    spark = dialect == "spark"
    size = "size" if spark else "len"
    filt = "filter" if spark else "list_filter"
    split = (
        f"split({col_sql}, ' ')" if spark else f"string_split({col_sql}, ' ')"
    )
    lines = (
        f"split({col_sql}, '\\n')"
        if spark
        else f"string_split({col_sql}, chr(10))"
    )
    ne = "!=" if spark else "<>"
    alpha = (
        "x rlike '[A-Za-z]'" if spark else "regexp_matches(x, '[A-Za-z]')"
    )

    words = f"{filt}({split}, x -> x {ne} '')"
    wc = f"CAST({size}({words}) AS DOUBLE)"
    # divisor form: Spark 4 runs ANSI mode, where x/0 THROWS (DuckDB
    # yields NULL) — nullif makes both engines yield NULL, which the
    # coalesce(..., false) wrapper turns into a deterministic fail.
    wcd = f"nullif({wc}, CAST(0 AS DOUBLE))"
    nlines = f"nullif(CAST({size}({lines}) AS DOUBLE), CAST(0 AS DOUBLE))"
    lo, hi = GOPHER_BOUNDS["word_count"]
    wlo, whi = GOPHER_BOUNDS["mean_word_len"]
    # word chars = total chars minus separators (space/newline)
    wchars = (
        f"CAST(length(replace(replace({col_sql}, ' ', ''),"
        " chr(10), '')) AS DOUBLE)"
    )
    symbols = (
        f"({occurrences_sql(col_sql, '#')}"
        f" + {occurrences_sql(col_sql, '...')})"
    )
    # literal UTF-8 bullet/ellipsis chars: Spark's chr(n) wraps at 256
    # (chr(8226) = '"'), so chr() is NOT portable above ASCII.
    bullet = (
        f"{size}({filt}({lines}," " x -> x LIKE '-%' OR x LIKE '•%'))"
    )
    ellipsis = (
        f"{size}({filt}({lines}," " x -> x LIKE '%...' OR x LIKE '%…'))"
    )
    alpha_words = f"{size}({filt}({words}, x -> {alpha}))"
    stop_hits = " + ".join(
        f"(CASE WHEN (' ' || lower({col_sql}) || ' ')"
        f" LIKE '% {w} %' THEN 1 ELSE 0 END)"
        for w in STOPWORDS
    )

    frags = {
        "word_count": f"{wc} >= {_dbl(lo)} AND {wc} <= {_dbl(hi)}",
        "mean_word_len": (
            f"{wchars} / {wcd} >= {_dbl(wlo)}"
            f" AND {wchars} / {wcd} <= {_dbl(whi)}"
        ),
        "symbol_ratio": (
            f"CAST({symbols} AS DOUBLE) / {wcd}"
            f" <= {_dbl(GOPHER_BOUNDS['symbol_word_ratio_max'])}"
        ),
        "bullet_lines": (
            f"CAST({bullet} AS DOUBLE) / {nlines}"
            f" <= {_dbl(GOPHER_BOUNDS['bullet_line_frac_max'])}"
        ),
        "ellipsis_lines": (
            f"CAST({ellipsis} AS DOUBLE) / {nlines}"
            f" <= {_dbl(GOPHER_BOUNDS['ellipsis_line_frac_max'])}"
        ),
        "alpha_words": (
            f"CAST({alpha_words} AS DOUBLE) / {wcd}"
            f" >= {_dbl(GOPHER_BOUNDS['alpha_word_frac_min'])}"
        ),
        "stopwords": (
            f"({stop_hits}) >= {GOPHER_BOUNDS['min_stopword_hits']}"
        ),
    }
    return {k: f"coalesce({v}, false)" for k, v in frags.items()}


def gopher_exprs(col_sql: str = "text") -> dict[str, Column]:
    """Per-document rule booleans as Spark Columns (one projection)."""
    return {k: F.expr(v) for k, v in rule_frags(col_sql, "spark").items()}


def gopher_report(
    df: DataFrame, text_col: str = "text", stream_col: str = "lang"
) -> DataFrame:
    """Per-stream Gopher rule report: doc count, per-rule pass counts,
    and docs passing ALL rules. Map-only projection + one count
    aggregate; every output is BIGINT (hash-stable under the gate)."""
    frags = rule_frags(text_col, "spark")
    passed = [F.expr(frags[r]).cast("bigint").alias(f"__{r}") for r in RULES]
    base = df.select(stream_col, *passed)
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(f"__{r}").alias(f"pass_{r}") for r in RULES
    ]
    all_pass = F.expr(" AND ".join(f"__{r} = 1" for r in RULES))
    aggs.append(F.sum(all_pass.cast("bigint")).alias("pass_all"))
    return base.groupBy(stream_col).agg(*aggs).orderBy(stream_col)


def gopher_report_oracle(
    table: str = "documents",
    text_col: str = "text",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of gopher_report — same fragments, DuckDB lexicon."""
    frags = rule_frags(text_col, "duckdb")
    per = ",\n         ".join(
        f"CASE WHEN {frags[r]} THEN 1 ELSE 0 END AS __{r}" for r in RULES
    )
    sums = ",\n       ".join(
        f"CAST(SUM(__{r}) AS BIGINT) AS pass_{r}" for r in RULES
    )
    allp = " AND ".join(f"__{r} = 1" for r in RULES)
    return f"""
WITH scored AS (
  SELECT {stream_col},
         {per}
  FROM {table}
)
SELECT {stream_col}, COUNT(*) AS n_docs,
       {sums},
       CAST(SUM(CASE WHEN {allp} THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
FROM scored GROUP BY {stream_col} ORDER BY {stream_col}
"""
