"""Unicode/whitespace text normalization — the canonical-form rewrite a
corpus pipeline applies before tokenization and dedup (NFKC-lite: the
punctuation/space folding subset expressible without a Unicode library;
the same rule family as the published sentencepiece/CCNet normalizers).

Full NFKC needs ICU tables this container doesn't ship; these steps are
the high-frequency web-text subset — smart quotes, dashes, ellipsis,
NBSP/zero-width, control chars, whitespace runs — each a public,
standard folding. A production deployment extends the STEP TABLE; the
plan shape (one chained-regexp projection, map-only, fused into the
scan at 100 TB) is unchanged.

Dialect discipline (iron rule 7, html.py precedent): ONE step table
drives both engines; patterns stay in the Java∩RE2 subset; non-ASCII
characters are embedded as literal UTF-8 (Spark's chr(n) wraps at 256 —
CLAUDE.md), never via chr().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) applied in order: character folds first,
#: then removals, whitespace collapse last.
NORMALIZE_STEPS: list[tuple[str, str]] = [
    ("[“”«»]", '"'),  # curly/guillemet double quotes
    ("[‘’´]", "'"),  # curly single quotes / acute
    ("[–—−]", "-"),  # en/em dash, minus sign
    ("…", "..."),  # ellipsis
    ("[   ]", " "),  # NBSP family -> space
    ("[​‌‍﻿]", ""),  # zero-width / BOM
    ("[\\x00-\\x08\\x0b-\\x1f\\x7f]", ""),  # control chars (tab 0x09 / newline 0x0a survive to the whitespace steps)
    ("[ \\t]+", " "),  # collapse runs of spaces/tabs
    (" ?\\n[ \\n]*", "\n"),  # collapse blank lines, strip line-edge spaces
]


def normalize_text(col: Column) -> Column:
    """Spark side: chained regexp_replace, trimmed."""
    out = col
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def normalize_text_sql(col_sql: str) -> str:
    """DuckDB twin — identical chain ('g' flag for global)."""
    out = col_sql
    for pat, rep in NORMALIZE_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"


def normalize_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> DataFrame:
    """Per-stream normalization report: docs changed, chars removed, and
    the order-independent per-doc checksum of the NORMALIZED text (the
    span_scrub per-char discipline — one folded character anywhere flips
    the stream hash). Map-only projection + one rollup."""
    from amadeus_spark.functions.dedup import hash32_frag

    norm = normalize_text(F.col(text_col))
    staged = df.select(
        stream_col,
        F.col(id_col),
        F.col(text_col).alias("__raw"),
        F.length(text_col).cast("bigint").alias("__raw_len"),
        norm.alias("__norm"),
    )
    hs, _ = hash32_frag(
        f"concat(cast({id_col} as string), chr(1), __norm)", ""
    )
    return (
        staged.groupBy(stream_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("__norm") != F.col("__raw")).cast("bigint")
            ).alias("n_changed"),
            F.sum(
                (F.col("__raw_len") - F.length("__norm")).cast("bigint")
            ).alias("chars_removed"),
            F.sum(mojibake_flag(F.col("__raw")).cast("bigint")).alias(
                "n_mojibake"
            ),
            F.sum(F.expr(hs)).cast("long").alias("content_sum"),
        )
        .orderBy(stream_col)
    )


def normalize_report_oracle(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "lang",
) -> str:
    """DuckDB twin of normalize_report — same step table and checksum."""
    from amadeus_spark.functions.dedup import hash32_frag

    norm = normalize_text_sql(text_col)
    _, hd = hash32_frag("", f"CAST({id_col} AS VARCHAR) || chr(1) || n")
    return f"""
WITH staged AS (
  SELECT {stream_col}, {id_col},
         length({text_col}) AS raw_len,
         {text_col} AS raw, {norm} AS n
  FROM {table}
)
SELECT {stream_col},
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n <> raw THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(raw_len - length(n)) AS BIGINT) AS chars_removed,
       CAST(SUM(CASE WHEN {mojibake_flag_sql("raw")} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mojibake,
       CAST(SUM({hd}) AS BIGINT) AS content_sum
FROM staged GROUP BY {stream_col} ORDER BY {stream_col}
"""


# ----- mojibake detection ---------------------------------------------------

#: high-signal double-encoded-UTF-8 sequences (ftfy's classic cases:
#: 'Ã©' = é through latin-1, 'â€™' = right single quote, 'â€œ'/'â€'
#: = curly doubles, 'Â ' = NBSP remnant). Detection only — real repair
#: needs byte-level re-encode, which is a Pandas-UDF job, not a regex.
MOJIBAKE_MARKERS = ("Ã©", "Ã¤", "Ã¶", "Ã¼", "â€™", "â€œ", "â€\x9d", "Â ")


def mojibake_flag(col: Column) -> Column:
    """True when the text carries a classic double-encoding artifact."""
    cond = None
    for m in MOJIBAKE_MARKERS:
        c = F.contains(col, F.lit(m))
        cond = c if cond is None else (cond | c)
    return cond


def mojibake_flag_sql(col_sql: str) -> str:
    """DuckDB twin — same marker constants."""
    parts = []
    for m in MOJIBAKE_MARKERS:
        esc = m.replace("'", "''")
        parts.append(f"contains({col_sql}, '{esc}')")
    return "(" + " OR ".join(parts) + ")"
