"""HTML → text extraction as dual-dialect regex pipelines — the Common
Crawl ingestion step between the WARC source (Webpage.contents,
amadeus-types/src/http.rs:25-29) and the text-analysis operators: strip
script/style/comment blocks, drop tags, unescape the common entities,
collapse whitespace. Boilerplate-aware extraction (trafilatura-class)
needs a DOM library this container doesn't have; the regex pipeline is
the standard first-pass scrub and is exactly expressible in BOTH engines,
so it runs under the strict hash gate.

Dialect discipline (iron rule 7): ONE step table drives both the Spark
Column and the DuckDB SQL — the patterns stay in the Java∩RE2 regex
subset ((?is) inline flags, lazy quantifiers, character classes; no
backreferences, no lookaround, which RE2 lacks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) applied in order. Order matters: block strips
#: before tag strips, entities after tags (so '&lt;p&gt;' never becomes
#: a strippable tag — the classic double-decode injection), whitespace
#: collapse last.
_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)</?(p|br|div|li|tr|h[1-6])\b[^>]*>", " \n"),  # block-ish → break
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"(?s)^\s+", ""),  # trim() alone strips spaces, not newlines
    (r"(?s)\s+$", ""),
]


def html_to_text(col: Column) -> Column:
    """Spark side: chained regexp_replace (global by default), trimmed."""
    out = col
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_to_text_sql(col_sql: str) -> str:
    """DuckDB side: the identical chain (RE2; 'g' flag for global)."""
    out = col_sql
    for pat, rep in _STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"


def wrap_as_html(col: Column) -> Column:
    """Deterministic synthetic page around a text column (gate-query
    fixture: same wrapper in both dialects, so extraction is tested on
    content that exercises every step)."""
    return F.concat(
        F.lit(
            "<html><head><title>t&amp;t</title>"
            "<style>p { color: red; }</style>"
            '<script type="text/javascript">if (1 < 2) { x(); }</script>'
            "</head><body><!-- boilerplate --><div class=\"main\"><p>"
        ),
        col,
        F.lit("</p><br><li>&quot;footer&quot; &lt;end&gt;</li></div></body></html>"),
    )


def wrap_as_html_sql(col_sql: str) -> str:
    return (
        "'<html><head><title>t&amp;t</title>"
        "<style>p { color: red; }</style>"
        "<script type=\"text/javascript\">if (1 < 2) { x(); }</script>"
        "</head><body><!-- boilerplate --><div class=\"main\"><p>' || "
        f"{col_sql} || "
        "'</p><br><li>&quot;footer&quot; &lt;end&gt;</li></div></body></html>'"
    )
