"""URL canonicalization — the URL-level dedup primitive a crawl pipeline
applies before fetch/dedup (Common Crawl URLs arrive in every casing and
tracking-param variant; canonical form is the join/group key).

Rules (each a public, standard normalization):
- scheme and host lowercase; default ports stripped (http:80, https:443)
- fragment dropped
- tracking params dropped (utm_*, gclid, fbclid, msclkid, igshid, ref,
  ref_src — the industry stop-list), remaining params SORTED so
  `?b=2&a=1` ≡ `?a=1&b=2`
- empty path → '/'

Dual-dialect discipline: one constant set (the param stop-list regex and
the component regexes) emitted into both engines; no parse_url (DuckDB
has none) — both sides use the same regexp_extract/filter/sort/join
plan, so canonical strings are byte-identical under the strict gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking-parameter stop-list (anchored key match, values arbitrary)
TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|igshid|ref|ref_src)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(col: Column) -> Column:
    """Spark side — pure Catalyst exprs, no UDF."""
    url = col
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    raw_host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = (
        F.when(
            (scheme == "http") & raw_host.endswith(":80"),
            F.substring_index(raw_host, ":", 1),
        )
        .when(
            (scheme == "https") & raw_host.endswith(":443"),
            F.substring_index(raw_host, ":", 1),
        )
        .otherwise(raw_host)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def canonicalize_url_sql(col_sql: str) -> str:
    """DuckDB twin — identical component regexes and param rules."""
    scheme = f"lower(regexp_extract({col_sql}, '{_SCHEME_RE}', 1))"
    raw_host = f"lower(regexp_extract({col_sql}, '{_HOST_RE}', 1))"
    host = f"""CASE
        WHEN {scheme} = 'http' AND {raw_host} LIKE '%:80'
            THEN string_split({raw_host}, ':')[1]
        WHEN {scheme} = 'https' AND {raw_host} LIKE '%:443'
            THEN string_split({raw_host}, ':')[1]
        ELSE {raw_host} END"""
    path = f"regexp_extract({col_sql}, '{_PATH_RE}', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({col_sql}, '{_QUERY_RE}', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}')))"
    )
    qpart = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    return f"{scheme} || '://' || {host} || {path} || {qpart}"
