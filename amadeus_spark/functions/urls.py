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

#: authority → bare host: the _HOST_RE capture is the full authority
#: (userinfo@host:port). Domain policy (rollups, deny lists) must key
#: on the HOST alone — 'http://example.com:8080/x' rolling up under
#: 'com:8080', or a blocklisted domain evading BLOCKED_DOMAINS by
#: serving on a non-default port, is a frontier-policy hole.
_USERINFO_RE = "^[^@]*@"
_PORT_RE = ":[0-9]*$"


def _bare_host(authority: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(authority, _USERINFO_RE, ""), _PORT_RE, ""
    )


def _bare_host_sql(authority_sql: str) -> str:
    return (
        f"regexp_replace(regexp_replace({authority_sql}, "
        f"'{_USERINFO_RE}', ''), '{_PORT_RE}', '')"
    )


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


# ----- registered-domain extraction + domain-level rollup -------------------

#: two-level public suffixes recognized without the full PSL (the
#: high-traffic subset; a production deployment swaps in the published
#: Public Suffix List — the RULE SHAPE is identical, the constant set
#: grows). Kept tiny so both dialects inline it as one IN list.
CC_SLDS = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br")

#: domain blocklist (crawl-pipeline deny list) — registered-domain match
BLOCKED_DOMAINS = ("spam.example", "tracker.net")


def registered_domain(host: Column) -> Column:
    """Spark side: the registrable domain of a lowercased host — last
    two labels, or last three when the final two form a recognized
    two-level public suffix (co.uk family). Single-label hosts pass
    through. Pure Catalyst exprs."""
    h = F.lower(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    in_sld = last2.isin(*CC_SLDS)
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & in_sld, last3)
        .otherwise(last2)
    )


def registered_domain_sql(host_sql: str) -> str:
    """DuckDB twin — same label rules and CC_SLDS constant set."""
    slds = ", ".join(f"'{s}'" for s in CC_SLDS)
    h = f"lower({host_sql})"
    parts = f"string_split({h}, '.')"
    n = f"len({parts})"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    return f"""CASE
        WHEN {n} <= 1 THEN {h}
        WHEN {n} >= 3 AND {last2} IN ({slds}) THEN {last3}
        ELSE {last2} END"""


def domain_report(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain crawl rollup: URL/doc counts, distinct
    hosts, and the blocklist verdict — the frontier-policy aggregation a
    crawl scheduler reads (politeness budgets, deny lists are per
    REGISTERED domain, not per host). Map-only projection + one
    aggregate; hot domains are exactly the partial-agg-friendly case.
    The authority is stripped to the bare host (userinfo and :port
    removed) before label splitting, mirroring canonicalize_url's port
    handling — policy keys on the host, not the endpoint."""
    host = _bare_host(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    )
    dom = registered_domain(host)
    blocked = dom.isin(*BLOCKED_DOMAINS)
    return (
        df.select(
            dom.alias("domain"),
            host.alias("__host"),
            F.col(id_col),
            blocked.alias("__blocked"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("__host").alias("n_hosts"),
            F.count_distinct(id_col).alias("n_docs"),
            F.max(F.col("__blocked")).alias("blocked"),
        )
        .orderBy("domain")
    )


def domain_report_oracle(
    table: str, url_col: str = "url", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of domain_report — same host regex, label rules and
    blocklist constants (bare-host stripping included)."""
    blocked = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)
    host = _bare_host_sql(
        f"lower(regexp_extract({url_col}, '{_HOST_RE}', 1))"
    )
    dom = registered_domain_sql(host)
    return f"""
WITH hosts AS (
  SELECT {dom} AS domain, {host} AS h, {id_col} FROM {table}
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_hosts,
       CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs,
       MAX(domain IN ({blocked})) AS blocked
FROM hosts GROUP BY domain ORDER BY domain
"""
