"""URL canonicalization (functions/urls.py): semantics + dialect parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.functions import urls

CASES = [
    ("HTTP://Example.COM:80/Path/To?utm_source=x&b=2&a=1&gclid=z#frag",
     "http://example.com/Path/To?a=1&b=2"),
    ("https://site.org:443", "https://site.org/"),
    ("https://site.org:8443/x?z=1", "https://site.org:8443/x?z=1"),  # non-default port kept
    ("http://a.b/p?ref=tw&utm_campaign=c", "http://a.b/p"),
    ("https://X.Y/q?b=2&a=1", "https://x.y/q?a=1&b=2"),
    ("https://x.y/q?a=1&b=2", "https://x.y/q?a=1&b=2"),  # already canonical
    ("http://h.i/path/?fbclid=123", "http://h.i/path/"),
    ("http://cAsE.net/KeepPathCase", "http://case.net/KeepPathCase"),
]


def test_canonicalization_semantics(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", urls.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


def test_dialect_parity(spark, duck):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r.i: r.c
        for r in df.select(
            "i", urls.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    duck.execute("DROP TABLE IF EXISTS __urls")
    duck.execute("CREATE TABLE __urls (i bigint, url varchar)")
    duck.executemany("INSERT INTO __urls VALUES (?, ?)", rows)
    want = dict(
        duck.sql(
            f"SELECT i, {urls.canonicalize_url_sql('url')} FROM __urls"
        ).fetchall()
    )
    assert got == want


def test_plan_is_pure_catalyst(spark):
    from amadeus_spark import plans

    df = spark.range(10).select(
        urls.canonicalize_url(
            F.concat(F.lit("http://h/p?a="), F.col("id").cast("string"))
        ).alias("c")
    )
    plans.assert_no_python_udf(df)


# ----- registered_domain / domain_report ------------------------------------


def test_registered_domain_rules(spark):
    from pyspark.sql import functions as F

    from amadeus_spark.functions.urls import registered_domain

    cases = [
        ("www.example.com", "example.com"),
        ("Example.COM", "example.com"),
        ("a.b.news.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("co.uk", "co.uk"),  # bare suffix: only 2 labels -> itself
        ("localhost", "localhost"),
        ("cdn.tracker.net", "tracker.net"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r["d"]
        for r in df.select(
            registered_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_domain_report_blocklist(spark):
    from amadeus_spark.functions.urls import domain_report

    df = spark.createDataFrame(
        [
            (1, "http://www.spam.example/x"),
            (2, "http://ok.example.com/y"),
            (3, "http://cdn.ok.example.com/y"),
        ],
        "doc_id long, url string",
    )
    rows = {r["domain"]: r for r in domain_report(df).collect()}
    assert rows["spam.example"]["blocked"] is True
    assert rows["example.com"]["blocked"] is False
    assert rows["example.com"]["n_urls"] == 2
    assert rows["example.com"]["n_hosts"] == 2
    assert rows["example.com"]["n_docs"] == 2


def test_domain_report_strips_port_and_userinfo(spark):
    """Policy keys on the HOST: ports and userinfo in the authority
    must not leak into the domain — 'example.com:8080' rolling up
    under 'com:8080', or a blocklisted domain evading the deny list by
    serving on a non-default port, is a frontier-policy hole. Both
    dialects share the stripping fragment."""
    import duckdb

    from amadeus_spark.functions.urls import domain_report, domain_report_oracle

    rows = [
        (1, "http://example.com:8080/x"),
        (2, "http://user:pw@example.com/y"),
        (3, "https://example.com/z"),
        (4, "http://www.spam.example:8081/evade"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["domain"]: r for r in domain_report(df).collect()}
    assert set(got) == {"example.com", "spam.example"}
    assert got["example.com"]["n_urls"] == 3
    assert got["example.com"]["n_hosts"] == 1  # one bare host
    assert got["spam.example"]["blocked"] is True  # port can't evade
    # dual-dialect parity on the same rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, url VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    odf = con.sql(domain_report_oracle("t")).fetchdf()
    orows = {r["domain"]: r for r in odf.to_dict("records")}
    assert set(orows) == set(got)
    for d in got:
        assert orows[d]["n_urls"] == got[d]["n_urls"]
        assert orows[d]["n_hosts"] == got[d]["n_hosts"]
        assert bool(orows[d]["blocked"]) == got[d]["blocked"]
