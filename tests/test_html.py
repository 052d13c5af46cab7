"""HTML→text extraction (functions/html.py): semantic cases + the
dual-dialect guarantee (Spark Java-regex output == DuckDB RE2 output,
char for char) on adversarial snippets."""

from __future__ import annotations

from pyspark.sql import functions as F

from amadeus_spark.functions import html

CASES = [
    # script bodies vanish even when they contain '<' and quotes
    '<p>a</p><script>if (x < 2) { s = "</div>"; }</script><p>b</p>',
    # style blocks vanish; comments vanish
    "<style>p { color: red }</style>pre<!-- secret -->post",
    # entities decode ONCE: '&amp;lt;' must become '&lt;', never '<'
    "x &amp;lt; y &amp; z &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b",
    # block tags become line breaks, inline tags become spaces
    "<h1>Title</h1><div>para one</div><p>para <b>two</b></p>",
    # attributes with '>'-free junk, self-closing, uppercase tags
    '<IMG src="x.png" alt="a<b"/><BR/>done',
    # whitespace collapse across tag soup
    "  a \t b\r\n<p>   c   </p>\n\n d  ",
]


def test_extraction_semantics(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "i long, h string")
    out = {r.i: r.t for r in df.select("i", html.html_to_text(F.col("h")).alias("t")).collect()}
    assert out[0] == "a\nb"
    assert out[1] == "pre post"
    assert out[2] == "x &lt; y & z <tag> \"q\" 's' a b"
    assert out[3] == "Title\npara one\npara two"
    assert out[4] == "done"
    assert out[5] == "a b\nc\nd"


def test_dialect_parity_on_adversarial_snippets(spark, duck):
    """Same bytes through both engines' regex pipelines — the property
    the strict gate hash depends on."""
    rows = [(i, c) for i, c in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, h string")
    got_spark = {
        r.i: r.t
        for r in df.select("i", html.html_to_text(F.col("h")).alias("t")).collect()
    }
    duck.execute("DROP TABLE IF EXISTS __html_cases")
    duck.execute("CREATE TABLE __html_cases (i bigint, h varchar)")
    duck.executemany("INSERT INTO __html_cases VALUES (?, ?)", rows)
    got_duck = dict(
        duck.sql(
            f"SELECT i, {html.html_to_text_sql('h')} FROM __html_cases"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_no_python_in_plan(spark):
    from amadeus_spark import plans

    df = spark.range(5).select(
        html.html_to_text(html.wrap_as_html(F.col("id").cast("string"))).alias("t")
    )
    plans.assert_no_python_udf(df)
