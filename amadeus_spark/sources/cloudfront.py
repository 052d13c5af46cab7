"""CloudFront access-log source — reference: amadeus-aws/src/cloudfront.rs
(S3 list + gunzip + W3C extended log parse → CloudfrontRow, row struct at
src/data.rs:229-253).

Spark-first: ``spark.read.text`` handles directory listing, S3 (s3a://)
and .gz decompression natively; the W3C parse is a single projection of
split() + element_at() column expressions — no UDF, fully codegen'd, so
the parse runs at scan speed. Comment lines (#Version/#Fields) are
filtered exactly like the reference (cloudfront.rs:86-93).

Field order follows the CloudFront standard access-log format (public
AWS docs), which is what CloudfrontRow::from_line consumes:
date time x-edge-location sc-bytes c-ip cs-method cs(Host) cs-uri-stem
sc-status cs(Referer) cs(User-Agent) cs-uri-query cs(Cookie)
x-edge-result-type x-edge-request-id x-host-header cs-protocol cs-bytes
time-taken x-forwarded-for ssl-protocol ssl-cipher
x-edge-response-result-type cs-protocol-version fle-status
fle-encrypted-fields
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FIELDS = [
    "date",
    "time",
    "edge_location",
    "response_bytes",
    "remote_ip",
    "method",
    "host",
    "url_stem",
    "status",
    "referer",
    "user_agent",
    "uri_query",
    "cookie",
    "result_type",
    "request_id",
    "host_header",
    "protocol",
    "request_bytes",
    "time_taken",
    "forwarded_for",
    "ssl_protocol",
    "ssl_cipher",
    "response_result_type",
    "http_version",
    "fle_status",
    "fle_encrypted_fields",
]

_NULLABLE = {
    "referer",
    "user_agent",
    "cookie",
    "forwarded_for",
    "ssl_protocol",
    "ssl_cipher",
    "fle_status",
    "fle_encrypted_fields",
}
_LONG_COLS = {"response_bytes", "request_bytes", "status"}


def _project_cloudfront(raw: DataFrame) -> DataFrame:
    """The W3C parse as pure column expressions over a `value` text
    column — shared by the batch reader and streaming ingestion (the
    same projection applies unchanged to a readStream.text frame).
    Comment lines (#Version/#Fields) are filtered exactly like the
    reference (cloudfront.rs:86-93)."""
    lines = raw.filter(~F.ltrim(F.col("value")).startswith("#"))
    parts = lines.select(F.split(F.col("value"), "\t").alias("p"))
    cols = []
    for i, name in enumerate(_FIELDS):
        # try_element_at: older log-format versions have fewer trailing
        # fields — short lines yield NULLs instead of failing the job.
        c = F.try_element_at(F.col("p"), F.lit(i + 1))
        if name in _NULLABLE:
            c = F.when(c == "-", None).otherwise(c)
        if name in _LONG_COLS:
            # try_cast, not cast: '-' sentinels and truncated lines must
            # decode to NULL in ANSI mode too (cast throws there); the
            # DuckDB oracle mirrors this with TRY_CAST.
            c = c.try_cast("long")
        cols.append(c.alias(name))
    df = parts.select(*cols)
    # time (reference: DateTime from date+time) + full url (host+stem)
    return (
        df.withColumn(
            "time",
            F.to_timestamp(F.concat_ws(" ", F.col("date"), F.col("time"))),
        )
        .withColumn("url", F.concat(F.lit("https://"), F.col("host"), F.col("url_stem")))
    )


def read_cloudfront(spark: SparkSession, path: str) -> DataFrame:
    """Parse CloudFront logs into the CloudfrontRow shape
    (src/data.rs:229-253): timestamp, edge location, bytes, ip, url, etc.

    '-' sentinel → NULL for optional fields (matching the reference's
    Option<...> decode in CloudfrontRow::from_line)."""
    return _project_cloudfront(spark.read.text(path))


def read_cloudfront_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin: new log files landing under ``path`` are parsed
    incrementally with the identical projection (readStream.text handles
    the .gz decompression and file tracking)."""
    return _project_cloudfront(spark.readStream.format("text").load(path))


def hourly_histogram(df: DataFrame) -> DataFrame:
    """The reference's flagship CloudFront aggregation
    (examples/cloudfront_logs.rs:33-40): per-hour request counts via
    time truncation (DateTime::truncate_minutes(60) → date_trunc)."""
    return (
        df.groupBy(F.date_trunc("hour", F.col("time")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("requests"))
        .orderBy("hour")
    )
