"""Common Crawl / WARC source — reference: amadeus-commoncrawl/src/lib.rs
(manifest fetch + gunzip + WARC parse → Webpage{ip, url, contents},
parser at amadeus-commoncrawl/src/parser.rs:1-232).

Spark-first: there is no built-in WARC reader, so this is the one source
that needs custom parse code. Plumbing is ``spark.read.format("binaryFile")``
(one file per row, distributed) + an Arrow-batched ``mapInPandas`` that
splits records and yields Webpage rows. The parser handles the WARC/1.0
record grammar (version line, named headers, Content-Length body,
CRLFCRLF delimiters) for uncompressed and gzip member-per-record files —
the format is public (ISO 28500); parsing logic is written fresh.

At 100 TB (Common Crawl is ~100 TB/crawl): one task per .warc.gz file,
records never cross file boundaries, so this parallelizes exactly like
the reference's one-task-per-S3-object layout (lib.rs:92-110) but with
Spark's scheduler/retry for free. Manifest-driven reads: pass the
expanded path list to ``read_warc``.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WEBPAGE_SCHEMA = T.StructType(
    [
        T.StructField("ip", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("contents", T.BinaryType(), True),
    ]
)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Parse a WARC/1.0 byte stream into records.

    Grammar (ISO 28500): each record = version line ``WARC/1.0``,
    header lines ``Name: value`` until an empty line, then exactly
    Content-Length bytes of block, then CRLF CRLF."""
    if data[:2] == b"\x1f\x8b":  # gzipped (possibly multi-member)
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos] in (0x0D, 0x0A):  # inter-record blanks
            pos += 1
        head_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        if head_end == -1:
            head_end = data.find(b"\n\n", pos)
            sep_len = 2
        if head_end == -1:
            break
        header_blob = data[pos:head_end].decode("utf-8", errors="replace")
        lines = header_blob.splitlines()
        if not lines or not lines[0].startswith("WARC/"):
            break
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + sep_len
        body = data[body_start : body_start + length]
        yield {
            "ip": headers.get("warc-ip-address"),
            "url": headers.get("warc-target-uri"),
            "warc_type": headers.get("warc-type"),
            "contents": bytes(body),
        }
        pos = body_start + length


def _warc_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for blob in pdf["content"]:
            for rec in parse_warc_bytes(bytes(blob)):
                out.append(rec)
        yield pd.DataFrame(out, columns=["ip", "url", "warc_type", "contents"])


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → Webpage rows (reference Source impl lib.rs:113-131).
    Filter to warc_type='response' for page bodies, as the reference's
    parser emits only crawled pages (parser.rs)."""
    binary = spark.read.format("binaryFile").load(path).select("content")
    return binary.mapInPandas(_warc_map, schema=WEBPAGE_SCHEMA)
