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


def read_warc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """WARC files → Webpage rows (reference Source impl lib.rs:113-131).
    ``path`` may be a directory, a single file, or an explicit path list
    (the manifest-expansion case). Filter to warc_type='response' for
    page bodies, as the reference's parser emits only crawled pages
    (parser.rs)."""
    paths = path if isinstance(path, list) else [path]
    binary = spark.read.format("binaryFile").load(paths).select("content")
    return binary.mapInPandas(_warc_map, schema=WEBPAGE_SCHEMA)


# ---- Common Crawl crawl-id → manifest → per-file tasks --------------------

#: Public Common Crawl HTTP front door (also an s3://commoncrawl bucket —
#: use session.s3_configs + the s3a base for cluster-local reads).
COMMONCRAWL_BASE = "https://data.commoncrawl.org"


def _fetch_bytes(url: str) -> bytes:
    """Tiny scheme-dispatching fetch for manifest files: http(s) via
    urllib, file:// or bare paths via local open. The manifest is a few
    hundred KB — driver-side fetch is the right place for it."""
    if url.startswith(("http://", "https://")):
        from urllib.request import urlopen

        with urlopen(url) as r:  # noqa: S310 — public CC manifest URL
            return r.read()
    if url.startswith("file://"):
        url = url[len("file://") :]
    with open(url, "rb") as f:
        return f.read()


def crawl_manifest_paths(
    crawl_id: str, base_url: str = COMMONCRAWL_BASE, limit: int | None = None
) -> list[str]:
    """Expand a crawl id ("CC-MAIN-2018-43") to its WARC file URLs — the
    reference's manifest step (amadeus-commoncrawl/src/lib.rs:50-84:
    fetch crawl-data/{id}/warc.paths.gz, gunzip, one task per line).

    ``base_url`` doubles as the path prefix for the (relative) manifest
    lines; point it at a file:// mirror for offline/testing use.
    ``limit`` caps the expansion (a full crawl is ~80k files / ~100 TB —
    sample before committing a cluster to it)."""
    manifest_url = f"{base_url}/crawl-data/{crawl_id}/warc.paths.gz"
    lines = gzip.decompress(_fetch_bytes(manifest_url)).decode().splitlines()
    paths = [f"{base_url}/{p.strip()}" for p in lines if p.strip()]
    return paths[:limit] if limit is not None else paths


def read_commoncrawl(
    spark: SparkSession,
    crawl_id: str,
    base_url: str = COMMONCRAWL_BASE,
    limit: int | None = None,
) -> DataFrame:
    """Common Crawl source end-to-end (lib.rs:50-131): crawl id →
    manifest → per-file WARC tasks → Webpage rows. One Spark task per
    .warc.gz file, exactly the reference's one-task-per-object layout."""
    return read_warc(spark, crawl_manifest_paths(crawl_id, base_url, limit))
