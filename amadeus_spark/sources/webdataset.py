"""WebDataset tar-shard source — index .tar shards into member /
sample byte-range plans without decoding payloads.

WebDataset (tar shards of samples; each sample = files sharing a
basename key, e.g. ``000123.jpg`` + ``000123.txt`` + ``000123.json``)
is the de-facto storage layout for multimodal LLM training corpora
(LAION, OpenCLIP, img2dataset all emit it). Beyond the reference
(whose sources are CSV/JSON/parquet/Postgres/WARC — SURVEY §2.1);
included because a 100 TB image-text corpus ARRIVES as tar shards and
the first distributed operation over it is exactly this: enumerate
members, group into samples, and hand decoders (offset, size) windows
— the mp4/mp3 demux posture (plan byte ranges, decode nothing).

Physical strategy: one task per shard (members never cross shard
boundaries — the WARC one-task-per-object layout), executor-side
opens via builtin/pyarrow.fs (no Hadoop bridge in Python workers),
and header-hopping I/O: on seekable streams indexing reads 512 bytes
per member and SEEKS past payloads, so a shard index costs
O(members), not O(bytes). The tar grammar parsed here is the public
POSIX ustar layout plus the two long-name extensions real shards
contain (GNU 'L' longname, pax 'x' path override).
"""

from __future__ import annotations

import io
import os
import posixpath
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK = 512

#: S3's single put_object size limit. Shards at or under it publish as
#: ONE atomic PUT (all-or-nothing); larger shards switch to a
#: MULTIPART upload with abort-on-failure — parts are INVISIBLE until
#: complete_multipart_upload, so the no-partial-visible-object
#: contract holds either way (an aborted upload discards its parts; a
#: crashed task's un-aborted upload is invisible storage a bucket
#: lifecycle rule reclaims, never a readable partial object).
S3_SINGLE_PUT_CAP = 5 * (1 << 30)

#: multipart part size. S3 bounds: >=5 MiB per part (except the last),
#: <=10_000 parts — 256 MiB covers shards up to 2.5 TB, far past any
#: sane target_shard_bytes; the part loop widens the size if a shard
#: would somehow exceed the part-count bound.
S3_MULTIPART_PART_BYTES = 256 * (1 << 20)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("member", T.StringType(), False),
        T.StructField("sample_key", T.StringType(), True),
        T.StructField("slot", T.StringType(), True),
        T.StructField("offset", T.LongType(), False),
        T.StructField("size", T.LongType(), False),
    ]
)


# ------------------------------------------------------------ writer
# (deterministic ustar — golden fixtures and round-trip tests; real
# shards come from img2dataset et al., never from here)


def _ustar_header(name: str, size: int) -> bytes:
    """One POSIX ustar header block with zeroed metadata (mtime 0,
    uid/gid 0, mode 0644) so the same member list always produces the
    same bytes — the golden-fixture determinism contract."""
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"name too long for plain ustar fixture: {name!r}")
    return _gnu_header(nb, size, b"0")


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """A complete deterministic tar stream: headers + 512-padded
    payloads + the two-zero-block terminator."""
    out = bytearray()
    for name, data in members:
        out += _ustar_header(name, len(data))
        out += data
        out += b"\x00" * ((-len(data)) % BLOCK)
    out += b"\x00" * (2 * BLOCK)
    return bytes(out)


def _member_blocks(name: str, data: bytes) -> bytes:
    """Header block(s) + 512-padded payload for ONE member, emitting a
    GNU 'L' longname member first when the name exceeds ustar's
    100-byte field (iter_tar_members already parses it — writer and
    parser close over the same grammar). Deterministic bytes: zeroed
    metadata, like :func:`_ustar_header`."""
    nb = name.encode("utf-8")
    out = bytearray()
    if len(nb) > 100:
        link = nb + b"\x00"
        out += _gnu_header(b"././@LongLink", len(link), b"L")
        out += link + b"\x00" * ((-len(link)) % BLOCK)
        head = nb[:100]
    else:
        head = nb
    out += _gnu_header(head, len(data), b"0")
    out += data
    out += b"\x00" * ((-len(data)) % BLOCK)
    return bytes(out)


def _gnu_header(name_bytes: bytes, size: int, typeflag: bytes) -> bytes:
    """A ustar header block with an arbitrary typeflag (the '0'
    regular-member case is :func:`_ustar_header`'s grammar)."""
    hdr = bytearray(BLOCK)
    hdr[0 : len(name_bytes)] = name_bytes
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = (b"%011o" % size) + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b" " * 8
    hdr[156] = typeflag[0]
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:155] = (b"%06o" % chk) + b"\x00"
    return bytes(hdr)


def member_name(sample_key: str, slot: str | None) -> str:
    """Writer-side member naming — the inverse of
    :func:`split_sample_key`: ``key.slot``, or the bare key for
    slotless metadata members (no dot → joins no sample on re-read)."""
    return sample_key if slot is None else f"{sample_key}.{slot}"


#: SQL fragment for one member's on-tar byte footprint (header block,
#: GNU longname blocks when the UTF-8 name exceeds 100 bytes, payload
#: padded to 512) — the balance arithmetic the shard cut runs on. MUST
#: mirror _member_blocks exactly; pinned by the round-trip tests.
def _member_bytes_frag(name_sql: str, size_sql: str) -> str:
    nb = f"octet_length({name_sql})"
    long_blocks = (
        f"(case when {nb} > 100 then 1 + (({nb} + 1 + {BLOCK - 1}) "
        f"div {BLOCK}) else 0 end)"
    )
    return (
        f"cast({BLOCK} * (1 + {long_blocks}) + {size_sql} "
        f"+ (({BLOCK} - {size_sql} % {BLOCK}) % {BLOCK}) as bigint)"
    )


def _sub_path(root: str, rel: str) -> str:
    """``root``/``rel`` with any query string kept at the END —
    object-store URIs of the repo's connection-spec-in-the-path form
    carry endpoint/scheme/region as query params, so naive
    concatenation would splice the filename INTO the region value
    (the versioned-manifest _sub_uri lesson)."""
    if "?" in root:
        base, q = root.split("?", 1)
        return f"{base.rstrip('/')}/{rel}?{q}"
    return f"{root.rstrip('/')}/{rel}"


class _WriteSink:
    """Executor-side write handle with TWO-PHASE semantics: stream
    bytes via ``write``, ``close`` always (safe on failure — nothing
    becomes visible), then ``publish`` ONLY on success to make the
    object appear. Local files: tmp + atomic os.replace. s3://: an
    in-memory buffer published at publish time — ONE atomic
    put_object up to S3's single-PUT cap, a boto3 MULTIPART upload
    with abort-on-failure above it (parts invisible until complete;
    abort discards them — all-or-nothing either way; pyarrow's S3
    output stream is avoided because it starts multiparting at WRITE
    time, before success is known). Other remote filesystems: pyarrow
    streaming, published at write time."""

    def __init__(
        self,
        path: str,
        single_put_cap: int | None = None,
        part_bytes: int | None = None,
    ):
        # caps captured as ARGS (not read from module globals inside
        # the publish closure) so the driver's values at plan-build
        # time ride into executor python workers with the closure
        self._put_cap = (
            single_put_cap if single_put_cap is not None
            else S3_SINGLE_PUT_CAP
        )
        self._part_bytes = (
            part_bytes if part_bytes is not None
            else S3_MULTIPART_PART_BYTES
        )
        self._publish = None
        if "://" not in path or path.startswith("file:"):
            local = path
            if path.startswith("file:"):
                local = path[len("file:"):]
                while local.startswith("//"):
                    local = local[1:]
            os.makedirs(os.path.dirname(local), exist_ok=True)
            # unique tmp per ATTEMPT: a speculative/retried task must
            # never interleave writes into a shared tmp and then
            # atomically publish the corruption (the versioned-manifest
            # uuid-staging lesson); os.replace is last-writer-wins over
            # identical deterministic bytes
            import uuid as _uuid

            tmp = f"{local}.__tmp__{_uuid.uuid4().hex[:8]}"
            self._fh = open(tmp, "wb")
            self._publish = lambda: os.replace(tmp, local)
        elif path.startswith("s3://") or path.startswith("s3a://"):
            self._fh = io.BytesIO()
            self._data: bytes | None = None

            def _put():
                import boto3

                from amadeus_spark.operators.versioned import _s3_split

                kwargs, bucket, key = _s3_split(path)
                client = boto3.client("s3", **kwargs)
                data = self._data
                if len(data) <= self._put_cap:
                    client.put_object(Bucket=bucket, Key=key, Body=data)
                    return
                # over the single-PUT cap: MULTIPART with abort-on-
                # failure. Parts are invisible until complete, so a
                # failed/aborted upload never leaves a readable
                # partial object — same contract as the atomic PUT.
                part = max(
                    self._part_bytes,
                    -(-len(data) // 10_000),  # ceil: <=10k parts
                )
                mpu = client.create_multipart_upload(
                    Bucket=bucket, Key=key
                )
                uid = mpu["UploadId"]
                try:
                    parts = []
                    for i, off in enumerate(
                        range(0, len(data), part), start=1
                    ):
                        resp = client.upload_part(
                            Bucket=bucket,
                            Key=key,
                            PartNumber=i,
                            UploadId=uid,
                            Body=data[off:off + part],
                        )
                        parts.append(
                            {"ETag": resp["ETag"], "PartNumber": i}
                        )
                    client.complete_multipart_upload(
                        Bucket=bucket,
                        Key=key,
                        UploadId=uid,
                        MultipartUpload={"Parts": parts},
                    )
                except BaseException:
                    # discard the staged parts; nothing was visible.
                    # A failing abort (same broken network/creds) must
                    # not MASK the original error — the un-aborted
                    # upload stays invisible; a bucket lifecycle rule
                    # reclaims its storage.
                    try:
                        client.abort_multipart_upload(
                            Bucket=bucket, Key=key, UploadId=uid
                        )
                    except Exception:
                        pass
                    raise

            self._publish = _put
        else:
            import pyarrow.fs as pafs

            fs, rel = pafs.FileSystem.from_uri(path)
            self._fh = fs.open_output_stream(rel)

    def write(self, b: bytes) -> None:
        self._fh.write(b)

    def close(self) -> None:
        if isinstance(self._fh, io.BytesIO) and not self._fh.closed:
            self._data = self._fh.getvalue()
        self._fh.close()

    def publish(self) -> None:
        if self._publish is not None:
            self._publish()


def write_webdataset_shards(
    members: DataFrame,
    out_dir: str,
    target_shard_bytes: int = 1 << 30,
    prefix: str = "shard",
) -> DataFrame:
    """Distributed WebDataset shard WRITER — the other half of the
    LAION pipeline (img2dataset's output side): materialize a corpus
    of (``sample_key``, ``slot``, ``content binary``) members as
    deterministic tar shards plus a write-time index.

    Layout contract (what the round-trip oracle replays): samples are
    assigned to shards in GLOBAL ``sample_key`` order with
    size-balanced cuts — a sample starts shard ``k`` when the total
    on-tar bytes of all samples before it reaches ``k *
    target_shard_bytes`` (samples never split across shards; the
    boundary sample overshoots). Within a shard, members are written
    sorted by (``sample_key``, ``slot`` nulls-first); names over 100
    UTF-8 bytes get GNU longname headers (the parser's 'L' grammar).

    100 TB shape: the global cut needs a corpus-wide running sum of
    per-sample bytes, which must NOT sort the corpus through one
    window — it decomposes into the token_budget_sample two-level
    scan: range-partition samples by key, within-partition cumsum
    (one window per range), and a TINY per-range totals frame whose
    prefix sums come from a triangular self-join (O(P²) rows for P
    partitions — no single-partition window anywhere), broadcast back.
    Each shard is then written by one task: sorted members, streamed
    header+payload emission, write-time (offset, size) bookkeeping —
    identical arithmetic to the indexer, but emitted for free — plus
    an img2dataset-style ``.index.parquet`` SIDECAR per shard so a
    later reader never re-scans tar headers. Publication is TWO-PHASE
    everywhere (_WriteSink): local writes go through tmp + atomic
    rename, s3:// writes buffer and publish as ONE atomic put_object
    on success only (never a partial visible object; a retried task
    re-PUTs the same deterministic bytes).

    EXECUTOR-MEMORY SIZING RULE: each shard task materializes the
    whole shard twice — ``groupBy(__shard).applyInPandas`` hands the
    task one pandas frame holding every member's bytes
    (≈ target_shard_bytes + Arrow overhead), and the s3:// sink
    buffers the finished tar again in memory for the atomic PUT —
    so peak ≈ 2-2.5× ``target_shard_bytes`` PER CONCURRENT TASK. Size
    executors accordingly (the 1 GiB default needs ~2.5 GiB headroom
    per task slot). Shards over S3's 5 GB single-PUT limit publish as
    a MULTIPART upload with abort-on-failure (parts invisible until
    complete — the all-or-nothing contract holds; the buffer-twice
    memory rule above applies all the more, so multi-GB targets need
    executors sized for it).

    Returns the write-time index (INDEX_SCHEMA; ``shard`` = full
    path). LAZY: materializing the returned frame IS the write job —
    count it, sink it, or feed it onward (sidecars land beside each
    shard as its task completes)."""
    from pyspark.sql import Window

    from amadeus_spark.cache import tracked_persist

    # capture the publication caps ON THE DRIVER at plan-build time:
    # executor python workers re-import the module fresh, so module
    # globals there never see a driver-side override — the values ride
    # into the tasks through the UDF closure instead
    put_cap, mp_part = S3_SINGLE_PUT_CAP, S3_MULTIPART_PART_BYTES

    spark = members.sparkSession
    sized = members.select(
        "sample_key",
        "slot",
        "content",
        F.expr(
            _member_bytes_frag(
                "case when slot is null then sample_key "
                "else concat(sample_key, '.', slot) end",
                "octet_length(content)",
            )
        ).alias("__mb"),
    )
    n_ranges = max(2, spark.sparkContext.defaultParallelism)
    per_sample = (
        sized.groupBy("sample_key")
        .agg(F.sum("__mb").alias("__sb"))
        .repartitionByRange(n_ranges, "sample_key")
        .withColumn("__pid", F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("sample_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cumd = tracked_persist(
        per_sample.withColumn(
            "__cum_in", F.coalesce(F.sum("__sb").over(w_in), F.lit(0))
        )
    )
    totals = cumd.groupBy("__pid").agg(F.sum("__sb").alias("__pt"))
    # prefix sums of the per-range totals: a triangular self-join on a
    # frame of n_ranges rows — O(P²) pairs, never a single-partition
    # window (the plans-sweep contract)
    offs = (
        totals.alias("a")
        .join(
            F.broadcast(totals.alias("b")),
            F.col("b.__pid") < F.col("a.__pid"),
            "left",
        )
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__pt"), F.lit(0)).alias("__off"))
    )
    assign = (
        cumd.join(F.broadcast(offs), "__pid")
        .select(
            "sample_key",
            # integer `div`, NOT float /: the layout contract (and the
            # golden expected_written_index replay) is exact floor
            # division, and at very large cumulative byte counts a
            # correctly-rounded double quotient landing on an integer
            # can truncate to the wrong shard.
            F.expr(
                f"(__off + __cum_in) div {int(target_shard_bytes)}L"
            ).alias("__shard"),
        )
    )

    out_root = out_dir.rstrip("/")

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["__shard"].iloc[0])
        path = _sub_path(out_root, f"{prefix}-{shard_id:05d}.tar")
        pdf = pdf.sort_values(
            ["sample_key", "slot"], na_position="first", kind="mergesort"
        )
        rows = []
        pos = 0
        sink = _WriteSink(path, put_cap, mp_part)
        try:
            for r in pdf.itertuples(index=False):
                name = member_name(r.sample_key, r.slot)
                data = bytes(r.content)
                blob = _member_blocks(name, data)
                sink.write(blob)
                # index (key, slot) re-derived from the NAME so the
                # write-time index is byte-equal to a later re-index:
                # a slotless metadata member reads back key=None
                key, slot = split_sample_key(name)
                # payload starts after every header block of this member
                rows.append(
                    (
                        path,
                        name,
                        key,
                        slot,
                        pos + (len(blob) - (len(data) + (-len(data)) % BLOCK)),
                        len(data),
                    )
                )
                pos += len(blob)
            sink.write(b"\x00" * (2 * BLOCK))
        finally:
            sink.close()
        sink.publish()
        idx = pd.DataFrame(
            rows,
            columns=["shard", "member", "sample_key", "slot", "offset", "size"],
        )
        # img2dataset-style sidecar: the write-time index, durable next
        # to the shard, so later readers skip the tar-header scan.
        # EXPLICIT arrow schema: a shard of only slotless members has
        # an all-null sample_key column, which from_pandas would type
        # as null (physical INT32 in parquet) — unreadable as string
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_schema = pa.schema(
            [
                ("shard", pa.string()),
                ("member", pa.string()),
                ("sample_key", pa.string()),
                ("slot", pa.string()),
                ("offset", pa.int64()),
                ("size", pa.int64()),
            ]
        )
        buf = io.BytesIO()
        pq.write_table(
            pa.Table.from_pandas(
                idx, schema=arrow_schema, preserve_index=False
            ),
            buf,
        )
        # same driver-captured caps as the shard sink (closure-capture
        # contract): a cap override must govern index publication too,
        # even though index files are tiny at real sizes
        side = _WriteSink(
            _sub_path(out_root, f"{prefix}-{shard_id:05d}.index.parquet"),
            put_cap,
            mp_part,
        )
        try:
            side.write(buf.getvalue())
        finally:
            side.close()
        side.publish()
        return idx

    return (
        sized.drop("__mb")
        .join(assign, "sample_key")
        .groupBy("__shard")
        .applyInPandas(_write_group, INDEX_SCHEMA)
    )


# ------------------------------------------------------------ parser


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    return int(s, 8) if s else 0


def _pax_path(data: bytes) -> str | None:
    """Extract the ``path=`` record from a pax extended header body
    (records are ``"<len> <key>=<value>\\n"``)."""
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp == -1:
            return None
        try:
            rec_len = int(data[pos:sp])
        except ValueError:
            return None
        rec = data[sp + 1 : pos + rec_len]
        if rec.startswith(b"path="):
            return rec[5:].rstrip(b"\n").decode("utf-8")
        if rec_len <= 0:
            return None
        pos += rec_len
    return None


def iter_tar_members(stream) -> Iterator[dict]:
    """Walk a tar stream's headers, yielding one dict per REGULAR
    member: ``{"member", "offset", "size"}`` with ``offset`` the
    payload's absolute byte position — the ranged-read plan. Payloads
    are seeked past when the stream allows (plain .tar over a file or
    object store) and read-discarded otherwise (gzip). Stops at the
    end-of-archive zero block or EOF; a truncated final header raises
    ValueError (a silently short index would drop tail samples)."""
    can_seek = hasattr(stream, "seek")
    pos = 0
    pending_name: str | None = None

    def _skip(n: int) -> None:
        nonlocal pos
        if can_seek:
            stream.seek(n, 1)
        else:
            left = n
            while left > 0:
                got = stream.read(min(left, 1 << 20))
                if not got:
                    raise ValueError("truncated tar payload")
                left -= len(got)
        pos += n

    while True:
        hdr = stream.read(BLOCK)
        if not hdr:
            return
        if len(hdr) != BLOCK:
            raise ValueError("truncated tar header")
        if hdr == b"\x00" * BLOCK:
            return
        pos += BLOCK
        size = _octal(hdr[124:136])
        typeflag = bytes(hdr[156:157])
        padded = size + ((-size) % BLOCK)
        if typeflag == b"L":  # GNU longname: payload is the next name
            data = stream.read(padded)
            if len(data) != padded:
                raise ValueError("truncated longname payload")
            pos += padded
            pending_name = data[:size].rstrip(b"\x00").decode("utf-8")
            continue
        if typeflag in (b"x", b"g"):  # pax headers: honor path override
            data = stream.read(padded)
            if len(data) != padded:
                raise ValueError("truncated pax payload")
            pos += padded
            if typeflag == b"x":
                p = _pax_path(data[:size])
                if p is not None:
                    pending_name = p
            continue
        if pending_name is not None:
            name, pending_name = pending_name, None
        else:
            name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
            prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8")
            if prefix:
                name = f"{prefix}/{name}"
        data_off = pos
        if typeflag in (b"0", b"\x00"):
            yield {"member": name, "offset": data_off, "size": size}
        _skip(padded)


def split_sample_key(member: str) -> tuple[str | None, str | None]:
    """WebDataset sample grouping: the basename up to its FIRST dot is
    the sample key, the rest is the slot ('jpg', 'seg.png', ...).
    Members without a dot have no slot and join no sample."""
    base = posixpath.basename(member)
    if "." not in base:
        return None, None
    key, slot = base.split(".", 1)
    d = posixpath.dirname(member)
    return (f"{d}/{key}" if d else key), slot


def _open_random(path: str):
    """Executor-side RANDOM-ACCESS open: local files via builtin open,
    object stores via pyarrow ``open_input_file`` (seekable; seeks
    become range GETs) — ``open_input_stream`` (the warc posture) is
    forward-only and raises on the header-hopping seeks."""
    if "://" not in path and not path.startswith("file:/"):
        return open(path, "rb")
    if path.startswith("file:"):
        local = path[len("file:"):]
        while local.startswith("//"):
            local = local[1:]
        return open(local, "rb")
    import pyarrow.fs as pafs

    fs, rel = pafs.FileSystem.from_uri(path)
    return fs.open_input_file(rel)


def _open_for_index(path: str):
    if path.endswith(".gz"):
        import gzip

        from amadeus_spark.sources.warc import _open_raw

        return gzip.GzipFile(fileobj=_open_raw(path))
    return _open_random(path)


def _index_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for shard in pdf["shard"]:
            rows = []
            stream = _open_for_index(shard)
            try:
                for m in iter_tar_members(stream):
                    key, slot = split_sample_key(m["member"])
                    rows.append(
                        (shard, m["member"], key, slot, m["offset"], m["size"])
                    )
            finally:
                stream.close()
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "member", "sample_key", "slot", "offset", "size"
                ],
            )


def read_webdataset_index(
    spark: SparkSession, paths: str | list[str]
) -> DataFrame:
    """Distributed shard index: one row per regular tar member with
    its payload byte range. One task per shard; repartition(len) so
    1000 shards fan out to 1000 tasks regardless of the default
    parallelism of a 2-row local relation."""
    from amadeus_spark.sources.warc import _expand_paths

    plist = _expand_paths(spark, paths)
    src = spark.createDataFrame(
        [(p,) for p in plist], "shard string"
    ).repartition(max(1, len(plist)))
    return src.mapInPandas(_index_map, INDEX_SCHEMA)


def read_index_sidecars(spark: SparkSession, shard_dir: str) -> DataFrame:
    """The sidecar FAST PATH: read the ``*.index.parquet`` files
    :func:`write_webdataset_shards` emits next to each shard, instead
    of re-scanning tar headers. Same rows and schema as
    :func:`read_webdataset_index` over the same shards (pinned by
    test) — but a plain parquet scan: at 100 TB the header re-scan is
    O(members) seeks PER SHARD across the whole corpus, while the
    sidecars are a few KB per shard and Spark's parquet reader gets
    column pruning and predicate pushdown on them for free (e.g.
    ``filter(slot = 'txt')`` before any fetch). Use the header scan
    for shards of unknown provenance; use this for shards this writer
    (or img2dataset) produced."""
    return (
        spark.read.schema(INDEX_SCHEMA)
        .option("pathGlobFilter", "*.index.parquet")
        .parquet(shard_dir)
    )


FETCH_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("member", T.StringType(), False),
        T.StructField("sample_key", T.StringType(), True),
        T.StructField("slot", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _fetch_map(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for shard, grp in pdf.groupby("shard", sort=False):
            rows = []
            # index offsets are DECOMPRESSED-stream positions: on a
            # .gz shard a raw seek lands in compressed bytes and
            # silently reads garbage — refuse up front
            if shard.endswith(".gz"):
                raise ValueError(
                    f"{shard}: ranged fetch needs a seekable "
                    "uncompressed shard — decompress .tar.gz first, "
                    "or re-shard plain .tar (the WebDataset norm)"
                )
            f = _open_random(shard)
            try:
                # ascending offsets: strictly forward seeks —
                # sequential I/O locally, coalescible range GETs on an
                # object store
                for r in grp.sort_values("offset").itertuples(index=False):
                    f.seek(r.offset)
                    data = f.read(r.size)
                    if len(data) != r.size:
                        raise ValueError(
                            f"{shard}:{r.member}: short read "
                            f"({len(data)} of {r.size} bytes)"
                        )
                    rows.append(
                        (shard, r.member, r.sample_key, r.slot, r.size, data)
                    )
            finally:
                f.close()
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "member", "sample_key", "slot", "size", "content"
                ],
            )


def fetch_members(index: DataFrame, n_tasks: int | None = None) -> DataFrame:
    """Materialize the planned byte windows: seek+read each member's
    payload (the ranged-read primitive the index exists to feed —
    decoders and feature extractors hang off ``content``). Rows are
    repartitioned BY SHARD so each task opens a shard at most once and
    reads it forward. Default task count is the session's
    defaultParallelism: with more shards than that (or hash
    collisions) several shards COLOCATE in one task — still one
    open + forward read per shard, just serialized. For a full
    one-task-per-shard fan-out pass ``n_tasks=<shard count>`` (the
    caller that built the index knows it; deriving it here would
    re-execute the index's tar-header scan for a count)."""
    parts = n_tasks or index.sparkSession.sparkContext.defaultParallelism
    return index.repartition(parts, "shard").mapInPandas(
        _fetch_map, FETCH_SCHEMA
    )


def sample_plans(index: DataFrame) -> DataFrame:
    """Roll the member index up into WebDataset SAMPLES: one row per
    (shard, sample_key) with the slot → byte-range list a decoder
    fetches in one ranged read per slot. sort_array makes the slot
    order deterministic; members outside any sample (no dot in the
    basename) are dropped — they are shard metadata, not training
    rows."""
    return (
        index.filter(F.col("sample_key").isNotNull())
        .groupBy("shard", "sample_key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("slot", "offset", "size"))
            ).alias("slots"),
            F.count(F.lit(1)).alias("n_slots"),
            F.sum("size").alias("sample_bytes"),
        )
    )
