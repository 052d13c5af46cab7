"""WebDataset tar-shard source: golden-fixture drift pin, stdlib-
tarfile parity (independent oracle), long-name extensions, the
distributed index path, sample grouping, and the corrupt-stream
contract."""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pytest

from amadeus_spark.sources import wds_golden as G
from amadeus_spark.sources.webdataset import (
    build_tar,
    iter_tar_members,
    read_webdataset_index,
    sample_plans,
    split_sample_key,
)


def test_fixture_bytes_pinned_to_builder():
    """The committed shards must be exactly build_tar(GOLDEN) — any
    drift in layout constants, writer, or committed bytes fails."""
    for shard in G.GOLDEN:
        with open(os.path.join(G.fixture_dir(), shard), "rb") as f:
            assert f.read() == build_tar(G.members(shard)), shard


def test_parser_matches_stdlib_tarfile():
    for shard in G.GOLDEN:
        raw = build_tar(G.members(shard))
        std = [
            (m.name, m.offset_data, m.size)
            for m in tarfile.open(fileobj=io.BytesIO(raw)).getmembers()
        ]
        ours = [
            (m["member"], m["offset"], m["size"])
            for m in iter_tar_members(io.BytesIO(raw))
        ]
        assert std == ours


@pytest.mark.parametrize("fmt", [tarfile.GNU_FORMAT, tarfile.PAX_FORMAT])
def test_long_names_gnu_and_pax(fmt):
    """Real shards carry >100-char paths via GNU 'L' members or pax
    'x' headers — both must resolve to the true member name."""
    buf = io.BytesIO()
    long_name = "deep/" + "x" * 120 + "/000009.jpg"
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as w:
        info = tarfile.TarInfo(long_name)
        data = b"abc" * 100
        info.size = len(data)
        w.addfile(info, io.BytesIO(data))
    buf.seek(0)
    ms = list(iter_tar_members(buf))
    assert [(m["member"], m["size"]) for m in ms] == [(long_name, 300)]


def test_sample_key_grammar():
    assert split_sample_key("000123.jpg") == ("000123", "jpg")
    assert split_sample_key("a/b/000123.seg.png") == ("a/b/000123", "seg.png")
    assert split_sample_key("METADATA") == (None, None)


def test_truncated_header_raises():
    raw = build_tar(G.members("golden-000.tar"))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tar_members(io.BytesIO(raw[: len(raw) - 1536 - 200])))


def test_distributed_index_matches_expected(spark):
    paths = [os.path.join(G.fixture_dir(), s) for s in G.GOLDEN]
    idx = read_webdataset_index(spark, paths)
    got = sorted(
        (os.path.basename(r["shard"]), r["member"], r["sample_key"],
         r["slot"], r["offset"], r["size"])
        for r in idx.collect()
    )
    assert got == sorted(G.expected_index())


def test_gzip_shard_read_discard_path(spark, tmp_path):
    """.tar.gz shards go through the read-discard skip (no seek on
    gzip) and must index identically."""
    shard = "golden-000.tar"
    gz = tmp_path / (shard + ".gz")
    gz.write_bytes(gzip.compress(build_tar(G.members(shard))))
    got = sorted(
        (r["member"], r["offset"], r["size"])
        for r in read_webdataset_index(spark, str(gz)).collect()
    )
    exp = sorted(
        (m, o, sz)
        for s, m, _, _, o, sz in G.expected_index()
        if s == shard
    )
    assert got == exp


def test_sample_plans_groups_and_drops_slotless(spark):
    paths = [os.path.join(G.fixture_dir(), s) for s in G.GOLDEN]
    plans = sample_plans(read_webdataset_index(spark, paths)).collect()
    by_key = {r["sample_key"]: r for r in plans}
    # METADATA (slotless) joined no sample
    assert set(by_key) == {f"{i:06d}" for i in range(5)}
    s1 = by_key["000001"]
    assert s1["n_slots"] == 3
    assert [s["slot"] for s in s1["slots"]] == ["jpg", "seg.png", "txt"]
    assert s1["sample_bytes"] == 512 + 0 + 77
    # byte ranges in each plan match the flat index
    s4 = by_key["000004"]
    assert s4["sample_bytes"] == 2048 + 13 + 257


def test_fetch_members_round_trips_payloads(spark):
    from amadeus_spark.sources.webdataset import (
        fetch_members,
        read_webdataset_index,
    )

    paths = [os.path.join(G.fixture_dir(), s) for s in G.GOLDEN]
    fetched = fetch_members(read_webdataset_index(spark, paths)).collect()
    exp = {
        (s, n): G.payload(s, n, sz)
        for s in G.GOLDEN
        for n, sz in G.GOLDEN[s]
    }
    assert len(fetched) == len(exp)
    for r in fetched:
        shard = os.path.basename(r["shard"])
        assert bytes(r["content"]) == exp[(shard, r["member"])], r["member"]


def test_fetch_refuses_gzip(spark, tmp_path):
    from amadeus_spark.sources.webdataset import (
        fetch_members,
        read_webdataset_index,
    )

    shard = "golden-000.tar"
    gz = tmp_path / (shard + ".gz")
    gz.write_bytes(gzip.compress(build_tar(G.members(shard))))
    idx = read_webdataset_index(spark, str(gz))
    with pytest.raises(Exception, match="seekable"):
        fetch_members(idx).collect()


def test_tar_shard_to_real_jpeg_decode_end_to_end(spark, tmp_path):
    """The full multimodal ingest loop across three subsystems: a REAL
    baseline JPEG (our encoder) packed into a tar shard, indexed,
    range-fetched, and decoded by the real JPEG codec through the
    distributed feature extractor — fetched bytes must decode to the
    same features as the original payload, and the caption slot must
    round-trip as text."""
    import numpy as np

    from amadeus_spark.functions.jpeg import encode_jpeg
    from amadeus_spark.functions.multimodal import (
        decode_image,
        extract_features,
    )
    from amadeus_spark.sources.webdataset import (
        build_tar,
        fetch_members,
        read_webdataset_index,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, (24, 32, 3))).astype("uint8")
    jpg = encode_jpeg(img, quality=90)
    caption = "a synthetic test image\n"
    shard = tmp_path / "shard-000.tar"
    shard.write_bytes(
        build_tar([("000000.jpg", jpg), ("000000.txt", caption.encode())])
    )
    fetched = fetch_members(read_webdataset_index(spark, str(shard)))
    # caption slot round-trips as text
    txt = fetched.filter("slot = 'txt'").collect()[0]
    assert bytes(txt["content"]).decode() == caption
    # jpg slot decodes FOR REAL through the distributed extractor
    media = fetched.filter("slot = 'jpg'").select(
        F.lit(0).alias("media_id"), F.col("content").alias("payload")
    )
    row = extract_features(media, fake=False).collect()[0]
    assert row["feature"] == decode_image(jpg)
    assert row["n_bytes"] == len(jpg)


# ------------------------------------------------------------- writer


def _writer_df(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(sample_key=k, slot=s, content=bytearray(c))
            for k, s, c in G.writer_members()
        ],
        "sample_key string, slot string, content binary",
    )


def test_write_shards_round_trip(spark, tmp_path):
    """write_webdataset_shards → read_webdataset_index round trip:
    the write-time index is byte-equal to a later re-index (incl. the
    slotless metadata member reading back key=None), every payload
    survives, and the per-shard .index.parquet sidecars carry the same
    rows."""
    import glob

    import duckdb

    from amadeus_spark.sources.webdataset import (
        fetch_members,
        write_webdataset_shards,
    )

    out = str(tmp_path / "wds")
    written = write_webdataset_shards(
        _writer_df(spark), out, target_shard_bytes=G.WRITE_TARGET
    ).collect()
    shards = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert len(shards) > 1  # the cut actually split the corpus
    idx = read_webdataset_index(spark, shards)
    a = sorted(tuple(r) for r in written)
    b = sorted(tuple(r) for r in idx.collect())
    assert a == b
    fetched = {
        r["member"]: bytes(r["content"]) for r in fetch_members(idx).collect()
    }
    orig = {n: d for s in G.GOLDEN for n, d in G.members(s)}
    assert fetched == orig
    side = duckdb.sql(
        f"SELECT member, \"offset\", size FROM "
        f"read_parquet('{out}/*.index.parquet') ORDER BY member, \"offset\""
    ).fetchall()
    assert side == sorted((r["member"], r["offset"], r["size"]) for r in written)


def test_written_layout_matches_sequential_replay(spark, tmp_path):
    """The distributed layout (two-level cumsum cut + per-task write)
    equals wds_golden.expected_written_index's SEQUENTIAL replay — the
    same independence discipline as expected_index vs the parser."""
    import glob

    from amadeus_spark.sources.webdataset import write_webdataset_shards

    out = str(tmp_path / "wds")
    written = write_webdataset_shards(
        _writer_df(spark), out, target_shard_bytes=G.WRITE_TARGET
    ).collect()
    got = sorted(
        (os.path.basename(r["shard"]), r["member"], r["sample_key"],
         r["slot"], r["offset"], r["size"])
        for r in written
    )
    assert got == sorted(G.expected_written_index())


def test_written_shards_parse_with_stdlib(spark, tmp_path):
    """Independent oracle: stdlib tarfile fully parses the written
    shards and agrees on (name, payload offset, size) — incl. GNU
    longname members for >100-byte names."""
    import glob

    from pyspark.sql import Row

    from amadeus_spark.sources.webdataset import write_webdataset_shards

    long_key = "deep/" + "y" * 130
    df = _writer_df(spark).unionByName(
        spark.createDataFrame(
            [Row(sample_key=long_key, slot="jpg", content=bytearray(b"zz"))],
            "sample_key string, slot string, content binary",
        )
    )
    out = str(tmp_path / "wds")
    written = write_webdataset_shards(
        df, out, target_shard_bytes=G.WRITE_TARGET
    ).collect()
    std = []
    for shard in sorted(glob.glob(os.path.join(out, "*.tar"))):
        with tarfile.open(shard) as tf:
            std += [
                (os.path.basename(shard), m.name, m.offset_data, m.size)
                for m in tf.getmembers()
            ]
    ours = sorted(
        (os.path.basename(r["shard"]), r["member"], r["offset"], r["size"])
        for r in written
    )
    assert sorted(std) == ours
    assert any(n == f"{long_key}.jpg" for _, n, _, _ in std)


def test_writer_cut_is_partitioning_invariant(spark, tmp_path):
    """The shard assignment is a function of the DATA (global key
    order + byte arithmetic), not of the input's physical layout:
    1-partition and 7-partition inputs produce identical indexes."""
    from amadeus_spark.sources.webdataset import write_webdataset_shards

    outs = []
    for i, parts in enumerate((1, 7)):
        out = str(tmp_path / f"wds{i}")
        written = write_webdataset_shards(
            _writer_df(spark).repartition(parts),
            out,
            target_shard_bytes=G.WRITE_TARGET,
        ).collect()
        outs.append(
            sorted(
                (os.path.basename(r["shard"]), r["member"], r["offset"],
                 r["size"])
                for r in written
            )
        )
    assert outs[0] == outs[1]


def test_member_bytes_frag_matches_python(spark):
    """The Spark SQL footprint fragment (_member_bytes_frag — what the
    distributed shard cut sums) equals the Python arithmetic both the
    writer's emission (len(_member_blocks)) and the gate replay
    (wds_golden._tar_member_bytes) use — incl. multibyte names around
    the 100-BYTE longname threshold (octet_length, not char length)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from amadeus_spark.sources.webdataset import (
        _member_blocks,
        _member_bytes_frag,
    )

    cases = [
        ("a.jpg", 0),
        ("a.jpg", 1),
        ("a.jpg", 511),
        ("a.jpg", 512),
        ("a.jpg", 513),
        ("x" * 100 + ".txt", 7),          # name > 100 bytes: longname
        ("x" * 96 + ".txt", 7),           # exactly 100: plain header
        ("é" * 51 + ".txt", 3),           # 102 UTF-8 bytes, 55 chars
        ("中" * 33 + ".json", 1025),       # 99 bytes + slot > 100
        ("x" * 300 + ".bin", 64),         # longname needs 2 payload blocks
    ]
    df = spark.createDataFrame(
        [Row(name=n, size=s) for n, s in cases], "name string, size long"
    )
    got = [
        r["b"]
        for r in df.select(
            F.expr(_member_bytes_frag("name", "size")).alias("b")
        ).collect()
    ]
    want = [len(_member_blocks(n, b"\x00" * s)) for n, s in cases]
    assert got == want


def test_index_sidecars_match_header_scan(spark, tmp_path):
    """The sidecar fast path (read_index_sidecars — a plain parquet
    scan with pruning/pushdown) returns exactly the header re-scan's
    rows over the same written shards, and feeds fetch_members
    directly."""
    import glob

    from amadeus_spark.sources.webdataset import (
        fetch_members,
        read_index_sidecars,
        write_webdataset_shards,
    )

    out = str(tmp_path / "wds")
    write_webdataset_shards(
        _writer_df(spark), out, target_shard_bytes=G.WRITE_TARGET
    ).count()
    side = read_index_sidecars(spark, out)
    scan = read_webdataset_index(
        spark, sorted(glob.glob(os.path.join(out, "*.tar")))
    )
    def rows(df):
        return sorted(
            tuple(str(v) for v in r) for r in df.collect()
        )

    assert rows(side) == rows(scan)
    # the sidecar index drives ranged fetches just like the scan index
    got = fetch_members(side.filter("slot = 'txt'")).collect()
    orig = {n: d for s in G.GOLDEN for n, d in G.members(s)}
    assert {r["member"]: bytes(r["content"]) for r in got} == {
        n: d for n, d in orig.items() if n.endswith(".txt")
    }


def test_writer_edge_semantics(spark, tmp_path):
    """Edges pinned: an EMPTY corpus writes zero shards and returns an
    empty index (no phantom files); duplicate (sample_key, slot) rows
    are both written (tar permits duplicate names) and both index rows
    round-trip with distinct offsets."""
    import glob

    from pyspark.sql import Row

    from amadeus_spark.sources.webdataset import (
        fetch_members,
        read_webdataset_index,
        write_webdataset_shards,
    )

    empty = spark.createDataFrame(
        [], "sample_key string, slot string, content binary"
    )
    out0 = str(tmp_path / "empty")
    assert write_webdataset_shards(empty, out0).collect() == []
    assert glob.glob(os.path.join(out0, "*")) == []

    dup = spark.createDataFrame(
        [
            Row(sample_key="k", slot="jpg", content=bytearray(b"one")),
            Row(sample_key="k", slot="jpg", content=bytearray(b"two")),
        ],
        "sample_key string, slot string, content binary",
    )
    out1 = str(tmp_path / "dup")
    written = write_webdataset_shards(dup, out1).collect()
    assert [r["member"] for r in written] == ["k.jpg", "k.jpg"]
    assert len({r["offset"] for r in written}) == 2
    idx = read_webdataset_index(
        spark, sorted(glob.glob(os.path.join(out1, "*.tar")))
    )
    fetched = sorted(
        bytes(r["content"]) for r in fetch_members(idx).collect()
    )
    assert fetched == [b"one", b"two"]


def test_writer_accepts_targets_over_s3_single_put_cap(spark):
    """Targets above S3's 5 GB single-PUT cap are ACCEPTED: oversized
    shards publish via multipart-with-abort (parts invisible until
    complete), so plan building must not raise for any root."""
    from pyspark.sql import Row

    from amadeus_spark.sources.webdataset import (
        S3_SINGLE_PUT_CAP,
        write_webdataset_shards,
    )

    df = spark.createDataFrame(
        [Row(sample_key="a", slot="txt", content=bytearray(b"x"))],
        "sample_key string, slot string, content binary",
    )
    # lazy — just building the plan must not raise on either root
    write_webdataset_shards(
        df, "s3://bucket/prefix", target_shard_bytes=S3_SINGLE_PUT_CAP + 1
    )
    write_webdataset_shards(
        df, "/tmp/never-materialized", target_shard_bytes=S3_SINGLE_PUT_CAP + 1
    )
