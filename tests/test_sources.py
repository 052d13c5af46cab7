"""Source/sink tests following the reference's parity discipline
(SURVEY §5): typed and dynamic reads agree; projection reaches the scan;
round-trips preserve row counts."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from amadeus_spark.functions import multimodal
from amadeus_spark.sources import cloudfront, readers, warc
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tmpdir_data(tmp_path_factory):
    return str(tmp_path_factory.mktemp("sources"))


def test_csv_typed_dynamic_parity(spark, tmpdir_data):
    """Reference invariant (tests/csv.rs:45-59): static and dynamic reads
    of the same file agree."""
    src = spark.read.parquet(os.path.join(SF_SMOKE, "nation.parquet"))
    path = os.path.join(tmpdir_data, "nation_csv")
    readers.write_csv(src, path)

    typed = readers.read_csv(
        spark,
        path,
        schema=readers.schema_from_amadeus(
            [("n_nationkey", "i32", False), ("n_name", "string", False), ("n_regionkey", "i32", False)]
        ),
    )
    dynamic = readers.read_csv(spark, path)  # header=False → _c0.._c2
    assert typed.count() == dynamic.count() == src.count()
    t = {(r.n_nationkey, r.n_name) for r in typed.collect()}
    d = {(r._c0, r._c1) for r in dynamic.collect()}
    assert t == d


def test_json_roundtrip(spark, tmpdir_data):
    src = spark.read.parquet(os.path.join(SF_SMOKE, "region.parquet"))
    path = os.path.join(tmpdir_data, "region_json")
    readers.write_json(src, path)
    back = readers.read_json(spark, path)
    assert back.count() == src.count()
    assert {r.r_name for r in back.collect()} == {r.r_name for r in src.collect()}


def test_parquet_projection_pushdown(spark):
    """Reference: projection-at-parse (record/predicates.rs, tested at
    tests/parquet.rs:167-199). Spark: column pruning must reach the scan —
    ReadSchema contains only selected columns."""
    df = readers.read_parquet(
        spark, os.path.join(SF_SMOKE, "lineitem.parquet"), columns=["l_orderkey", "l_quantity"]
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    assert "l_orderkey" in scan[0] and "l_quantity" in scan[0]
    assert "l_extendedprice" not in scan[0]


def test_filter_pushdown(spark):
    df = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet")).filter(
        F.col("l_quantity") > 30
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan, plan


CLOUDFRONT_SAMPLE = """#Version: 1.0
#Fields: date time x-edge-location sc-bytes c-ip cs-method cs(Host) cs-uri-stem sc-status cs(Referer) cs(User-Agent) cs-uri-query cs(Cookie) x-edge-result-type x-edge-request-id x-host-header cs-protocol cs-bytes time-taken x-forwarded-for ssl-protocol ssl-cipher x-edge-response-result-type cs-protocol-version fle-status fle-encrypted-fields
2019-12-04\t21:02:31\tLAX1\t392\t192.0.2.100\tGET\td111111abcdef8.cloudfront.net\t/index.html\t200\t-\tMozilla/5.0\t-\t-\tHit\tSOX4xwn4XV6Q4rgb7XiVGOHms_BGlTAC4KyHmureZmBNrjGdRLiNIQ==\td111111abcdef8.cloudfront.net\thttps\t23\t0.001\t-\tTLSv1.2\tECDHE-RSA-AES128-GCM-SHA256\tHit\tHTTP/2.0\t-\t-
2019-12-04\t21:02:39\tLAX1\t392\t192.0.2.200\tGET\td111111abcdef8.cloudfront.net\t/index.html\t200\t-\tcurl/7.1\t-\t-\tHit\tk6WGMNkEzR5BEM_SaF47gjtX9zBDO2m349OY2an0QPEaUum1ZOLrow==\td111111abcdef8.cloudfront.net\thttps\t23\t0.000\t-\tTLSv1.2\tECDHE-RSA-AES128-GCM-SHA256\tHit\tHTTP/2.0\t-\t-
"""


def test_cloudfront_parse(spark, tmpdir_data):
    """Reference: cloudfront.rs:62-110 + examples/cloudfront_logs.rs."""
    p = os.path.join(tmpdir_data, "cf")
    os.makedirs(p, exist_ok=True)
    with gzip.open(os.path.join(p, "E1.2019-12-04.gz"), "wt") as f:
        f.write(CLOUDFRONT_SAMPLE)
    df = cloudfront.read_cloudfront(spark, p)
    rows = df.collect()
    assert len(rows) == 2  # comment lines dropped
    r = {x.remote_ip: x for x in rows}
    assert r["192.0.2.100"].response_bytes == 392
    assert r["192.0.2.100"].referer is None  # '-' → NULL
    assert r["192.0.2.100"].url == "https://d111111abcdef8.cloudfront.net/index.html"
    assert r["192.0.2.100"].time.hour == 21
    hist = cloudfront.hourly_histogram(df).collect()
    assert hist[0].requests == 2


def _make_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    out = b""
    for url, ip, body in records:
        headers = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-IP-Address: {ip}\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode()
        out += headers + body + b"\r\n\r\n"
    return out


def test_warc_parse(spark, tmpdir_data):
    """Reference: amadeus-commoncrawl parser.rs → Webpage{ip,url,contents}."""
    p = os.path.join(tmpdir_data, "warc")
    os.makedirs(p, exist_ok=True)
    payload = _make_warc(
        [
            ("http://example.com/", "93.184.216.34", b"<html>hello</html>"),
            ("http://example.org/x", "93.184.216.35", b"body two \r\n with newlines"),
        ]
    )
    with open(os.path.join(p, "test.warc"), "wb") as f:
        f.write(payload)
    with open(os.path.join(p, "test2.warc.gz"), "wb") as f:
        f.write(gzip.compress(payload))
    df = warc.read_warc(spark, p)
    rows = df.collect()
    assert len(rows) == 4  # 2 records × 2 files
    by_url = sorted(rows, key=lambda r: (r.url, len(r.contents)))
    assert by_url[0].url == "http://example.com/"
    assert bytes(by_url[0].contents) == b"<html>hello</html>"
    assert by_url[0].ip == "93.184.216.34"


def test_multimodal_features(spark):
    media = multimodal.make_fake_media(spark, 32)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 32
    f0 = next(x for x in feats if x.media_id == 0)
    assert len(f0.feature) == 8 and f0.n_bytes > 0
    # deterministic across runs
    feats2 = multimodal.extract_features(multimodal.make_fake_media(spark, 32), fake=True).collect()
    assert {x.media_id: x.sha256 for x in feats} == {x.media_id: x.sha256 for x in feats2}


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"abc", fake=False)


def test_codec_roundtrips():
    """Pure-kernel checks for the no-dependency codecs: PPM and RAWV
    roundtrip bit-exact, WAV roundtrips within int16 quantization,
    nearest-neighbor resize hits exact source pixels."""
    import numpy as np

    img = np.random.default_rng(7).integers(0, 256, (9, 5, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    # header comments per the netpbm grammar are skipped
    with_comment = b"P6\n# a comment\n5 9\n255\n" + img.tobytes()
    assert (multimodal.decode_ppm(with_comment) == img).all()

    tone = (np.sin(np.arange(400) * 0.1) * 12000).astype(np.int16)
    x, sr = multimodal.decode_wav(multimodal.encode_wav(tone, 8000))
    assert sr == 8000 and len(x) == 400
    assert abs(x[10] - tone[10] / 32768.0) < 1e-6

    frames = [np.full((3, 4, 3), 17 * i, dtype=np.uint8) for i in range(5)]
    rv = multimodal.encode_rawv(frames)
    for i in (0, 2, 4):
        assert (multimodal.decode_rawv_frame(rv, i) == frames[i]).all()
    with pytest.raises(IndexError):
        multimodal.decode_rawv_frame(rv, 5)

    r = multimodal.resize_nearest(img, 3, 2)
    assert r.shape == (3, 2, 3) and r[0, 0].tolist() == img[0, 0].tolist()


def test_real_media_extract_features(spark):
    """The decode kernels execute for REAL (no fake fallback) over the
    distributed mapInPandas path; image features carry true dimensions."""
    media = multimodal.make_real_media(spark, 24)
    feats = {r.media_id: r for r in multimodal.extract_features(media, fake=False).collect()}
    assert len(feats) == 24
    for r in media.select("media_id", "kind", "meta").collect():
        f = feats[r.media_id].feature
        assert len(f) == 8
        if r.kind == "image":  # feature[0:2] = true h, w from the PPM header
            assert (f[0], f[1]) == (float(r.meta["h"]), float(r.meta["w"]))
        elif r.kind == "audio":  # feature[1] = sample rate from RIFF header
            assert f[1] == float(r.meta["sr"])


def test_sample_frames_end_to_end(spark):
    """Frame sampling: metadata-only plan selects indices, only those
    frames decode; RAWV fill value (i + 13*f) % 256 shows up as the mean."""
    media = multimodal.make_real_media(spark, 12).filter(F.col("kind") == "video")
    out = multimodal.sample_frames(media, every_n=2).collect()
    metas = {r.media_id: int(r.meta["n_frames"]) for r in media.select("media_id", "meta").collect()}
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(metas)
    for mid, rows in by_media.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(0, metas[mid], 2))
        for r in rows:
            # constant-fill frame → channel means equal the fill value
            assert r.feature[2] == float((mid + 13 * r.frame_idx) % 256)


def test_frame_sample_plan(spark):
    media = multimodal.make_fake_media(spark, 9)
    plan = multimodal.frame_sample_plan(media, every_n=30).collect()
    vids = [r for r in plan if r.media_id == 2]  # n_frames=92 → 0,30,60,90
    assert [v.frame_idx for v in vids] == [0, 30, 60, 90]


def test_path_glob_partition_filter(spark, tmpdir_data):
    """Reference Directory::partitions_filter parity (file.rs:186-193):
    select partitions by path pattern at listing time."""
    src = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    path = os.path.join(tmpdir_data, "orders_glob")
    readers.write_parquet(src, path, partition_by=["o_orderstatus"])
    only_f = readers.read_parquet_filtered(spark, path, "*.parquet")
    assert only_f.count() == src.count()
    # basePath keeps the partition column while globbing one partition dir
    one = (
        spark.read.option("basePath", path)
        .parquet(os.path.join(path, "o_orderstatus=F"))
    )
    assert one.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_write_parquet_partitioned(spark, tmpdir_data):
    src = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    path = os.path.join(tmpdir_data, "orders_part")
    readers.write_parquet(src, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    # partition pruning: filtering on the partition col reads a subset dir
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert pruned.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_commoncrawl_manifest_expansion(spark, tmpdir_data):
    """Reference lib.rs:50-84: crawl id → warc.paths.gz manifest → one
    task per WARC file. Mocked with a file:// base; rows must equal the
    sum of per-file parses."""
    base = os.path.join(tmpdir_data, "ccmock")
    crawl = "CC-MAIN-TEST"
    seg = os.path.join(base, "crawl-data", crawl, "segments", "s1", "warc")
    os.makedirs(seg, exist_ok=True)
    f1 = _make_warc([("http://a.example/", "192.0.2.1", b"pageA")])
    f2 = _make_warc(
        [
            ("http://b.example/", "192.0.2.2", b"pageB"),
            ("http://c.example/", "192.0.2.3", b"pageC"),
        ]
    )
    rel1 = f"crawl-data/{crawl}/segments/s1/warc/f1.warc.gz"
    rel2 = f"crawl-data/{crawl}/segments/s1/warc/f2.warc.gz"
    with open(os.path.join(base, rel1), "wb") as f:
        f.write(gzip.compress(f1))
    with open(os.path.join(base, rel2), "wb") as f:
        f.write(gzip.compress(f2))
    manifest_dir = os.path.join(base, "crawl-data", crawl)
    with open(os.path.join(manifest_dir, "warc.paths.gz"), "wb") as f:
        f.write(gzip.compress(f"{rel1}\n{rel2}\n".encode()))

    paths = warc.crawl_manifest_paths(crawl, base_url=f"file://{base}")
    assert paths == [f"file://{base}/{rel1}", f"file://{base}/{rel2}"]
    df = warc.read_commoncrawl(spark, crawl, base_url=f"file://{base}")
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [
        "http://a.example/",
        "http://b.example/",
        "http://c.example/",
    ]
    assert bytes(rows[0].contents) == b"pageA"
    # limit caps the expansion (sampling a crawl before a full run)
    assert warc.read_commoncrawl(spark, crawl, f"file://{base}", limit=1).count() == 1


def test_s3a_scheme_routes_to_s3a_filesystem(spark):
    """Sandbox has no hadoop-aws jar, so an s3a:// read must fail BY
    REACHING the S3A filesystem class — proof the scheme routing and
    config surface are wired (reference amadeus-aws/src/file.rs)."""
    from amadeus_spark.session import s3_configs

    for k, v in s3_configs(region="us-east-1", anonymous=True).items():
        if k.startswith("spark.hadoop."):
            spark.conf.set(k, v)
    with pytest.raises(Exception) as ei:
        spark.read.parquet("s3a://commoncrawl/does-not-matter").collect()
    msg = str(ei.value)
    assert "s3a" in msg.lower() or "S3AFileSystem" in msg


def test_s3_configs_profiles():
    from amadeus_spark.session import s3_configs

    anon = s3_configs(anonymous=True)
    assert anon["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider"
    )
    assert anon["spark.hadoop.fs.s3a.committer.name"] == "magic"
    role = s3_configs(role_arn="arn:aws:iam::123:role/r")
    assert role["spark.hadoop.fs.s3a.assumed.role.arn"] == "arn:aws:iam::123:role/r"
    minio = s3_configs(endpoint="http://localhost:9000")
    assert minio["spark.hadoop.fs.s3a.path.style.access"] == "true"


def test_cloudfront_e2e_compressed_prefix(spark, tmpdir_data):
    """The reference's flagship shape (examples/cloudfront_logs.rs:31-45):
    list a log prefix of MANY rotated .gz files → gunzip → parse →
    hour-bucketed histogram — all one declarative plan (spark.read.text
    does listing + decompression; one task per .gz, like the reference's
    one-task-per-object)."""
    p = os.path.join(tmpdir_data, "cf_prefix")
    os.makedirs(p, exist_ok=True)
    n_files, rows_per_file = 6, 40
    for fi in range(n_files):
        lines = ["#Version: 1.0", "#Fields: date time ..."]
        for i in range(rows_per_file):
            hh = (fi * 3) % 24
            lines.append(
                f"2019-12-04\t{hh:02d}:{i % 60:02d}:{i % 60:02d}\tLAX{fi}\t{100 + i}\t"
                f"192.0.2.{i}\tGET\texample.cloudfront.net\t/p{i}\t200\t-\tUA\t-\t-\tHit\t"
                f"REQ{fi}_{i}==\texample.cloudfront.net\thttps\t23\t0.001\t-\tTLSv1.2\t"
                f"CIPHER\tHit\tHTTP/2.0\t-\t-"
            )
        with gzip.open(os.path.join(p, f"E{fi}.2019-12-04-{fi:02d}.gz"), "wt") as f:
            f.write("\n".join(lines) + "\n")
    df = cloudfront.read_cloudfront(spark, p)
    assert df.count() == n_files * rows_per_file  # comments dropped per file
    hist = {r.hour.hour: r.requests for r in cloudfront.hourly_histogram(df).collect()}
    # files 0..5 at hours 0,3,6,9,12,15 → 40 requests each
    assert hist == {h: rows_per_file for h in (0, 3, 6, 9, 12, 15)}
    # plan sanity: the parse is pure column exprs — no Python in the scan
    from amadeus_spark import plans

    plans.assert_no_python_udf(df)


def test_per_row_result_error_modes(spark, tmpdir_data):
    """Reference parity: amadeus sources yield Result per ROW (csv.rs:
    47-65, json.rs:18-40) — a bad row is an Err value, not a failed job.
    permissive ≈ Err carried alongside Ok rows, drop ≈ filter_map(ok),
    fail ≈ propagate first error."""
    from pyspark.sql import types as T

    path = os.path.join(tmpdir_data, "mixed.json")
    with open(path, "w") as f:
        f.write('{"k": 1, "s": "good"}\n')
        f.write("{not json at all\n")
        f.write('{"k": 3, "s": "also good"}\n')
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]
    )

    perm = readers.read_json(spark, path, schema=schema).collect()
    assert len(perm) == 3
    bad = [r for r in perm if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].k is None and "{not json" in bad[0]._corrupt_record
    assert {r.k for r in perm if r._corrupt_record is None} == {1, 3}

    dropped = readers.read_json(spark, path, schema=schema, errors="drop")
    assert {r.k for r in dropped.collect()} == {1, 3}

    with pytest.raises(Exception):
        readers.read_json(spark, path, schema=schema, errors="fail").collect()


def test_load_events_schema_adaptive(spark, tmpdir_data):
    """The driver's events.parquet ts encoding has changed between data
    drops (TIMESTAMP(NANOS) in round 1, timestamp[us] in round 2) and
    broke 7 queries + the bench once. Pin `tables.load_events` to
    normalize ALL plausible encodings — raw int64 nanos, parquet
    timestamp[us], parquet timestamp[ns] — to the same µs wall-clock."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from amadeus_spark.tables import load_events

    wall = [
        datetime.datetime(2024, 3, 1, 12, 0, 0, 123456),
        datetime.datetime(2024, 3, 2, 3, 30, 45, 999999),
    ]
    epoch = datetime.datetime(1970, 1, 1)
    nanos = [
        ((w - epoch).days * 86400 + (w - epoch).seconds) * 10**9
        + (w - epoch).microseconds * 1000
        for w in wall
    ]
    ids = [1, 2]

    cases = {
        "int64_nanos": pa.table({"event_id": pa.array(ids, pa.int64()), "ts": pa.array(nanos, pa.int64())}),
        "ts_us": pa.table({"event_id": pa.array(ids, pa.int64()), "ts": pa.array(wall, pa.timestamp("us"))}),
        "ts_ns": pa.table({"event_id": pa.array(ids, pa.int64()), "ts": pa.array(wall, pa.timestamp("ns"))}),
    }
    for name, tbl in cases.items():
        d = os.path.join(tmpdir_data, f"events_enc_{name}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        ev = load_events(spark, d)
        ts_type = dict(ev.dtypes)["ts"]
        assert ts_type.startswith("timestamp"), (name, ts_type)
        got = {r.event_id: r.ts.replace(tzinfo=None) for r in ev.collect()}
        assert got == dict(zip(ids, wall)), name


def test_png_codec_roundtrip_and_filters():
    """Pure-stdlib PNG codec: encode→decode identity (RGB + gray), PNG
    features ≡ PPM features for the same pixels, and decode of streams
    using every scanline filter type (hand-filtered, since our encoder
    only emits filter 0)."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (11, 9, 3), dtype=np.uint8)
    assert (multimodal.decode_png(multimodal.encode_png(img)) == img).all()
    gray = rng.randint(0, 256, (6, 13), dtype=np.uint8)
    assert (multimodal.decode_png(multimodal.encode_png(gray)) == gray).all()
    # feature parity with the PPM path on identical pixels
    assert multimodal.decode_image(multimodal.encode_png(img)) == multimodal.decode_image(
        multimodal.encode_ppm(img)
    )

    # hand-filter the raster with each filter type, then decode
    def filt(img, ftype):
        h, w, ch = img.shape
        stride = w * ch
        flat = img.reshape(h, stride).astype(np.int16)
        raw = b""
        prev = np.zeros(stride, dtype=np.int16)
        for y in range(h):
            cur = flat[y]
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
            if ftype == 1:
                enc = cur - left
            elif ftype == 2:
                enc = cur - prev
            elif ftype == 3:
                enc = cur - ((left + prev) >> 1)
            else:  # 4: Paeth
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
                enc = cur - pred
            raw += bytes([ftype]) + (enc & 0xFF).astype(np.uint8).tobytes()
            prev = cur
        def chunk(tag, body):
            return struct.pack(">I", len(body)) + tag + body + struct.pack(
                ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    for ftype in (1, 2, 3, 4):
        assert (multimodal.decode_png(filt(img, ftype)) == img).all(), ftype

    # RGBA alpha drop
    rgba = np.dstack([img, np.full((11, 9), 128, np.uint8)])
    h, w = 11, 9
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )
    rgba_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (multimodal.decode_png(rgba_png) == img).all()


def test_png_full_feature_matrix():
    """The PNG decode matrix beyond the 8-bit/sequential core: Adam7
    interlace (both encoders), 16-bit depth (high-byte narrowing),
    paletted color type 3 at 8/4/2-bit indices, and sub-byte grayscale
    with bit-replicated expansion — all pure-spec, no codec library."""
    import struct
    import zlib

    import numpy as np

    from amadeus_spark.functions import multimodal as mm

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (21, 34, 3)).astype(np.uint8)
    g = img[..., 0]
    assert np.array_equal(mm.decode_png(mm.encode_png(img, interlace=True)), img)
    assert np.array_equal(mm.decode_png(mm.encode_png(g, interlace=True)), g)

    img16 = (img.astype(np.uint16) << 8) | img.astype(np.uint16)
    assert np.array_equal(mm.decode_png(mm.encode_png(img16)), img)
    assert np.array_equal(mm.decode_png(mm.encode_png(img16, interlace=True)), img)

    pal = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    pal_big = np.repeat(np.repeat(pal, 9, axis=0), 7, axis=1)  # 18x14
    assert np.array_equal(mm.decode_png(mm.encode_png_paletted(pal_big)), pal_big)
    assert np.array_equal(
        mm.decode_png(mm.encode_png_paletted(pal_big, depth=2)), pal_big
    )
    assert np.array_equal(
        mm.decode_png(mm.encode_png_paletted(pal_big, interlace=True, depth=4)),
        pal_big,
    )

    g4 = (g >> 4).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", g4.shape[1], g4.shape[0], 4, 0, 0, 0, 0)
    png4 = (
        mm._PNG_MAGIC
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(
            b"IDAT", zlib.compress(mm._png_body(g4[:, :, None], 4, False))
        )
        + mm._png_chunk(b"IEND", b"")
    )
    exp = (g4.astype(np.uint16) * 255 // 15).astype(np.uint8)
    assert np.array_equal(mm.decode_png(png4), exp)


def test_orc_roundtrip_and_pushdown(spark, tmpdir_data):
    """ORC round-trip preserves rows; projection + filter reach the ORC
    scan (ReadSchema / PushedFilters) exactly like parquet."""
    src = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    path = os.path.join(tmpdir_data, "lineitem_orc")
    readers.write_orc(src, path)
    back = readers.read_orc(spark, path)
    assert back.count() == src.count()
    assert back.schema == src.schema

    pruned = readers.read_orc(spark, path, columns=["l_orderkey"]).filter(
        F.col("l_orderkey") > 100
    )
    from amadeus_spark import plans

    txt = plans.plan_text(pruned)
    rs = [ln for ln in txt.splitlines() if "ReadSchema" in ln]
    assert rs and "l_orderkey" in rs[0] and "l_extendedprice" not in rs[0]
    assert "PushedFilters" in txt and "GreaterThan(l_orderkey,100" in txt


def test_variant_typed_parity_and_heterogeneous_cells(spark):
    """Spark 4 VARIANT as the native mapping for dynamic Value cells
    (reference value.rs:148-153, mirroring the tests/json.rs:67-86
    typed<->dynamic discipline): extraction through the variant path
    must equal the typed get_json_object path on homogeneous data, and
    heterogeneous cells (different shapes per row — the Map<Value,Value>
    case the typed path can't model) must carry per-row shapes."""
    from amadeus_spark.sources.readers import variant_cells

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    v = variant_cells(ev, "props")
    both = v.select(
        F.get_json_object("props", "$.k").cast("bigint").alias("typed"),
        F.expr("try_variant_get(v, '$.k', 'bigint')").alias("dyn"),
    )
    assert both.filter("typed IS DISTINCT FROM dyn").count() == 0

    het = spark.createDataFrame(
        [
            (1, '{"k": 5}'),
            (2, '{"k": "text"}'),
            (3, '{"k": [1, 2]}'),
            (4, '{"other": true}'),
        ],
        "id long, j string",
    )
    hv = variant_cells(het, "j").selectExpr(
        "id",
        "try_variant_get(v, '$.k', 'bigint') AS k_int",
        "cast(try_variant_get(v, '$.k[0]', 'bigint') as bigint) AS k_arr0",
        "schema_of_variant(v) AS shape",
    )
    rows = {r.id: r for r in hv.collect()}
    assert rows[1].k_int == 5
    assert rows[2].k_int is None  # non-coercible string -> NULL, no error
    assert rows[3].k_arr0 == 1  # array leaf addressable by path
    assert rows[4].k_int is None
    assert len({r.shape for r in rows.values()}) == 4  # per-row shapes


def test_xml_roundtrip_and_dynamic_inference(spark, tmp_path):
    """XML sink -> source round-trip preserves rows (incl. entity
    escaping); dynamic mode infers types from the row elements the way
    the other sources' dynamic modes do."""
    from amadeus_spark.sources import readers

    df = spark.createDataFrame(
        [(1, "a & b", 2.5), (2, "<tag>", 0.5), (3, "plain", 7.0)],
        "id long, name string, score double",
    )
    out = str(tmp_path / "xmlout")
    readers.write_xml(df, out, row_tag="rec", root_tag="recs")
    back = readers.read_xml(spark, out, row_tag="rec")
    assert {tuple(r) for r in back.select("id", "name", "score").collect()} == {
        tuple(r) for r in df.collect()
    }
    # dynamic inference assigns numeric types without a schema
    kinds = dict(back.dtypes)
    assert kinds["id"] == "bigint" and kinds["score"] == "double"


def test_png_garbage_never_leaks_library_errors():
    """Corrupt PNG payloads surface as ValueError/NotImplementedError —
    the shared corrupt-stream contract of all the pure-Python codecs."""
    import random as _r

    import numpy as np

    from amadeus_spark.functions.multimodal import decode_png, encode_png

    rng = _r.Random(5)
    img = np.random.default_rng(2).integers(0, 256, (20, 20, 3), dtype=np.uint8)
    good = bytearray(encode_png(img))
    for t in range(200):
        raw = bytearray(good)
        for _ in range(rng.randint(1, 5)):
            raw[rng.randrange(8, len(raw))] = rng.randrange(256)
        try:
            decode_png(bytes(raw))
        except (ValueError, NotImplementedError):
            pass


def test_warc_stream_bounded_paging():
    """The parser must stream: records come out page-by-page with the
    buffer never holding more than one fill chunk + the current record.
    Pin it with a many-record stream and a tiny page size."""
    import io

    from amadeus_spark.sources import warc as w

    payload = _make_warc(
        [(f"http://ex.com/{i}", "1.2.3.4", b"x" * 100) for i in range(1000)]
    )

    class _CountingRaw:
        """read(n)-only source that records the largest single request —
        proves the parser never asks for the whole stream."""

        def __init__(self, data):
            self._b = io.BytesIO(data)
            self.max_req = 0

        def read(self, n):
            self.max_req = max(self.max_req, n)
            return self._b.read(n)

    raw = _CountingRaw(payload)
    pages = list(w._pages(w._record_stream(raw)))
    assert sum(len(p) for p in pages) == 1000
    assert len(pages) == (1000 + w._PAGE_RECORDS - 1) // w._PAGE_RECORDS
    assert all(len(p) <= w._PAGE_RECORDS for p in pages)
    assert raw.max_req <= (1 << 20)  # fill chunk, never the file size


def test_warc_read_glob_and_dir(spark, tmpdir_data):
    """_expand_paths: dir, glob, and explicit-list forms give the same
    rows; the plan distributes one path per task."""
    import gzip as _gz

    p = os.path.join(tmpdir_data, "warc_glob")
    os.makedirs(p, exist_ok=True)
    payload = _make_warc([("http://a/", "1.1.1.1", b"abc")])
    for i in range(3):
        with open(os.path.join(p, f"f{i}.warc.gz"), "wb") as f:
            f.write(_gz.compress(payload))
    by_dir = warc.read_warc(spark, p).count()
    by_glob = warc.read_warc(spark, p + "/f*.warc.gz").count()
    by_list = warc.read_warc(
        spark, [os.path.join(p, f"f{i}.warc.gz") for i in range(3)]
    ).count()
    assert by_dir == by_glob == by_list == 3
