"""End-to-end Postgres COPY-source test against a real local server
(reference parity: tests/postgres.rs reads typed rows from a live
Postgres; here we initdb a throwaway cluster, load orders from parquet,
and read it back through the distributed COPY source)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amadeus_spark.sources.postgres_copy import read_postgres_copy
from tests.conftest import SF_SMOKE

PGBIN = "/usr/local/bin"


@pytest.fixture(scope="module")
def pg_dsn(tmp_path_factory):
    if not os.path.exists(f"{PGBIN}/initdb"):
        pytest.skip("postgres binaries not available")
    import tempfile

    # NOT pytest's tmp tree: that lives under a mode-700 root-owned dir
    # the postgres user can't traverse
    d = tempfile.mkdtemp(prefix="amadeus_pg_", dir="/tmp")
    data = os.path.join(d, "data")
    sock = os.path.join(d, "sock")
    os.makedirs(sock, exist_ok=True)
    # the server must run unprivileged; tests may run as root, so hand
    # the cluster dir to the postgres system user (present in this image)
    run_as = "postgres"
    subprocess.run(["chown", "-R", run_as, d], check=True)

    def as_pg(cmd: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["su", run_as, "-s", "/bin/sh", "-c", cmd], check=True, capture_output=True
        )

    as_pg(f"{PGBIN}/initdb -D {data} -U amadeus -A trust")
    # -l is load-bearing: without it the daemonized postmaster keeps the
    # captured stderr pipe open and subprocess.run blocks forever
    as_pg(
        f"{PGBIN}/pg_ctl -D {data} -o \"-k {sock} -h '' -c listen_addresses=\" "
        f"-w -l {d}/pg.log start"
    )
    dsn = f"host={sock} user=amadeus dbname=postgres"
    yield dsn
    subprocess.run(
        ["su", run_as, "-s", "/bin/sh", "-c", f"{PGBIN}/pg_ctl -D {data} -m immediate stop"],
        check=False,
        capture_output=True,
    )
    shutil.rmtree(d, ignore_errors=True)


ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def pg_orders(pg_dsn, spark):
    src = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    rows = src.collect()
    ddl = (
        "CREATE TABLE orders (o_orderkey bigint, o_custkey bigint, "
        "o_orderstatus text, o_totalprice double precision)"
    )
    subprocess.run(["psql", pg_dsn, "-X", "-q", "-c", ddl], check=True, capture_output=True)
    csv = "\n".join(
        f"{r.o_orderkey},{r.o_custkey},{r.o_orderstatus},{r.o_totalprice}" for r in rows
    )
    subprocess.run(
        ["psql", pg_dsn, "-X", "-q", "-c", "COPY orders FROM STDIN (FORMAT CSV)"],
        input=csv.encode(),
        check=True,
        capture_output=True,
    )
    return src


def test_copy_read_full_table(spark, pg_dsn, pg_orders):
    got = read_postgres_copy(
        spark,
        pg_dsn,
        "orders",
        ORDERS_SCHEMA,
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=10000,
        num_partitions=4,
    )
    assert got.count() == pg_orders.count()
    a = {r.o_orderkey: r.o_totalprice for r in got.collect()}
    b = {r.o_orderkey: r.o_totalprice for r in pg_orders.collect()}
    assert a == b


def test_copy_read_pushdown(spark, pg_dsn, pg_orders):
    """Column pruning + predicate reach Postgres verbatim (reference
    projection-pushdown parity, amadeus-postgres lib.rs:245)."""
    got = read_postgres_copy(
        spark,
        pg_dsn,
        "orders",
        T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_orderstatus", T.StringType()),
            ]
        ),
        columns=["o_orderkey", "o_orderstatus"],
        predicate="o_orderstatus = 'F'",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=10000,
        num_partitions=3,
    )
    want = pg_orders.filter(F.col("o_orderstatus") == "F").count()
    rows = got.collect()
    assert len(rows) == want
    assert set(rows[0].asDict().keys()) == {"o_orderkey", "o_orderstatus"}


def test_copy_read_keys_outside_bounds_not_dropped(spark, pg_dsn, pg_orders):
    """Regression (code-review finding): rows with keys below lower_bound
    or NULL keys must land in the first stride, not vanish."""
    subprocess.run(
        [
            "psql",
            pg_dsn,
            "-X",
            "-q",
            "-c",
            "INSERT INTO orders VALUES (-5, 1, 'X', 1.0), (NULL, 2, 'X', 2.0)",
        ],
        check=True,
        capture_output=True,
    )
    try:
        got = read_postgres_copy(
            spark,
            pg_dsn,
            "orders",
            ORDERS_SCHEMA,
            partition_column="o_orderkey",
            lower_bound=0,
            upper_bound=10000,
            num_partitions=4,
        )
        rows = got.collect()
        assert len(rows) == pg_orders.count() + 2
        keys = {r.o_orderkey for r in rows}
        assert -5 in keys and None in keys
    finally:
        subprocess.run(
            ["psql", pg_dsn, "-X", "-q", "-c", "DELETE FROM orders WHERE o_orderstatus = 'X'"],
            check=True,
            capture_output=True,
        )


def test_copy_read_query_source(spark, pg_dsn, pg_orders):
    got = read_postgres_copy(
        spark,
        pg_dsn,
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey",
        T.StructType(
            [T.StructField("o_custkey", T.LongType()), T.StructField("n", T.LongType())]
        ),
    )
    want = pg_orders.groupBy("o_custkey").count().count()
    assert got.count() == want


def test_copy_sink_roundtrip(spark, pg_dsn):
    """write_postgres_copy → read_postgres_copy round-trip: N-partition
    parallel COPY load, NULLs and quoting-hostile strings preserved."""
    from amadeus_spark.sources.postgres_copy import pg_ddl, run_sql, write_postgres_copy

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )
    rows = [
        (1, "plain", 1.5, True),
        (2, 'comma, and "quotes"', -2.25, False),
        (3, None, None, None),
        (4, "newline\nin value", 0.0, True),
        (5, "", 9.75, False),  # empty string must stay non-NULL
    ]
    df = spark.createDataFrame(rows, schema).repartition(3)
    run_sql(pg_dsn, "DROP TABLE IF EXISTS sink_rt")
    run_sql(pg_dsn, pg_ddl(schema, "sink_rt"))
    written = write_postgres_copy(df, pg_dsn, "sink_rt")
    assert written == 5
    back = read_postgres_copy(spark, pg_dsn, "sink_rt", schema).collect()
    got = sorted((r.id, r.name, r.score, r.ok) for r in back)
    assert got == sorted(rows)
    # overwrite truncates
    written2 = write_postgres_copy(df.limit(2), pg_dsn, "sink_rt", mode="overwrite")
    assert written2 == 2
    assert read_postgres_copy(spark, pg_dsn, "sink_rt", schema).count() == 2


def test_streaming_to_postgres_sink(spark, pg_dsn, tmp_path):
    """readStream(events) → windowed agg → foreachBatch COPY sink: the
    serving-table pattern. Final Postgres state must equal the batch
    aggregation of the same input."""
    from amadeus_spark.sources.postgres_copy import (
        pg_ddl,
        read_postgres_copy,
        run_sql,
    )
    from amadeus_spark.streaming import events as ev
    from amadeus_spark.tables import load_events
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "evstream")
    src = load_events(spark, SF_SMOKE)
    src.coalesce(2).write.parquet(d)

    agg_schema = T.StructType(
        [
            T.StructField("win_start", T.TimestampType()),
            T.StructField("win_end", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    run_sql(pg_dsn, "DROP TABLE IF EXISTS ev_serving")
    run_sql(pg_dsn, pg_ddl(agg_schema, "ev_serving"))

    stream = ev.windowed_counts(ev.read_event_stream(spark, d), window="1 hour")
    stream = stream.withColumnRenamed("total_value", "score")
    ev.run_to_postgres_sink(stream, pg_dsn, "ev_serving", output_mode="complete")

    back = read_postgres_copy(spark, pg_dsn, "ev_serving", agg_schema)
    batch = (
        src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )
    got = {(str(r.win_start), r.event_type): r.n_events for r in back.collect()}
    want = {(str(r.win_start), r.event_type): r.n_events for r in batch.collect()}
    assert got == want


def test_copy_binary_matches_csv(spark, pg_dsn, pg_orders):
    """FORMAT BINARY parity (amadeus-postgres/src/lib.rs:245 uses the
    binary protocol): both transfer formats must yield identical rows,
    including exact float values and NULL handling, across a typed
    column mix (bigint/text/double/bool/date/timestamp/numeric)."""
    subprocess.run(
        ["psql", pg_dsn, "-X", "-q", "-c",
         "CREATE TABLE typed AS SELECT o_orderkey, o_orderstatus, o_totalprice, "
         "(o_orderkey % 2 = 0) AS even, DATE '2000-01-01' + (o_orderkey % 700)::int AS d, "
         "TIMESTAMP '1999-12-31 23:59:59.123456' + (o_orderkey || ' microseconds')::interval AS ts, "
         "(o_totalprice::numeric / 7)::numeric(18,6) AS frac "
         "FROM orders WHERE o_orderkey IS NOT NULL "
         "UNION ALL SELECT NULL, NULL, NULL, NULL, NULL, NULL, NULL"],
        check=True, capture_output=True,
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("even", T.BooleanType()),
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("frac", T.DecimalType(18, 6)),
        ]
    )
    kw = dict(partition_column="o_orderkey", lower_bound=0, upper_bound=10000, num_partitions=3)
    via_csv = read_postgres_copy(spark, pg_dsn, "typed", schema, **kw)
    via_bin = read_postgres_copy(spark, pg_dsn, "typed", schema, format="binary", **kw)
    a = sorted(str(sorted(r.asDict().items())) for r in via_csv.collect())
    b = sorted(str(sorted(r.asDict().items())) for r in via_bin.collect())
    assert a == b
    assert len(a) == pg_orders.count() + 1


def test_binary_wire_decoder_pure():
    """Decoder unit test against hand-built COPY BINARY bytes (no server
    needed — runs even where pg binaries are absent). Covers every
    supported type incl. negative numeric, NULL fields, and the trailer."""
    import struct
    from decimal import Decimal

    from amadeus_spark.sources.postgres_copy import _decode_pg_binary

    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("num", T.DecimalType(18, 4)),
        ]
    )

    def fld(b: bytes) -> bytes:
        return struct.pack(">i", len(b)) + b

    header = b"PGCOPY\n\xff\r\n\x00" + struct.pack(">ii", 0, 0)
    # numeric -12345.6789 = digits [1,2345,6789] base-10000, weight 1,
    # sign 0x4000 (negative), dscale 4
    num = struct.pack(">hhhh", 3, 1, 0x4000, 4) + struct.pack(">3h", 1, 2345, 6789)
    row1 = struct.pack(">h", 7) + b"".join(
        [
            fld(struct.pack(">q", -42)),
            fld("héllo".encode()),
            fld(struct.pack(">d", 1.5)),
            fld(b"\x01"),
            fld(struct.pack(">i", 31)),  # 2000-01-01 + 31d = 2000-02-01
            fld(struct.pack(">q", 86_400_000_000 + 123456)),  # +1d 123456µs
            fld(num),
        ]
    )
    row2 = struct.pack(">h", 7) + struct.pack(">i", -1) * 7  # all NULL
    raw = header + row1 + row2 + struct.pack(">h", -1)

    out = _decode_pg_binary(raw, schema)
    assert len(out) == 2
    r = out.iloc[0]
    assert r["i"] == -42 and r["s"] == "héllo" and r["d"] == 1.5 and r["b"] is True
    assert str(r["dt"]) == "2000-02-01"
    assert str(r["ts"]) == "2000-01-02 00:00:00.123456"
    assert r["num"] == Decimal("-12345.6789")
    assert out.iloc[1].isna().all() or all(v is None for v in out.iloc[1])


def test_golden_fixture_pins_encoder_and_decoder():
    """The COMMITTED COPY BINARY fixture must byte-equal the encoder's
    output over GOLDEN_ROWS (artifact drift guard), and decoding it
    must reproduce GOLDEN_ROWS exactly — the serverless external-gate
    contract of sources/pg_golden.py."""
    import pandas as pd

    from amadeus_spark.sources import pg_golden as G
    from amadeus_spark.sources.postgres_copy import _decode_pg_binary

    with open(G.golden_fixture_path(), "rb") as f:
        raw = f.read()
    assert raw == G.encode_copy_binary(G.GOLDEN_ROWS, G.GOLDEN_SCHEMA)
    pdf = _decode_pg_binary(raw, G.GOLDEN_SCHEMA)
    pdf = pdf.astype(object).where(pdf.notna(), None)
    got = [tuple(r) for r in pdf.itertuples(index=False)]
    assert len(got) == len(G.GOLDEN_ROWS)
    for g, w in zip(got, G.GOLDEN_ROWS):
        for i, (gv, wv) in enumerate(zip(g, w)):
            if isinstance(wv, dt.datetime):
                assert pd.Timestamp(wv) == gv, (i, gv, wv)
            elif isinstance(wv, float):
                assert gv == wv and str(gv) == str(wv), (i, gv, wv)
            else:
                assert gv == wv, (i, gv, wv)


def test_golden_projection_dual_dialect_parity():
    """_project (Spark side) and golden_oracle_sql literals (DuckDB
    side) must agree value-for-value under the gate's stringify
    compare."""
    import duckdb

    from amadeus_spark.sources import pg_golden as G

    want = [G._project(r) for r in G.GOLDEN_ROWS]
    odf = duckdb.sql(G.golden_oracle_sql()).fetchdf()
    got = [tuple(r) for r in odf.itertuples(index=False)]
    assert [
        tuple(str(v) for v in row) for row in got
    ] == [tuple(str(v) for v in row) for row in want]
