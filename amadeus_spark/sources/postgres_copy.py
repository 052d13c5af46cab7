"""Postgres source via COPY TO STDOUT — the reference's exact transfer
mechanism (amadeus-postgres/src/lib.rs:245 issues
``COPY (SELECT <cols> FROM <tbl>) TO STDOUT (FORMAT BINARY)`` and decodes
the stream; one task per (url, table) pair).

Spark-first translation with *better* parallelism: the read is split
into ``num_partitions`` key ranges (like JDBC's partitionColumn), each
executor task COPYs only its range via ``psql`` (CSV form — the text
protocol is engine-portable and needs no client library), parsed with
pandas inside ``mapInPandas``. Column pruning = the SELECT list;
predicate pushdown = the WHERE clause — both reach Postgres verbatim,
matching the reference's projection-pushdown behavior (SURVEY §4 row 3).

Prefer the JDBC reader (sources/readers.py:read_postgres) when the
driver jar is available; this COPY path exists because COPY is
measurably faster than cursor-based JDBC for bulk export and because it
matches the reference's semantics exactly.

Scale note: ranges must cover the key domain evenly (skewed bounds →
straggler tasks). At 100 TB use a stats query for quantile-based bounds.
"""

from __future__ import annotations

import io
import subprocess
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _copy_csv(dsn: str, query: str) -> bytes:
    """Run COPY (query) TO STDOUT (FORMAT CSV, HEADER) through psql.
    NULLs travel as unquoted \\N so they never collide with quoted empty
    strings (CSV-default NULL is the empty string, which pandas cannot
    tell apart from '')."""
    sql = f"COPY ({query}) TO STDOUT (FORMAT CSV, HEADER, NULL '\\N')"
    proc = subprocess.run(
        ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q", "-c", sql],
        capture_output=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql COPY failed: {proc.stderr.decode(errors='replace')}")
    return proc.stdout


def _copy_binary(dsn: str, query: str) -> bytes:
    """Run COPY (query) TO STDOUT (FORMAT BINARY) through psql — the
    reference's exact transfer protocol (amadeus-postgres/src/lib.rs:245)."""
    sql = f"COPY ({query}) TO STDOUT (FORMAT BINARY)"
    proc = subprocess.run(
        ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q", "-c", sql],
        capture_output=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql COPY failed: {proc.stderr.decode(errors='replace')}")
    return proc.stdout


#: epoch of the binary date/timestamp encodings (days / µs since 2000-01-01)
_PG_EPOCH = pd.Timestamp("2000-01-01")


def _decode_pg_binary(raw: bytes, schema: T.StructType) -> pd.DataFrame:
    """Decode the COPY BINARY stream (documented wire format: 11-byte
    signature, int32 flags, int32 extension, then per tuple an int16
    field count and per field an int32 byte length (-1 = NULL) + the
    type's binary send() output; int16 -1 trailer). Type-lossless where
    CSV is not: no text round-trip for floats, timestamps at exact µs,
    numeric decoded digit-exact."""
    import struct
    from decimal import Decimal

    sig = b"PGCOPY\n\xff\r\n\x00"
    if raw[: len(sig)] != sig:
        raise ValueError("not a COPY BINARY stream")
    pos = len(sig)
    (_flags, extlen) = struct.unpack_from(">ii", raw, pos)
    pos += 8 + extlen

    def field(dtype, buf: bytes):
        if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
            return int.from_bytes(buf, "big", signed=True)
        if isinstance(dtype, T.DoubleType):
            return struct.unpack(">d", buf)[0]
        if isinstance(dtype, T.FloatType):
            return struct.unpack(">f", buf)[0]
        if isinstance(dtype, T.BooleanType):
            return buf[0] == 1
        if isinstance(dtype, T.StringType):
            return buf.decode("utf-8")
        if isinstance(dtype, T.DateType):
            days = struct.unpack(">i", buf)[0]
            return (_PG_EPOCH + pd.Timedelta(days=days)).date()
        if isinstance(dtype, T.TimestampType):
            us = struct.unpack(">q", buf)[0]
            return _PG_EPOCH + pd.Timedelta(microseconds=us)
        if isinstance(dtype, T.DecimalType):
            ndig, weight, sign, dscale = struct.unpack_from(">hhhh", buf, 0)
            digits = struct.unpack_from(f">{ndig}h", buf, 8)
            # base-10000 digits; weight = position of the first digit
            # relative to the decimal point (in 4-digit groups)
            val = Decimal(0)
            for i, d in enumerate(digits):
                val += Decimal(d) * (Decimal(10000) ** (weight - i))
            if sign == 0x4000:
                val = -val
            return val.quantize(Decimal(1).scaleb(-dscale)) if dscale else val
        raise ValueError(f"no binary decoder for {dtype}")

    names = [f.name for f in schema.fields]
    dtypes = [f.dataType for f in schema.fields]
    rows: list[tuple] = []
    while True:
        (nf,) = struct.unpack_from(">h", raw, pos)
        pos += 2
        if nf == -1:
            break
        vals = []
        for i in range(nf):
            (ln,) = struct.unpack_from(">i", raw, pos)
            pos += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(field(dtypes[i], raw[pos : pos + ln]))
                pos += ln
        rows.append(tuple(vals))
    out = pd.DataFrame(rows, columns=names)
    for f in schema.fields:  # keep integer columns nullable-int, not float
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            out[f.name] = out[f.name].astype("Int64")
    return out


def read_postgres_copy(
    spark: SparkSession,
    dsn: str,
    table_or_query: str,
    schema: T.StructType,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 4,
    columns: list[str] | None = None,
    predicate: str | None = None,
    format: str = "csv",
) -> DataFrame:
    """Parallel COPY-based Postgres read.

    ``table_or_query``: a table name or a parenthesizable SELECT.
    Without ``partition_column`` the read is a single task (the
    reference's per-table granularity); with it, ``num_partitions``
    half-open ranges [lo, hi) split the work across executors.

    ``format``: 'csv' (engine-portable text protocol, the default) or
    'binary' (the reference's FORMAT BINARY — faster on the wire and
    type-lossless: floats never round-trip through text, timestamps
    arrive at exact µs, numerics digit-exact).
    """
    if format not in ("csv", "binary"):
        raise ValueError(f"format must be csv|binary, not {format!r}")
    cols = ", ".join(columns) if columns else "*"
    src = f"({table_or_query}) q" if " " in table_or_query.strip() else table_or_query
    base = f"SELECT {cols} FROM {src}"
    where_extra = f" AND ({predicate})" if predicate else ""

    if partition_column is None:
        queries = [base + (f" WHERE {predicate}" if predicate else "")]
    else:
        assert lower_bound is not None and upper_bound is not None
        span = max(upper_bound - lower_bound + 1, 1)
        step = (span + num_partitions - 1) // num_partitions
        queries = []
        for i in range(num_partitions):
            lo = lower_bound + i * step
            hi = lower_bound + (i + 1) * step
            # JDBC-parity strides: the FIRST range is unbounded below and
            # owns NULL keys, the LAST is unbounded above — keys outside
            # [lower_bound, upper_bound] are never silently dropped.
            if num_partitions == 1:
                rng = "TRUE"
            elif i == 0:
                rng = f"({partition_column} < {hi} OR {partition_column} IS NULL)"
            elif i < num_partitions - 1:
                rng = f"{partition_column} >= {lo} AND {partition_column} < {hi}"
            else:
                rng = f"{partition_column} >= {lo}"
            queries.append(f"{base} WHERE {rng}{where_extra}")

    plan = spark.createDataFrame([(q,) for q in queries], "copy_query string").repartition(
        len(queries)
    )
    names = [f.name for f in schema.fields]
    pd_dtypes = {
        f.name: "Int64"
        for f in schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
    }

    bool_cols = [
        f.name for f in schema.fields if isinstance(f.dataType, T.BooleanType)
    ]
    dt_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.DateType))
    ]

    def fetch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for q in pdf["copy_query"]:
                if format == "binary":
                    out = _decode_pg_binary(_copy_binary(dsn, q), schema)
                    yield out if len(out) else pd.DataFrame(columns=names)
                    continue
                raw = _copy_csv(dsn, q)
                out = pd.read_csv(
                    io.BytesIO(raw),
                    dtype=pd_dtypes,
                    keep_default_na=False,
                    na_values=[r"\N"],
                )
                for c in bool_cols:  # postgres CSV booleans are t/f
                    out[c] = out[c].map({"t": True, "f": False})
                for c in dt_cols:  # CSV timestamps arrive as strings
                    out[c] = pd.to_datetime(out[c])
                yield out[names] if len(out) else pd.DataFrame(columns=names)

    return plan.mapInPandas(fetch, schema=schema)


# ---- sink -----------------------------------------------------------------

_PG_TYPES = {
    "LongType": "bigint",
    "IntegerType": "integer",
    "ShortType": "smallint",
    "DoubleType": "double precision",
    "FloatType": "real",
    "StringType": "text",
    "BooleanType": "boolean",
    "DateType": "date",
    "TimestampType": "timestamp",
}


def pg_ddl(schema: T.StructType, table: str) -> str:
    """CREATE TABLE statement for a Spark schema (scalar columns only —
    nest/binary columns have no portable CSV form; project them out)."""
    cols = []
    for f in schema.fields:
        tname = type(f.dataType).__name__
        if isinstance(f.dataType, T.DecimalType):
            pg = f"numeric({f.dataType.precision}, {f.dataType.scale})"
        elif tname in _PG_TYPES:
            pg = _PG_TYPES[tname]
        else:
            raise ValueError(f"no portable Postgres mapping for column {f.name}: {tname}")
        cols.append(f'"{f.name}" {pg}')
    return f"CREATE TABLE {table} ({', '.join(cols)})"


def run_sql(dsn: str, sql: str) -> None:
    """Run one statement through psql (driver-side DDL helper)."""
    proc = subprocess.run(
        ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q", "-c", sql],
        capture_output=True,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr.decode(errors='replace')}")


def write_postgres_copy(df: DataFrame, dsn: str, table: str, mode: str = "append") -> int:
    """Distributed Postgres sink via ``COPY <table> FROM STDIN (FORMAT
    CSV)`` — the reference *declares* DB sinks but never ships them
    (README.md:60-73); this completes the surface using the same
    transfer mechanism as the COPY source, in reverse.

    Each input partition streams its Arrow batches through ONE psql
    process (mapInPandas) — an N-partition frame loads N-way parallel
    with bounded memory, the same shape as the reference's per-task
    source topology. Returns total rows written (the count action is
    what triggers the write; exactly-once per task attempt is NOT
    guaranteed under task retries — wrap the load in a staging table +
    atomic rename for that, as any COPY-based loader must).

    NULLs travel as unquoted ``\\N`` (never confusable with quoted empty
    strings); a *literal* string ``\\N`` would be read back as NULL —
    the standard COPY-CSV ambiguity, documented here. mode='overwrite'
    truncates first (driver-side, not transactional with the load).
    """
    if mode == "overwrite":
        run_sql(dsn, f"TRUNCATE TABLE {table}")
    elif mode != "append":
        raise ValueError(f"mode must be append|overwrite, not {mode!r}")
    collist = ", ".join(f'"{c}"' for c in df.columns)
    copy_sql = f"COPY {table} ({collist}) FROM STDIN (FORMAT CSV, NULL '\\N')"

    def sink(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q", "-c", copy_sql],
            stdin=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        n = 0
        try:
            for pdf in batches:
                if len(pdf):
                    proc.stdin.write(
                        pdf.to_csv(index=False, header=False, na_rep="\\N").encode()
                    )
                    n += len(pdf)
            proc.stdin.close()
        finally:
            rc = proc.wait()
        if rc != 0:
            raise RuntimeError(
                f"psql COPY FROM failed: {proc.stderr.read().decode(errors='replace')}"
            )
        yield pd.DataFrame({"rows_written": [n]})

    from pyspark.sql import functions as F

    out = df.mapInPandas(sink, "rows_written bigint")
    total = out.agg(F.sum("rows_written")).first()[0]
    return int(total or 0)
