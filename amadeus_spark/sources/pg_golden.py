"""Golden COPY BINARY fixture — a serverless, hash-checkable gate for
the Postgres wire decoder (sources/postgres_copy._decode_pg_binary).

The COPY source family is otherwise only testable against a live
server (none exists in the driver environment — its 16 tests skip
there), which left the decoder as the one §2 component without an
external CORRECTNESS row. This module closes that: a byte stream in
the DOCUMENTED wire format (PGCOPY signature, int32 flags/extension,
per-tuple int16 field count, per-field int32 length + binary send()
payload, int16 -1 trailer — PostgreSQL docs, "Binary Format") is
committed as a fixture; the gate query decodes the COMMITTED bytes and
the oracle is the expected values as plain SQL literals. Both derive
from the single GOLDEN_ROWS constant below (dual-dialect iron rule),
and a drift test pins fixture bytes == encoder(GOLDEN_ROWS).

The encoder here exists only to MAKE the fixture (scripts/
make_pg_copy_fixture.py) — production writes go through psql COPY
FROM; reference parity target: amadeus-postgres/src/lib.rs:245
(COPY ... TO STDOUT (FORMAT BINARY))."""

from __future__ import annotations

import datetime as dt
import os
import struct
from decimal import Decimal

from pyspark.sql import types as T

#: 2000-01-01 — epoch of the binary date (days, int32) and timestamp
#: (µs, int64) encodings
_PG_EPOCH_DATE = dt.date(2000, 1, 1)
_PG_EPOCH_TS = dt.datetime(2000, 1, 1)

#: wire schema of the fixture stream, decoder-side Spark types
GOLDEN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i16", T.ShortType()),
        T.StructField("f64", T.DoubleType()),
        T.StructField("flt", T.FloatType()),
        T.StructField("txt", T.StringType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("num", T.DecimalType(30, 10)),
    ]
)

#: the one source of truth: every consumer (fixture encoder, gate
#: query expectation, oracle literals) derives from these rows.
#: Extremes on purpose: int min/max, negative pre-epoch date/ts,
#: unicode + control chars, -0.0, base-10000 numeric digit groups.
GOLDEN_ROWS: list[tuple] = [
    (1, 2147483647, 32767, 1.5, 2.5, "naïve—☃ copy", True,
     dt.date(2024, 2, 29), dt.datetime(2024, 6, 1, 12, 34, 56, 789012),
     Decimal("-12345.6789")),
    (2, -2147483648, -32768, -0.25, -2.5, "", False,
     dt.date(1999, 12, 31), dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
     Decimal("0.0001")),
    (3, None, 0, 3.140625, 0.5, None, None,
     dt.date(2000, 1, 1), dt.datetime(2000, 1, 1),
     Decimal("0.00")),
    (4, 42, -1, 1e300, -0.0, "line\nbreak\ttab", True,
     dt.date(2038, 1, 19), dt.datetime(2100, 1, 2, 3, 4, 5, 6),
     Decimal("99999999.99999999")),
    (5, 0, None, 6.25e-3, 100.125, "ASCII only", False,
     dt.date(1970, 1, 1), dt.datetime(1970, 1, 1, 0, 0, 1),
     Decimal("1234567890123.456")),
    (6, -7, 7, -123456.5, 0.0, "末日 🎉", True,
     None, None,
     None),
]

#: sentinels the gate projection substitutes for NULLs in columns whose
#: pandas/NumPy NULL stringification differs between engines (iron
#: rule 9: nullable scalars stringify None vs nan)
NULL_I = -999
NULL_S = "NULL"


def _enc_numeric(v: Decimal) -> bytes:
    """Decimal → NUMERIC wire bytes (int16 ndigits/weight/sign/dscale +
    base-10000 digit groups). Groups are kept unstripped — the decoder
    sums zero terms harmlessly and quantizes by dscale."""
    sign = 0x4000 if v < 0 else 0x0000
    s = format(abs(v), "f")
    ip, _, fp = s.partition(".")
    dscale = len(fp)
    ip = ip.zfill(((len(ip) + 3) // 4) * 4)
    fp = fp + "0" * (-len(fp) % 4)
    groups = [ip[i : i + 4] for i in range(0, len(ip), 4)] + [
        fp[i : i + 4] for i in range(0, len(fp), 4)
    ]
    digits = [int(g) for g in groups]
    weight = len(ip) // 4 - 1
    return struct.pack(
        f">hhhh{len(digits)}h", len(digits), weight, sign, dscale, *digits
    )


def _enc_field(dtype, v) -> bytes:
    if isinstance(dtype, T.LongType):
        return struct.pack(">q", v)
    if isinstance(dtype, T.IntegerType):
        return struct.pack(">i", v)
    if isinstance(dtype, T.ShortType):
        return struct.pack(">h", v)
    if isinstance(dtype, T.DoubleType):
        return struct.pack(">d", v)
    if isinstance(dtype, T.FloatType):
        return struct.pack(">f", v)
    if isinstance(dtype, T.BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(dtype, T.StringType):
        return v.encode("utf-8")
    if isinstance(dtype, T.DateType):
        return struct.pack(">i", (v - _PG_EPOCH_DATE).days)
    if isinstance(dtype, T.TimestampType):
        delta = v - _PG_EPOCH_TS
        return struct.pack(
            ">q", (delta.days * 86400 + delta.seconds) * 1_000_000
            + delta.microseconds
        )
    if isinstance(dtype, T.DecimalType):
        return _enc_numeric(v)
    raise ValueError(f"no encoder for {dtype}")


def encode_copy_binary(rows: list[tuple], schema: T.StructType) -> bytes:
    out = [b"PGCOPY\n\xff\r\n\x00", struct.pack(">ii", 0, 0)]
    for row in rows:
        out.append(struct.pack(">h", len(row)))
        for f, v in zip(schema.fields, row):
            if v is None:
                out.append(struct.pack(">i", -1))
            else:
                payload = _enc_field(f.dataType, v)
                out.append(struct.pack(">i", len(payload)) + payload)
    out.append(struct.pack(">h", -1))
    return b"".join(out)


def golden_fixture_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "fixtures",
        "pg_copy_golden.bin",
    )


def _project(row: tuple) -> tuple:
    """One decoded wire row → the gate-safe output tuple (BIGINT/
    DOUBLE/STRING/BOOLEAN only; dates/timestamps go out as ISO string
    and epoch-µs offset — TZ-proof and engine-portable)."""
    (id_, i32, i16, f64, flt, txt, flag, d, ts, num) = row
    # pandas Timestamp subclasses datetime, so one branch serves both
    ts_us = (
        NULL_I
        if ts is None
        else (ts - _PG_EPOCH_TS) // dt.timedelta(microseconds=1)
    )
    return (
        int(id_),
        NULL_I if i32 is None else int(i32),
        NULL_I if i16 is None else int(i16),
        float(f64),
        float(flt),
        txt,  # NULL stays None: object column, both engines print None
        # BOOLEAN NULL comes back as nan from DuckDB's fetchdf (vs
        # Spark's None) — ship the flag as a string instead
        NULL_S if flag is None else ("true" if flag else "false"),
        NULL_S if d is None else str(d),
        int(ts_us),
        NULL_S if num is None else str(num),
    )


OUT_SCHEMA = (
    "id bigint, i32 bigint, i16 bigint, f64 double, flt double,"
    " txt string, flag_s string, d_s string, ts_us bigint, num_s string"
)


def golden_oracle_sql() -> str:
    """Expected output as DuckDB literals — derived from GOLDEN_ROWS
    through the SAME projection, so the two dialects cannot drift."""

    def lit(v, cast):
        if v is None:
            return f"CAST(NULL AS {cast})"
        if isinstance(v, float):
            # string-cast: a bare -0.0 literal parses as DECIMAL first
            # and loses its sign on the way to DOUBLE
            return f"CAST('{v!r}' AS DOUBLE)"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        esc = str(v).replace("'", "''").replace("\n", "' || chr(10) || '").replace(
            "\t", "' || chr(9) || '"
        )
        return f"'{esc}'"

    casts = ("BIGINT", "BIGINT", "BIGINT", "DOUBLE", "DOUBLE", "VARCHAR",
             "VARCHAR", "VARCHAR", "BIGINT", "VARCHAR")
    rows_sql = ",\n  ".join(
        "(" + ", ".join(lit(v, c) for v, c in zip(_project(r), casts)) + ")"
        for r in GOLDEN_ROWS
    )
    return f"""
SELECT * FROM (VALUES
  {rows_sql}
) AS t(id, i32, i16, f64, flt, txt, flag_s, d_s, ts_us, num_s)
ORDER BY id
"""
