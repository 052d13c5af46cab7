"""Generate the repo's nested parquet fixtures (deterministic; committed).

The reference's nested coverage is FILE-based: tests/parquet.rs:113-290
reads nested_lists.snappy / nested_maps.snappy / int96 / datapage-v2
fixtures and asserts typed↔dynamic parity row-by-row. These fixtures
re-create that surface with pyarrow as the writer (a different writer
than Spark — that's the point: reader-level nested semantics like
nullable inner elements and map value nullability are what's under
test, not a Spark round-trip).

Run: python scripts/make_nested_fixtures.py   (writes fixtures/*.parquet)
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def nested_lists() -> pa.Table:
    """list<list<string?>?> with nulls at every level + flat key (the
    reference fixture's shape: nested_lists.snappy, parquet.rs:113-160)."""
    a = pa.array(
        [
            [["a", "b"], ["c"]],
            [["d", None], None],
            None,
            [[], ["e", "f", "g"]],
            [[None], []],
        ],
        type=pa.list_(pa.list_(pa.string())),
    )
    b = pa.array([1, 1, 1, 2, 3], type=pa.int32())
    return pa.table({"a": a, "b": b})


def nested_maps() -> pa.Table:
    """map<string, map<int32, bool?>> (nested_maps.snappy shape,
    parquet.rs:161-199) — map values nullable, inner maps empty/missing."""
    t = pa.map_(pa.string(), pa.map_(pa.int32(), pa.bool_()))
    m = pa.array(
        [
            [("a", [(1, True), (2, False)])],
            [("b", [(1, True)])],
            [("c", None)],
            [("d", [])],
            [("e", [(1, None)])],
        ],
        type=t,
    )
    c = pa.array([1, 1, 1, 1, 1], type=pa.int64())
    return pa.table({"a": m, "c": c})


def deep_struct() -> pa.Table:
    """3-deep struct with nullable leaves (typed Group nesting,
    value.rs:148-153) + arrays of structs."""
    t = pa.struct(
        [
            ("name", pa.string()),
            (
                "inner",
                pa.struct(
                    [
                        ("score", pa.float64()),
                        ("deep", pa.struct([("flag", pa.bool_()), ("n", pa.int64())])),
                    ]
                ),
            ),
        ]
    )
    s = pa.array(
        [
            {"name": "x", "inner": {"score": 1.5, "deep": {"flag": True, "n": 7}}},
            {"name": "y", "inner": {"score": None, "deep": {"flag": False, "n": None}}},
            {"name": None, "inner": None},
            None,
        ],
        type=t,
    )
    pairs = pa.array(
        [
            [{"k": "p", "v": 1}, {"k": "q", "v": 2}],
            [],
            None,
            [{"k": "r", "v": None}],
        ],
        type=pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())])),
    )
    rid = pa.array([1, 2, 3, 4], type=pa.int64())
    return pa.table({"rid": rid, "s": s, "pairs": pairs})


def int96_ts() -> pa.Table:
    """INT96 timestamps (the deprecated impala encoding the reference
    reads at parquet.rs:200-240); written via the legacy flag."""
    ts = pa.array(
        [
            datetime.datetime(2001, 1, 1, 0, 0, 0),
            datetime.datetime(2024, 6, 30, 23, 59, 59, 123456),
            None,
        ],
        type=pa.timestamp("us"),
    )
    k = pa.array([1, 2, 3], type=pa.int64())
    return pa.table({"k": k, "ts": ts})


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(nested_lists(), os.path.join(OUT, "nested_lists.parquet"), compression="snappy")
    pq.write_table(nested_maps(), os.path.join(OUT, "nested_maps.parquet"), compression="snappy")
    pq.write_table(deep_struct(), os.path.join(OUT, "deep_struct.parquet"), compression="snappy")
    # datapage v2 variant of the lists fixture (parquet.rs:241-260)
    pq.write_table(
        nested_lists(),
        os.path.join(OUT, "nested_lists_v2.parquet"),
        compression="snappy",
        data_page_version="2.0",
    )
    pq.write_table(
        int96_ts(),
        os.path.join(OUT, "int96_ts.parquet"),
        use_deprecated_int96_timestamps=True,
        compression="snappy",
    )
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)))


if __name__ == "__main__":
    main()
