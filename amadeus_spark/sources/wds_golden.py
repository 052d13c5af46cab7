"""Golden WebDataset fixture — a hash-checkable gate for the tar-shard
indexer (sources/webdataset.py) without depending on any external
shard corpus.

Two deterministic .tar shards (zeroed tar metadata — see
webdataset._ustar_header) are committed under fixtures/wds/; the gate
query runs the REAL distributed index path over the committed bytes
and the oracle is the expected (shard, sample_key, slot, offset,
size) rows as plain SQL literals. Fixture bytes, gate expectation and
oracle literals all derive from the single GOLDEN layout constant
below (dual-dialect iron rule), and expected_index() replays the tar
layout arithmetic (512-byte header + 512-padded payload per member)
independently of the parser it checks. A drift test pins fixture
bytes == build_tar(GOLDEN members)."""

from __future__ import annotations

import os

#: shard name → list of (sample number, slot, payload size). Sizes are
#: spread to cross 512-block boundaries both ways (payloads smaller
#: and larger than one block, incl. an empty one); a slotless metadata
#: member and a dotted-slot member ('seg.png') pin the sample-key
#: grammar's edges.
GOLDEN: dict[str, list[tuple[str, int]]] = {
    "golden-000.tar": [
        ("000000.jpg", 613), ("000000.txt", 47), ("000000.json", 121),
        ("000001.jpg", 512), ("000001.txt", 0), ("000001.seg.png", 77),
        ("METADATA", 29),
        ("000002.jpg", 1025), ("000002.txt", 333),
    ],
    "golden-001.tar": [
        ("000003.jpg", 89), ("000003.json", 511),
        ("000004.jpg", 2048), ("000004.txt", 13), ("000004.json", 257),
    ],
}


def fixture_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "fixtures",
        "wds",
    )


def payload(shard: str, name: str, size: int) -> bytes:
    """Deterministic pseudo-payload: a function of (shard, name)
    alone, so fixture bytes can never drift run-to-run."""
    seed = (sum(shard.encode()) * 31 + sum(name.encode())) % 251
    return bytes((seed + 7 * k) % 256 for k in range(size))


def members(shard: str) -> list[tuple[str, bytes]]:
    return [
        (name, payload(shard, name, size)) for name, size in GOLDEN[shard]
    ]


def expected_index() -> list[tuple]:
    """The expected member index, by replaying the tar LAYOUT
    arithmetic (header block + 512-padded payload) — independent of
    the parser under test. Rows: (shard basename, member, sample_key,
    slot, offset, size), member order as written."""
    from amadeus_spark.sources.webdataset import BLOCK, split_sample_key

    rows = []
    for shard, mlist in GOLDEN.items():
        off = 0
        for name, size in mlist:
            data_off = off + BLOCK
            key, slot = split_sample_key(name)
            rows.append((shard, name, key, slot, data_off, size))
            off = data_off + size + ((-size) % BLOCK)
    return rows


def oracle_sql() -> str:
    """The expected index as literal VALUES — BIGINT/STRING only,
    ordered like the gate query."""

    def lit(v):
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return f"CAST({v} AS BIGINT)"

    rows = ",\n".join(
        f"({', '.join(lit(v) for v in r)})" for r in expected_index()
    )
    return f"""
        SELECT * FROM (VALUES
{rows}
        ) AS t(shard, member, sample_key, slot, "offset", size)
        ORDER BY shard, "offset"
    """
