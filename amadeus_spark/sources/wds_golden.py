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


#: round-trip gate shard-cut target: small enough that the GOLDEN
#: members split across several shards (the cut logic is exercised),
#: large enough that samples stay whole.
WRITE_TARGET = 4096


def writer_members() -> list[tuple[str, str | None, bytes]]:
    """The GOLDEN members as the WRITER's input rows (sample_key,
    slot, content) — slotless metadata members ride with their name as
    the key and a NULL slot (member_name() writes the bare name
    back)."""
    from amadeus_spark.sources.webdataset import split_sample_key

    rows = []
    for shard, mlist in GOLDEN.items():
        for name, size in mlist:
            key, slot = split_sample_key(name)
            if key is None:
                key, slot = name, None
            rows.append((key, slot, payload(shard, name, size)))
    return rows


def _tar_member_bytes(name: str, size: int) -> int:
    """One member's on-tar footprint, re-derived independently of the
    writer: header block, GNU longname blocks for >100-byte names,
    payload padded to 512."""
    nb = len(name.encode("utf-8"))
    blocks = 1
    if nb > 100:
        blocks += 1 + -(-(nb + 1) // 512)
    return 512 * blocks + size + (-size) % 512


def expected_written_index(target: int = WRITE_TARGET) -> list[tuple]:
    """Sequential replay of write_webdataset_shards' LAYOUT CONTRACT
    (global sample_key order, size-balanced cuts at cumulative-bytes
    div target, within-shard (key, slot nulls-first) order, tar header
    arithmetic) — independent of the distributed two-level cumsum, the
    writer's offset bookkeeping AND the parser, so the round-trip gate
    pins three mechanisms against one expectation. Rows: (shard
    basename, member, sample_key, slot, offset, size)."""
    from amadeus_spark.sources.webdataset import split_sample_key

    mem = writer_members()
    per: dict[str, int] = {}
    for key, slot, data in mem:
        name = key if slot is None else f"{key}.{slot}"
        per[key] = per.get(key, 0) + _tar_member_bytes(name, len(data))
    cum = 0
    shard_of: dict[str, int] = {}
    for key in sorted(per):
        shard_of[key] = cum // target
        cum += per[key]
    by_shard: dict[int, list] = {}
    for key, slot, data in mem:
        by_shard.setdefault(shard_of[key], []).append((key, slot, data))
    rows = []
    for sid in sorted(by_shard):
        pos = 0
        ordered = sorted(
            by_shard[sid],
            key=lambda t: (t[0], t[1] is not None, t[1] or ""),
        )
        for key, slot, data in ordered:
            name = key if slot is None else f"{key}.{slot}"
            hdr = _tar_member_bytes(name, 0)  # headers + zero payload
            ikey, islot = split_sample_key(name)
            rows.append(
                (
                    f"shard-{sid:05d}.tar",
                    name,
                    ikey,
                    islot,
                    pos + hdr,
                    len(data),
                )
            )
            pos += hdr + len(data) + (-len(data)) % 512
    return rows


def _values_sql(rows: list[tuple]) -> str:
    def lit(v):
        if v is None:
            return "CAST(NULL AS VARCHAR)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return f"CAST({v} AS BIGINT)"

    return ",\n".join(f"({', '.join(lit(v) for v in r)})" for r in rows)


def oracle_roundtrip_sql() -> str:
    """The replayed written-then-reindexed layout as literal VALUES —
    the webdataset_roundtrip gate oracle."""
    rows = _values_sql(expected_written_index())
    return f"""
        SELECT * FROM (VALUES
{rows}
        ) AS t(shard, member, sample_key, slot, "offset", size)
        ORDER BY shard, "offset"
    """


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
