"""Property-based tests (hypothesis) over the pure-Python kernels — the
parts with algorithmic invariants that example tests undersample:
CMS bounds/mergeability, WARC round-trip, sketch serialization."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amadeus_spark.functions.sketch_lib import CountMinTopK, cms_params
from amadeus_spark.functions import dedup
from amadeus_spark.sources.warc import parse_warc_bytes

keys = st.lists(
    st.tuples(st.text(alphabet="abcdefg", min_size=1, max_size=4), st.integers(1, 50)),
    min_size=0,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(keys)
def test_cms_estimates_are_upper_bounds(items):
    """CMS estimate(k) >= true count(k), always (one-sided error)."""
    sk = CountMinTopK(5, 0.99, 0.01)
    truth: dict[str, int] = {}
    for k, n in items:
        sk.push(k, n)
        truth[k] = truth.get(k, 0) + n
    for k, true_n in truth.items():
        assert sk.estimate(k) >= true_n


@settings(max_examples=40, deadline=None)
@given(keys, keys)
def test_cms_merge_never_underestimates_either_half(a_items, b_items):
    """merge(a, b) estimates >= the sum of true counts from both halves."""
    a, b = CountMinTopK(5, 0.99, 0.01), CountMinTopK(5, 0.99, 0.01)
    truth: dict[str, int] = {}
    for k, n in a_items:
        a.push(k, n)
        truth[k] = truth.get(k, 0) + n
    for k, n in b_items:
        b.push(k, n)
        truth[k] = truth.get(k, 0) + n
    merged = a.merge(b)
    for k, true_n in truth.items():
        assert merged.estimate(k) >= true_n


@settings(max_examples=40, deadline=None)
@given(keys)
def test_cms_serialization_roundtrip_preserves_everything(items):
    sk = CountMinTopK(4, 0.95, 0.02)
    for k, n in items:
        sk.push(k, n)
    rt = CountMinTopK.loads(sk.dumps())
    assert rt.top() == sk.top()
    assert rt.table == sk.table
    for k, _ in items:
        assert rt.estimate(k) == sk.estimate(k)


@settings(max_examples=50, deadline=None)
@given(
    st.floats(0.5, 0.9999),
    st.floats(0.0001, 0.5),
)
def test_cms_params_monotone(p, tol):
    """Reference sizing: tighter tolerance → wider table; higher
    probability → deeper table (count_min.rs:58-77)."""
    w, d = cms_params(p, tol)
    w2, _ = cms_params(p, tol / 2)
    _, d2 = cms_params(1 - (1 - p) / 2, tol)
    assert w >= 1 and d >= 1
    assert w2 >= w
    assert d2 >= d


wbody = st.binary(min_size=0, max_size=200)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcxyz:/._", min_size=1, max_size=30), wbody), max_size=5))
def test_warc_roundtrip(records):
    """Serialize records in WARC/1.0 grammar → parse → identical bodies
    and URIs, regardless of body bytes (incl. CRLFs inside bodies)."""
    blob = b""
    for uri, body in records:
        blob += (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
            f"WARC-IP-Address: 1.2.3.4\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    parsed = list(parse_warc_bytes(blob))
    assert len(parsed) == len(records)
    for (uri, body), rec in zip(records, parsed):
        assert rec["contents"] == body
        assert rec["url"] == uri.strip()


def test_connected_components_matches_union_find(spark):
    """Random-graph property: the distributed label propagation must
    equal an independent driver-side union-find (different algorithm,
    same answer) — nodes preserved, edges intra-cluster, rep = min."""
    import random

    from amadeus_spark.functions import dedup

    rng = random.Random(4242)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]

    parent = list(range(121))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for e in edges for n in e})
    want = {n: find(n) for n in nodes}

    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r.id: r.cluster
        for r in dedup.connected_components(pairs, "doc_a", "doc_b").collect()
    }
    assert got == want


def test_sequence_packing_conservation(spark):
    """Packing invariants on real documents: token totals are conserved,
    every doc lands in exactly one bin, and bins are non-decreasing in
    id order within a stream."""
    import os

    from pyspark.sql import functions as F

    from amadeus_spark.functions import text as textmod
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet"))
    packed = textmod.sequence_packing(docs, capacity=512).collect()
    total_packed = sum(r.total_tokens for r in packed)
    n_docs_packed = sum(r.n_docs for r in packed)
    direct = docs.select(
        textmod.token_count(F.col("text")).cast("bigint").alias("n")
    ).agg(F.sum("n"), F.count(F.lit(1))).first()
    assert total_packed == direct[0]
    assert n_docs_packed == direct[1]
    for r in packed:
        assert r.fill_ratio == r.total_tokens / 512


def test_star_cc_matches_propagation_on_random_graphs(spark):
    """large-star/small-star labels == min-label propagation labels on
    random pair graphs (cliques, chains, isolated pairs)."""
    import random as _r

    rng = _r.Random(11)
    for trial in range(3):
        edges = [
            (rng.randint(0, 40), rng.randint(0, 40)) for _ in range(30)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        prop = {
            (r.id, r.cluster)
            for r in dedup.connected_components(df, "doc_a", "doc_b").collect()
        }
        star = {
            (r.id, r.cluster)
            for r in dedup.connected_components_star(
                df, "doc_a", "doc_b"
            ).collect()
        }
        assert star == prop, trial


def test_star_cc_converges_on_high_diameter_chain(spark):
    """A 120-node path has diameter 119: min-label propagation's round
    count (and its max_iter=20 guard) can't reach it, but star
    contraction converges in O(log^2) rounds and labels the whole chain
    with its minimum."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    # driver_cutoff=0 forces the DISTRIBUTED propagation loop (the r15
    # hybrid would fold this bounded chain driver-side and converge)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(
            chain, "doc_a", "doc_b", max_iter=20, driver_cutoff=0
        )
    got = dedup.connected_components_star(chain, "doc_a", "doc_b", max_iter=12)
    assert {(r.id, r.cluster) for r in got.collect()} == {
        (i, 0) for i in range(121)
    }


def test_scd2_matches_python_reference(spark):
    """scd2_from_changelog == a direct per-key Python fold on random
    change logs (episode collapse, sequence, durations, -1 current)."""
    import random as _r
    from collections import defaultdict
    from datetime import datetime, timedelta

    from amadeus_spark.operators.scd import scd2_from_changelog

    rng = _r.Random(23)
    base = datetime(2024, 1, 1)
    rows = []
    for tie in range(200):
        rows.append(
            (
                rng.randint(0, 8),  # key
                base + timedelta(seconds=rng.randint(0, 5000)),
                tie,
                # NULL attributes included: a value that IS or BECOMES
                # NULL must still open an episode (null-safe compare)
                rng.choice(["a", "b", "c", None]),
            )
        )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r.user_id, r.seq, r.event_type, r.duration_us)
        for r in scd2_from_changelog(
            df, ["user_id"], "ts", ["event_type"], "event_id"
        ).collect()
    }

    per_key = defaultdict(list)
    for k, ts, tie, v in rows:
        per_key[k].append((ts, tie, v))
    want = set()
    for k, items in per_key.items():
        items.sort()
        episodes = [
            (ts, v)
            for i, (ts, tie, v) in enumerate(items)
            if i == 0 or v != items[i - 1][2]  # Python != is null-safe
        ]
        for i, (ts, v) in enumerate(episodes):
            dur = (
                int((episodes[i + 1][0] - ts).total_seconds() * 1_000_000)
                if i + 1 < len(episodes)
                else -1
            )
            want.add((k, i + 1, v, dur))
    assert got == want


_member_names = st.lists(
    st.text(
        alphabet="abcdefghij0123456789._-/",
        min_size=1,
        max_size=40,
    ).filter(
        lambda s: not s.startswith("/")
        and "//" not in s
        and not s.endswith("/")
        and s.strip(".") != ""
    ),
    min_size=0,
    max_size=12,
    unique=True,
)
_payloads = st.binary(min_size=0, max_size=1400)


@settings(max_examples=50, deadline=None)
@given(_member_names, st.data())
def test_tar_build_parse_round_trip(names, data):
    """build_tar → iter_tar_members is the identity on (name, size),
    offsets land payloads exactly, and stdlib tarfile agrees — for
    arbitrary member lists incl. empty payloads and block-boundary
    sizes."""
    import io
    import tarfile

    from amadeus_spark.sources.webdataset import build_tar, iter_tar_members

    members = [(n, data.draw(_payloads)) for n in names]
    raw = build_tar(members)
    parsed = list(iter_tar_members(io.BytesIO(raw)))
    assert [(m["member"], m["size"]) for m in parsed] == [
        (n, len(d)) for n, d in members
    ]
    for m, (_, d) in zip(parsed, members):
        assert raw[m["offset"] : m["offset"] + m["size"]] == d
    if members:
        std = [
            (t.name, t.offset_data, t.size)
            for t in tarfile.open(fileobj=io.BytesIO(raw)).getmembers()
        ]
        assert std == [(m["member"], m["offset"], m["size"]) for m in parsed]


def _keep_best_py_key(score: int, i: int) -> str:
    """Python mirror of keep_best_key_frag's signed encoding."""
    from amadeus_spark.functions.dedup import _KEEP_BEST_CAP, KEEP_BEST_PAD

    s = (
        "0" + str(_KEEP_BEST_CAP - score).rjust(KEEP_BEST_PAD, "0")
        if score >= 0
        else "1" + str((-1) - score).rjust(KEEP_BEST_PAD, "0")
    )
    ii = (
        "1" + str(i).rjust(KEEP_BEST_PAD, "0")
        if i >= 0
        else "0" + str((i + _KEEP_BEST_CAP) + 1).rjust(KEEP_BEST_PAD, "0")
    )
    return s + ii


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # cluster label
            st.integers(  # score: FULL SIGNED int64 range
                min_value=-(2**63), max_value=2**63 - 1
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_keep_best_key_is_argmax(rows):
    """MIN of the padded key == (max score, then min id) argmax for
    the FULL SIGNED int64 score range — incl. int64 min/max, zero,
    negatives (the pre-fix clamp zone, where every negative-score doc
    tied at 0), and NEGATIVE ids (the id half of the encoding)."""
    by_cluster: dict[int, list] = {}
    for n, (c, s) in enumerate(rows):
        by_cluster.setdefault(c, []).append((n - 15, s))  # ids go negative
    for members in by_cluster.values():
        want = min(members, key=lambda t: (-t[1], t[0]))[0]
        got = min(members, key=lambda t: _keep_best_py_key(t[1], t[0]))[0]
        assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),  # score
            st.integers(-(2**63), 2**63 - 1),  # id
        ),
        min_size=1,
        max_size=12,
    )
)
def test_keep_best_frag_duckdb_matches_python_mirror(rows):
    """The SQL fragment text itself (as DuckDB executes it) agrees
    with the Python mirror on full-signed-range scores AND ids — this
    pins the fragment's arithmetic now that the gate oracle derives
    its argmax independently of it."""
    import duckdb

    from amadeus_spark.functions.dedup import keep_best_key_frag

    con = duckdb.connect()
    frag = keep_best_key_frag("score", "id")
    con.execute(
        "CREATE TABLE t (score BIGINT, id BIGINT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = [r[0] for r in con.execute(
        f"SELECT {frag} FROM t ORDER BY rowid"
    ).fetchall()]
    want = [_keep_best_py_key(s, i) for s, i in rows]
    assert got == want


_wds_names = st.text(
    alphabet=st.sampled_from("abcxyz._-/é中"), min_size=1, max_size=40
).filter(lambda s: not s.startswith("/") and ".." not in s)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            _wds_names,
            st.one_of(st.none(), st.sampled_from(["jpg", "txt", "seg.png"])),
            st.binary(max_size=1300),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_writer_member_blocks_round_trip(members, force_long):
    """The writer's per-member tar emission (_member_blocks, incl. GNU
    longname for >100-byte names) round-trips through BOTH the repo
    parser and stdlib tarfile, and its byte footprint matches the
    independent replay arithmetic (wds_golden._tar_member_bytes) that
    the shard-cut balance and the SQL fragment mirror."""
    import io
    import tarfile

    from amadeus_spark.sources.webdataset import (
        BLOCK,
        _member_blocks,
        iter_tar_members,
        member_name,
    )
    from amadeus_spark.sources.wds_golden import _tar_member_bytes

    stream = bytearray()
    expect = []
    pos = 0
    for i, (key, slot, data) in enumerate(members):
        if force_long and i == 0:
            key = "deep/" + "x" * 120 + key  # exercise the 'L' path
        name = member_name(key, slot)
        blob = _member_blocks(name, data)
        assert len(blob) == _tar_member_bytes(name, len(data))
        hdr_bytes = len(blob) - (len(data) + (-len(data)) % BLOCK)
        expect.append((name, pos + hdr_bytes, len(data), data))
        stream += blob
        pos += len(blob)
    stream += b"\x00" * (2 * BLOCK)
    ours = list(iter_tar_members(io.BytesIO(bytes(stream))))
    assert [(m["member"], m["offset"], m["size"]) for m in ours] == [
        (n, o, s) for n, o, s, _ in expect
    ]
    with tarfile.open(fileobj=io.BytesIO(bytes(stream))) as tf:
        std = [(m.name, m.offset_data, m.size) for m in tf.getmembers()]
        payloads = [tf.extractfile(m).read() for m in tf.getmembers()]
    assert std == [(n, o, s) for n, o, s, _ in expect]
    assert payloads == [d for _, _, _, d in expect]
