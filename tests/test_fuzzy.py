"""Deletion-neighborhood fuzzy join (operators/fuzzy.py): exact edit
semantics on crafted names, COMPLETENESS vs brute-force levenshtein on
random strings (blocking must not lose pairs), and the refused-depth
contract."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from amadeus_spark.operators import fuzzy


def _pairs(spark, names):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    return {
        (r["k1"], r["k2"]): r["dist"]
        for r in fuzzy.fuzzy_self_join(df, "k", "n").collect()
    }


def test_edit_kinds(spark):
    names = [
        "alpha",  # 0
        "alphb",  # 1: substitution of 0
        "alpha!",  # 2: insertion vs 0
        "alph",  # 3: deletion vs 0
        "alpha",  # 4: exact duplicate of 0
        "zzzzz",  # 5: far from everything
        "blphb",  # 6: dist 2 from 0 -> must NOT pair with 0
    ]
    got = _pairs(spark, names)
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(0, 3)] == 1
    assert got[(0, 4)] == 0  # identity variant catches exact dupes
    assert (0, 6) not in got
    assert not any(5 in p for p in got)
    assert got[(1, 6)] == 1  # blphb is one sub from alphb


def test_completeness_vs_bruteforce(spark):
    rng = random.Random(42)
    alphabet = "abc"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 6)))
        for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    got = set(
        (r["k1"], r["k2"])
        for r in fuzzy.fuzzy_self_join(df, "k", "n").collect()
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = set(
        (i, j)
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 1
    )
    assert want, "degenerate test data"
    assert got == want  # blocking loses nothing, verify adds nothing


def _brute_pairs(names, d):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    return set(
        (i, j)
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= d
    )


def test_d2_completeness_vs_bruteforce(spark):
    """Depth-2 blocking must find EVERY pair within edit distance 2 —
    including the 2-substitutions-at-different-positions case that
    1-deletion blocking provably misses — and nothing beyond."""
    rng = random.Random(7)
    alphabet = "ab"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 7)))
        for _ in range(60)
    ] + ["alpha", "blphb", "xx", "x", ""]  # dist-2 subs pair + shorties
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    got = {
        (r["k1"], r["k2"]): r["dist"]
        for r in fuzzy.fuzzy_self_join(df, "k", "n", max_dist=2).collect()
    }
    want = _brute_pairs(names, 2)
    assert want - set(got) == set(), "blocking lost pairs"
    assert set(got) == want
    ia, ib = len(names) - 5, len(names) - 4  # alpha vs blphb: two subs
    assert got[(ia, ib)] == 2


def test_d2_duckdb_variants_match_spark(spark):
    """The two dialects' depth-2 variant fragments enumerate the same
    SET (blocking parity is what a dual-dialect gate would rely on)."""
    import duckdb

    names = ["alpha", "ab", "a", "", "zzzz"]
    sdf = spark.createDataFrame([(n,) for n in names], "n string")
    sv = {
        r["n"]: sorted(set(r["vs"]))
        for r in sdf.select(
            "n",
            F.expr(fuzzy.deletion_variants_frag("n", "spark", 2)).alias("vs"),
        ).collect()
    }
    con = duckdb.connect()
    frag = fuzzy.deletion_variants_frag("n", "duckdb", 2)
    for n in names:
        dv = con.execute(
            f"SELECT {frag} FROM (SELECT ? AS n)", [n]
        ).fetchone()[0]
        assert sorted(set(dv)) == sv[n], n


@pytest.mark.parametrize("d", [1, 2, 3, 4])
def test_lookup_join_matches_bruteforce(spark, d):
    """Cross-table lookup (probe vs dictionary): blocking completeness
    and verify exactness against brute-force levenshtein over the full
    cross product — deletion blocking at d<=2, one-directional
    PassJoin segment blocking at d>=3 (right side indexed, left side
    probed; completeness is per-pair pigeonhole on the RIGHT string's
    segments)."""
    rng = random.Random(11)
    probes = [
        "".join(rng.choice("abc") for _ in range(rng.randint(2, 6)))
        for _ in range(40)
    ]
    corpus = [
        "".join(rng.choice("abc") for _ in range(rng.randint(2, 6)))
        for _ in range(30)
    ] + ["", "a"]
    lt = spark.createDataFrame(
        [(i, n) for i, n in enumerate(probes)], "k long, n string"
    )
    rt = spark.createDataFrame(
        [(j, n) for j, n in enumerate(corpus)], "k long, n string"
    )
    got = {
        (r["lk"], r["rk"]): r["dist"]
        for r in fuzzy.fuzzy_lookup_join(
            lt, rt, "k", "n", "k", "n", max_dist=d
        ).collect()
    }

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (i, j): lev(p, c)
        for i, p in enumerate(probes)
        for j, c in enumerate(corpus)
        if lev(p, c) <= d
    }
    assert got == want


def test_deeper_budget_refused(spark):
    df = spark.createDataFrame([(1, "x")], "k long, n string")
    with pytest.raises(ValueError):
        fuzzy.fuzzy_self_join(
            df, "k", "n", max_dist=fuzzy.MAX_SEGMENT_DIST + 1
        )
    with pytest.raises(ValueError):
        fuzzy.deletion_variants_frag("n", "spark", depth=3)
    with pytest.raises(ValueError):
        fuzzy.fuzzy_self_join_segments(df, "k", "n", 0)


def test_d3_completeness_vs_bruteforce(spark):
    """d=3 routes to pigeonhole segment blocking: it must find EVERY
    pair within edit distance 3 over random low-alphabet strings
    (where near-pairs are dense) plus the short/empty edge strings,
    and the banded verify must add nothing beyond."""
    rng = random.Random(13)
    names = [
        "".join(rng.choice("ab") for _ in range(rng.randint(2, 9)))
        for _ in range(50)
    ] + ["", "x", "xx", "alphabetical", "alphabetize"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    got = {
        (r["k1"], r["k2"]): r["dist"]
        for r in fuzzy.fuzzy_self_join(df, "k", "n", max_dist=3).collect()
    }
    want = _brute_pairs(names, 3)
    assert want - set(got) == set(), "segment blocking lost pairs"
    assert set(got) == want
    ia, ib = len(names) - 2, len(names) - 1
    assert got[(ia, ib)] == 3  # alphabetical ~ alphabetize


@pytest.mark.parametrize("d", [1, 2])
def test_segments_agree_with_deletions(spark, d):
    """Cross-validation of the two blocking schemes at the budgets both
    serve: identical pair sets and distances on the same data."""
    rng = random.Random(29)
    names = [
        "".join(rng.choice("abc") for _ in range(rng.randint(2, 7)))
        for _ in range(60)
    ] + ["", "a"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    via_del = {
        (r["k1"], r["k2"]): r["dist"]
        for r in fuzzy.fuzzy_self_join(df, "k", "n", max_dist=d).collect()
    }
    via_seg = {
        (r["k1"], r["k2"]): r["dist"]
        for r in fuzzy.fuzzy_self_join_segments(df, "k", "n", d).collect()
    }
    assert via_del == via_seg


def test_d3_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "k long, n string"
    )
    plan = (
        fuzzy.fuzzy_self_join(df, "k", "n", max_dist=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "Join" in line:
            assert "levenshtein" not in line, line


@pytest.mark.parametrize("d", [1, 2])
def test_no_cartesian_in_plan(spark, d):
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "k long, n string"
    )
    plan = (
        fuzzy.fuzzy_self_join(df, "k", "n", max_dist=d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the verify must run in the codegen'd Project, never interpreted
    # inside the join condition (measured 5x there)
    for line in plan.splitlines():
        if "Join" in line:
            assert "levenshtein" not in line, line


def test_probe_pipeline_matches_hof_spec(spark):
    """The codegen explode pipeline (_probe_signatures) must emit the
    same signature SET as the nested-HOF fragment that documents the
    scheme — the fragment is the spec, the pipeline is the fast path."""
    names = ["alphabet", "", "x", "ab", "zzzzzzzzzzzzzzzz", "abcabc"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "k long, n string"
    )
    base = df.selectExpr("k", "n")
    for d in (1, 3):
        fast = {
            (r["k"], r["s"])
            for r in fuzzy._probe_signatures(base, d).collect()
        }
        spec = {
            (r["k"], r["s"])
            for r in base.select(
                "k",
                F.explode(
                    F.expr(fuzzy.segment_signatures_frag("n", "probe", d))
                ).alias("s"),
            ).collect()
        }
        assert fast == spec, d


def test_segment_skew_probe_fires_on_constant_prefix(spark):
    """The entropy guard (segment_skew_probe): a corpus of strings
    sharing a long constant prefix funnels index segments into a few
    huge buckets — the documented PassJoin cost cliff. The probe must
    flag it, and skew_probe=True must warn while returning the SAME
    pairs as the unguarded path (cost diagnostic, never a semantics
    change)."""
    import warnings

    from amadeus_spark.operators.fuzzy import (
        fuzzy_self_join_segments,
        segment_skew_probe,
    )

    prefix = "COMMON-WAREHOUSE-PREFIX-0000-"
    rows = [(i, f"{prefix}{i:04d}") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, n string")
    stats = segment_skew_probe(df, "n", 3)
    assert stats["degenerate"], stats
    assert stats["skew"] > 8.0
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        guarded = fuzzy_self_join_segments(df, "k", "n", 3, skew_probe=True)
        got = sorted((r["k1"], r["k2"]) for r in guarded.collect())
    assert any("degenerate" in str(w.message) for w in caught)
    plain = fuzzy_self_join_segments(df, "k", "n", 3)
    assert got == sorted((r["k1"], r["k2"]) for r in plain.collect())


def test_segment_skew_probe_quiet_on_entropic_corpus(spark):
    """Hash-entropic strings spread segments near-uniformly: the probe
    must NOT flag them and skew_probe=True must stay silent."""
    import hashlib
    import warnings

    from amadeus_spark.operators.fuzzy import (
        fuzzy_self_join_segments,
        segment_skew_probe,
    )

    rows = [
        (i, hashlib.md5(str(i).encode()).hexdigest()[:20])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k long, n string")
    stats = segment_skew_probe(df, "n", 3)
    assert not stats["degenerate"], stats
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fuzzy_self_join_segments(df, "k", "n", 3, skew_probe=True).collect()
    assert not [w for w in caught if "degenerate" in str(w.message)]


def test_lookup_segments_probe_default_on_at_d5(spark):
    """fuzzy_lookup_join_segments defaults skew_probe=None → ON at
    max_dist >= 5 (the expensive probe-fan-out regime; the index side
    is user dictionaries where long-shared-prefix corpora are common):
    a degenerate DICTIONARY warns without changing the matched pairs,
    an explicit skew_probe=False silences it, and d=3 stays probe-free
    by default (no warning even on the same degenerate corpus)."""
    import warnings

    from amadeus_spark.operators.fuzzy import fuzzy_lookup_join_segments

    prefix = "COMMON-WAREHOUSE-PREFIX-0000-"
    dico = spark.createDataFrame(
        [(i, f"{prefix}{i:04d}") for i in range(200)], "k long, n string"
    )
    probes = spark.createDataFrame(
        [(1000 + i, f"{prefix}{i:04d}X") for i in range(0, 200, 20)],
        "k long, n string",
    )

    def pairs(**kw):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = sorted(
                (r["lk"], r["rk"], r["dist"])
                for r in fuzzy_lookup_join_segments(
                    probes, dico, "k", "n", "k", "n", **kw
                ).collect()
            )
        warned = any("degenerate" in str(w.message) for w in caught)
        return got, warned

    on_default, warned_default = pairs(max_dist=5)
    assert warned_default
    off_explicit, warned_off = pairs(max_dist=5, skew_probe=False)
    assert not warned_off
    assert on_default == off_explicit  # diagnostic only, never semantics
    _, warned_d3 = pairs(max_dist=3)
    assert not warned_d3
