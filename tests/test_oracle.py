"""Runs every queries() entry against its oracle_sql() twin at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_matches

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck):
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle declared)")
    sdf = QUERIES[name](spark, SF_ORACLE)
    rel = duck.sql(ORACLES[name])
    assert_matches(name, sdf, rel)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
