"""Local replica of the driver's correctness gate: run the Spark query and
the DuckDB oracle side-by-side, compare row count + column names + sorted
values. Exact equality is the target (the driver hashes values); float
columns additionally report max abs diff so near-misses are diagnosable."""

from __future__ import annotations

import math
from typing import Any


def _normalize(rows: list[dict[str, Any]]) -> list[tuple]:
    """Sort columns by name, then rows by stringified values — an
    order-insensitive canonical form (mirrors the driver's compare)."""
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(r[c] for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, duck_rel) -> dict[str, Any]:
    spark_rows = [r.asDict() for r in spark_df.collect()]
    duck_df = duck_rel.fetchdf()
    duck_rows = duck_df.to_dict("records")

    report: dict[str, Any] = {
        "spark_rows": len(spark_rows),
        "oracle_rows": len(duck_rows),
        "rowcount_match": len(spark_rows) == len(duck_rows),
    }
    spark_cols = sorted(spark_df.columns)
    duck_cols = sorted(duck_df.columns)
    report["spark_cols"] = spark_cols
    report["oracle_cols"] = duck_cols
    report["schema_match"] = spark_cols == duck_cols
    if not (report["rowcount_match"] and report["schema_match"]):
        report["values_match"] = False
        return report

    a, b = _normalize(spark_rows), _normalize(duck_rows)
    exact = True
    max_float_diff = 0.0
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                # None vs NaN: Spark returns None, pandas returns NaN
                fa = float("nan") if va is None else float(va)
                fb = float("nan") if vb is None else float(vb)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    exact = False
                    max_float_diff = max(max_float_diff, abs(fa - fb))
            else:
                if hasattr(vb, "item"):  # numpy scalar from pandas
                    vb = vb.item()
                if va != vb:
                    exact = False
                    max_float_diff = math.inf
    report["values_match"] = exact
    report["max_float_diff"] = max_float_diff
    return report


def assert_matches(name: str, spark_df, duck_rel) -> None:
    rep = compare(spark_df, duck_rel)
    assert rep["rowcount_match"], f"{name}: rowcount {rep}"
    assert rep["schema_match"], f"{name}: schema {rep}"
    assert rep["values_match"], f"{name}: values {rep}"
