"""Tracked persists — deterministic cache release for library callers.

Several operators persist a multi-consumer intermediate frame (LSH
signature frames, normalized embedding bases): the persist is
load-bearing — without it the scan+transform subtree re-executes once
per consumer (measured 3-5× slower; see memory/spark-perf-findings) —
but a query *builder* cannot unpersist before the DataFrame it returns
is acted on, because the cache only pays off during that action. In a
long-lived session each operator call therefore leaves one cached frame
behind (the round-3 advice flagged this on embedding_neardup_pairs).

Fix: operators register every such persist here; callers free them all
with :func:`release_cached` once results are materialized.
``spark.catalog.clearCache()`` is the blunt equivalent (bench.py calls
it between queries) but also evicts caches the *caller* owns; this
registry releases only the frames this library created.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: strong refs — a derived DataFrame does not keep its Python parent
#: alive, so a weakref could die while the JVM-side cache entry persists.
#: Entries are tiny (plan handles); release_cached() clears the list.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for later :func:`release_cached`."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every frame the library persisted; returns the count.

    Safe to call at any time — frames whose session died are skipped.
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session gone / already unpersisted
    return released
