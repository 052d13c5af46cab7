"""Bloom filter file index (Delta's bloomFilterIndex): per-file
bitmaps in _bloom/ sidecar parquet, built by each data commit under an
active spec, pruning read_version(key_in=...) point lookups. The
contract under test: NO false negatives ever (a present value's file
always survives), pre-index files kept conservatively, NULLs never
indexed, all-NULL/absent columns prune by construction, widening and
renames never detach the index, vacuum reclaims sidecars with their
data dirs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amadeus_spark.operators import versioned as V


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).selectExpr(
        "id AS k",
        f"'{tag}-' || CAST(id AS STRING) AS doc",
        "CAST(id % 7 AS INT) AS small",
    )


def _sidecar_dirs(root):
    b = os.path.join(root, V.BLOOM_DIR)
    return sorted(os.listdir(b)) if os.path.isdir(b) else []


def test_lifecycle_prunes_files_no_false_negatives(spark, root):
    # three disjoint single-file commits; index active for the last two
    V.commit_append(spark, root, _df(spark, 0, 100).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["doc"], fpp=0.01)
    V.commit_append(spark, root, _df(spark, 100, 200).coalesce(1))
    V.commit_append(spark, root, _df(spark, 200, 300).coalesce(1))
    assert len(_sidecar_dirs(root)) == 2  # pre-index commit unindexed
    # a probe living in ONE indexed file: the other indexed file is
    # pruned, the pre-index file is kept conservatively -> 2 scanned
    got = V.read_version(spark, root, key_in=["a-150"], key_col="doc")
    assert len(got.inputFiles()) == 2
    assert got.where("doc = 'a-150'").count() == 1
    # NO false negatives: every present probe's row is found
    probes = ["a-0", "a-99", "a-100", "a-199", "a-250"]
    got = V.read_version(spark, root, key_in=probes, key_col="doc")
    assert got.where(F.col("doc").isin(probes)).count() == len(probes)
    # an absent probe prunes every indexed file (fpp may keep some;
    # at 0.01 over 2 files a survivor is ~2% — accept <= full set)
    got = V.read_version(
        spark, root, key_in=["nowhere-1"], key_col="doc"
    )
    assert len(got.inputFiles()) <= 3
    # describe_detail surfaces the spec
    assert V.describe_detail(spark, root)["bloom"]["cols"] == ["doc"]
    h = [r["op"] for r in V.history(spark, root)]
    assert h[1] == "set_bloom_index"


def test_point_lookup_on_integral_key_and_stats_interplay(spark, root):
    # k is ALSO the stats col: stats prune by [min,max] first, bloom
    # refines within the surviving range
    V.commit_append(spark, root, _df(spark, 0, 50).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["k"])
    V.commit_append(spark, root, _df(spark, 50, 100).coalesce(1))
    V.commit_append(spark, root, _df(spark, 100, 150).coalesce(1))
    got = V.read_version(spark, root, key_in=[120], key_col="k")
    # stats alone drop the [0,50) and [50,100) files
    assert len(got.inputFiles()) == 1
    assert got.where("k = 120").count() == 1
    with pytest.raises(ValueError, match="does not match the integral"):
        V.read_version(spark, root, key_in=["120"], key_col="k")
    with pytest.raises(ValueError, match="not both"):
        V.read_version(
            spark, root, key_in=[1], key_range=(0, 2), key_col="k"
        )
    with pytest.raises(ValueError, match="key_in is empty"):
        V.read_version(spark, root, key_in=[], key_col="k")


def test_nulls_never_indexed_and_absent_col_prunes(spark, root):
    V.commit_append(
        spark, root,
        spark.range(5).selectExpr("id AS k", "CAST(NULL AS STRING) AS doc")
        .coalesce(1),
        ["k"],
    )
    V.set_bloom_index(spark, root, ["doc"])
    # all-NULL column: the sidecar has no rows for it -> pruned for
    # any probe (correct: no value can live there)
    V.commit_append(
        spark, root,
        spark.range(5, 10).selectExpr(
            "id AS k", "CAST(NULL AS STRING) AS doc").coalesce(1))
    V.commit_append(
        spark, root,
        spark.range(10, 15).selectExpr(
            "id AS k", "'x-' || CAST(id AS STRING) AS doc").coalesce(1))
    got = V.read_version(spark, root, key_in=["x-12"], key_col="doc")
    # pre-index all-NULL file kept; indexed all-NULL file pruned
    assert len(got.inputFiles()) == 2
    assert got.where("doc = 'x-12'").count() == 1


def test_widen_and_rename_never_detach_the_index(spark, root):
    V.commit_append(
        spark, root,
        spark.range(3).selectExpr(
            "CAST(id AS INT) AS k", "id * 2 AS payload").coalesce(1),
        ["k"],
    )
    V.set_bloom_index(spark, root, ["k"])
    V.commit_append(
        spark, root,
        spark.range(3, 6).selectExpr(
            "CAST(id AS INT) AS k", "id * 2 AS payload").coalesce(1))
    # widen AFTER some indexed files exist: probes hash through the
    # canonical bigint cast on both sides of the widening
    V.widen_column_type(spark, root, "k", "bigint")
    V.commit_append(
        spark, root,
        spark.range(6, 9).selectExpr(
            "id AS k", "id * 2 AS payload").coalesce(1))
    for probe, n in [(4, 1), (7, 1)]:
        got = V.read_version(spark, root, key_in=[probe], key_col="k")
        assert got.where(f"k = {probe}").count() == n
    # rename: the spec stores the frozen PHYSICAL name — lookups by
    # the new logical name keep pruning
    V.rename_column(spark, root, "k", "key_id")
    got = V.read_version(spark, root, key_in=[7], key_col="key_id")
    assert got.where("key_id = 7").count() == 1
    assert V.describe_detail(spark, root)["bloom"]["cols"] == ["k"]


def test_narrow_writer_omitting_bloom_col_prunes(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 5).coalesce(1), ["k"])
    V.add_column(spark, root, "extra", "string")
    V.set_bloom_index(spark, root, ["extra"])
    # narrow writer: no 'extra' column at all -> its file holds only
    # NULLs for it -> pruned for any probe on extra
    V.commit_append(spark, root, _df(spark, 5, 10).coalesce(1))
    V.commit_append(
        spark, root,
        _df(spark, 10, 15).selectExpr("*", "'e-' || k AS extra")
        .coalesce(1))
    got = V.read_version(spark, root, key_in=["e-12"], key_col="extra")
    assert len(got.inputFiles()) == 2  # pre-index + the carrying file
    assert got.where("extra = 'e-12'").count() == 1


def test_upsert_rewrite_reindexes_and_dv_stays_correct(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 100).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["doc"])
    # copy-on-write upsert rewrites the file under the active spec:
    # the rewritten file gets a sidecar (rewrites funnel through the
    # same commit path)
    V.commit_upsert(
        spark, root,
        _df(spark, 40, 45, "upd").coalesce(1), "k")
    got = V.read_version(spark, root, key_in=["upd-42"], key_col="doc")
    assert got.where("doc = 'upd-42'").count() == 1
    assert len(got.inputFiles()) == 1
    # DV delete: bitmap keeps the deleted value (false positive only,
    # never a resurrect — the DV anti-join still applies)
    V.commit_delete_where(spark, root, "k = 42", mode="dv")
    got = V.read_version(spark, root, key_in=["upd-42"], key_col="doc")
    assert got.where("doc = 'upd-42'").count() == 0


def test_drop_disables_and_vacuum_reclaims_sidecars(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 10).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["doc"])
    V.commit_append(spark, root, _df(spark, 10, 20).coalesce(1))
    assert len(_sidecar_dirs(root)) == 1
    v = V.drop_bloom_index(spark, root)
    assert V.drop_bloom_index(spark, root) == v  # no-op, no commit
    V.commit_append(spark, root, _df(spark, 20, 30).coalesce(1))
    assert len(_sidecar_dirs(root)) == 1  # no new sidecars post-drop
    # key_in still works, stats-only (falls back, no bloom refine)
    got = V.read_version(spark, root, key_in=[25], key_col="k")
    assert got.where("k = 25").count() == 1
    # full-rewrite optimize drops the old data dirs; vacuum reclaims
    # the orphaned sidecar together with them
    V.optimize(spark, root)
    V.vacuum(spark, root, keep_last=1, min_staging_age_s=0.0)
    assert _sidecar_dirs(root) == []
    assert V.read_version(spark, root).count() == 30


def test_spec_validation(spark, root):
    V.commit_append(
        spark, root,
        spark.range(3).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS x").coalesce(1),
        ["k"],
    )
    with pytest.raises(ValueError, match="only.*integral and string"):
        V.set_bloom_index(spark, root, ["x"])
    with pytest.raises(ValueError, match="no column"):
        V.set_bloom_index(spark, root, ["gone"])
    with pytest.raises(ValueError, match="fpp"):
        V.set_bloom_index(spark, root, ["k"], fpp=1.5)
    with pytest.raises(ValueError, match="at least one"):
        V.set_bloom_index(spark, root, [])
    # case-insensitive resolution, physical storage
    V.set_bloom_index(spark, root, ["K"])
    assert V.describe_detail(spark, root)["bloom"]["cols"] == ["k"]


def test_delete_keys_dv_prunes_and_deletes(spark, root):
    """commit_delete_keys: the right-to-be-forgotten fast path — the
    finding scan reads only the stats+bloom candidate files, the DV
    leg writes O(matched rows)."""
    V.commit_append(spark, root, _df(spark, 0, 100).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["doc"])
    V.commit_append(spark, root, _df(spark, 100, 200).coalesce(1))
    V.commit_append(spark, root, _df(spark, 200, 300).coalesce(1))
    v, n_rw, n_carry, n_del = V.commit_delete_keys(
        spark, root, ["a-150", "a-250"], "doc")
    assert (n_rw, n_carry, n_del) == (0, 3, 2)  # dv: zero rewrites
    got = V.read_version(spark, root)
    assert got.count() == 298
    assert got.where("doc IN ('a-150', 'a-250')").count() == 0
    # stats path: k is the stats col — candidates prune by range too
    v2 = V.commit_delete_keys(spark, root, [5, 7], "k", mode="rewrite")[0]
    assert V.read_version(spark, root).count() == 296
    # absent keys: no-op, no commit
    assert V.commit_delete_keys(spark, root, ["nope"], "doc") == (
        v2, 0, V.describe_detail(spark, root)["n_files"], 0)
    h = V.history(spark, root)
    assert [r["op"] for r in h[-2:]] == ["delete", "delete"]


def test_delete_keys_changefeed_and_validation(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 50).coalesce(1), ["k"])
    V.commit_delete_keys(
        spark, root, [10, 11], "k", changefeed=True, mode="rewrite")
    ch = V.table_changes(spark, root, 1, 1)
    assert {r["k"] for r in ch.where(
        "_change_type = 'delete'").collect()} == {10, 11}
    with pytest.raises(ValueError, match="at least one key"):
        V.commit_delete_keys(spark, root, [], "k")
    with pytest.raises(ValueError, match="NULL key"):
        V.commit_delete_keys(spark, root, [1, None], "k")
    with pytest.raises(ValueError, match="mode"):
        V.commit_delete_keys(spark, root, [1], "k", mode="zap")


def test_features_ratchet_guards_future_readers(spark, root):
    """The log features ratchet (Delta protocol features): commits
    record the union of capabilities their snapshot uses; a reader
    meeting an unknown feature refuses loudly instead of silently
    misreading (a checkpoint's explicit index schema would otherwise
    drop a future feature's columns mid-resolve)."""
    import json

    V.commit_append(spark, root, _df(spark, 0, 10).coalesce(1), ["k"])
    assert "features" not in V._read_manifest(spark, root, 0)
    V.set_bloom_index(spark, root, ["doc"])
    V.commit_delete_where(spark, root, "k = 3", mode="dv")
    m = V._read_manifest(spark, root, 2)
    assert set(m["features"]) == {"bloom-index", "deletion-vectors"}
    # monotonic: a later plain append keeps the union
    V.commit_append(spark, root, _df(spark, 10, 20).coalesce(1))
    assert set(V._read_manifest(spark, root, 3)["features"]) >= {
        "bloom-index", "deletion-vectors"}
    # an unknown feature refuses at segment read
    p = os.path.join(root, V.MANIFEST_DIR, "v3.json")
    man = json.load(open(p))
    man["features"].append("time-crystals")
    json.dump(man, open(p, "w"))
    with pytest.raises(RuntimeError, match="time-crystals"):
        V.read_version(spark, root)


def test_growing_the_spec_never_causes_false_negatives(spark, root):
    """Sidecar MARKER rows record which columns the build-time spec
    covered: a dir indexed before a column joined the spec must be
    KEPT for probes on that column (its absence of bitmap rows means
    'not indexed', not 'all NULL') — the false-negative hazard of
    re-running set_bloom_index with more columns."""
    V.commit_append(spark, root, _df(spark, 0, 10).coalesce(1), ["k"])
    V.set_bloom_index(spark, root, ["doc"])
    # this commit's sidecar covers ONLY doc
    V.commit_append(spark, root, _df(spark, 10, 20).coalesce(1))
    # grow the spec; later commits cover both
    V.set_bloom_index(spark, root, ["doc", "small"])
    V.commit_append(spark, root, _df(spark, 20, 30).coalesce(1))
    # probe on the NEW column: k=15 has small=1 and lives in the
    # dir indexed before 'small' joined the spec — it must be found
    got = V.read_version(spark, root, key_in=[1], key_col="small")
    assert got.where("k = 15").count() == 1
    # the doc-covered dir still prunes doc probes as before
    got = V.read_version(spark, root, key_in=["a-25"], key_col="doc")
    assert got.where("doc = 'a-25'").count() == 1


def test_widen_out_of_hash_family_refused_on_indexed_col(spark, root):
    """int→double is a legal widening in general but leaves the bloom
    index's canonical-bigint hash family: on an indexed column it must
    refuse (review finding r15) — otherwise every key_in lookup and
    keyed delete breaks on a state the ALTER itself permitted."""
    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(1, 5, 7)], "k bigint, v int, w int").coalesce(1),
        ["k"],
    )
    V.set_bloom_index(spark, root, ["v"])
    with pytest.raises(ValueError, match="drop_bloom_index first"):
        V.widen_column_type(spark, root, "v", "double")
    # inside the family stays fine
    V.widen_column_type(spark, root, "v", "bigint")
    # un-indexed columns widen to double as before
    V.widen_column_type(spark, root, "w", "double")
    # and after dropping the index the refusal lifts (int-family col)
    V.drop_bloom_index(spark, root)
    d = dict(V.read_version(spark, root).dtypes)
    assert d["v"] == "bigint" and d["w"] == "double"
