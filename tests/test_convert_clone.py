"""CONVERT TO DELTA + CLONE: adopt an existing parquet directory as a
versioned table, and branch a snapshot into an independent table — both
zero data movement on a local filesystem (hard links; content never
rewritten), the lakehouse adopt/branch shapes a 100 TB lake needs."""

from __future__ import annotations

import os

import pytest

from amadeus_spark.operators import versioned as V


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).selectExpr("id AS k", f"'{tag}' AS v")


def _inodes(d):
    out = {}
    for cur, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(cur, f)
                out[p] = os.stat(p).st_ino
    return out


def test_convert_adopts_without_copying(spark, root, tmp_path):
    src = str(tmp_path / "lake")
    _df(spark, 0, 100, "a").repartitionByRange(4, "k").write.parquet(src)
    src_inodes = _inodes(src)
    v, n_files, n_rows = V.convert_to_versioned(spark, root, src, ["k"])
    assert (v, n_rows) == (0, 100) and n_files >= 4
    # ZERO data movement: every adopted file is a hard link of a
    # source file (same inode), never a copy
    tbl_inodes = _inodes(os.path.join(root, V.DATA_DIR))
    assert set(tbl_inodes.values()) == set(src_inodes.values())
    assert all(os.stat(p).st_nlink == 2 for p in src_inodes)
    got = V.read_version(spark, root)
    assert got.count() == 100 and got.columns == ["k", "v"]
    # harvested stats prune immediately: an upsert touches ONE file
    upd = spark.createDataFrame([(5, "new")], "k bigint, v string")
    _, rewritten, carried = V.commit_upsert(spark, root, upd, "k")
    assert rewritten == 1 and carried == n_files - 1
    vals = {r["k"]: r["v"] for r in V.read_version(spark, root).collect()}
    assert vals[5] == "new" and vals[50] == "a"
    # the whole table lifecycle works on the adopted files
    assert V.read_version(spark, root, 0).count() == 100  # time travel
    assert V.history(spark, root)[0]["op"] == "convert"


def test_convert_guards(spark, root, tmp_path):
    src = str(tmp_path / "lake")
    with pytest.raises(FileNotFoundError):
        V.convert_to_versioned(spark, root, str(tmp_path / "empty"))
    _df(spark, 0, 5, "a").coalesce(1).write.parquet(src)
    V.convert_to_versioned(spark, root, src)
    with pytest.raises(ValueError, match="already a versioned table"):
        V.convert_to_versioned(spark, root, src)


def test_clone_pins_snapshot_and_diverges(spark, root, tmp_path):
    dst = str(tmp_path / "branch")
    V.commit_append(spark, root, _df(spark, 0, 50, "a").coalesce(1), ["k"])
    V.commit_append(spark, root, _df(spark, 50, 100, "b").coalesce(1))
    v, n_files, n_rows = V.clone_table(spark, root, dst, version=0)
    assert (v, n_files, n_rows) == (0, 1, 50)  # pinned at v0
    assert V.read_version(spark, dst).count() == 50
    # zero copy: shared inodes
    src_ino = set(_inodes(os.path.join(root, V.DATA_DIR)).values())
    dst_ino = set(_inodes(os.path.join(dst, V.DATA_DIR)).values())
    assert dst_ino <= src_ino and len(dst_ino) == 1
    # full independence: writes on either side never leak
    V.commit_append(spark, dst, _df(spark, 900, 910, "clone").coalesce(1))
    V.commit_upsert(
        spark, root,
        spark.createDataFrame([(3, "SRC")], "k bigint, v string"), "k")
    assert V.read_version(spark, dst).count() == 60
    assert V.read_version(spark, dst).where("v = 'SRC'").count() == 0
    assert V.read_version(spark, root).where("v = 'clone'").count() == 0
    assert V.history(spark, dst)[0]["op"] == "clone"
    assert V._read_manifest(spark, dst, 0)["cloned_from"]["version"] == 0


def test_clone_carries_dv_constraints_and_mapping(spark, root, tmp_path):
    dst = str(tmp_path / "branch")
    V.commit_append(
        spark, root,
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS val")
        .coalesce(1), ["k"])
    V.rename_column(spark, root, "val", "score")
    V.set_check_constraint(spark, root, "nonneg", "score >= 0")
    V.commit_delete_where(spark, root, "k % 10 = 3", mode="dv")
    V.clone_table(spark, root, dst)
    got = V.read_version(spark, dst)
    # the DV rides along: deleted rows stay deleted in the clone
    assert got.count() == 90 and got.where("k % 10 = 3").count() == 0
    assert got.columns == ["k", "score"]  # mapping carried
    d = V.describe_detail(spark, dst)
    assert d["constraints"] == {"nonneg": "score >= 0"}
    assert d["column_mapping"] == {"score": "val"}
    # constraints ENFORCE on the clone
    with pytest.raises(Exception, match="CHECK constraint 'nonneg'"):
        V.commit_append(
            spark, dst,
            spark.createDataFrame([(500, -1)], "k bigint, score bigint"))
    # vacuuming the SOURCE never breaks the clone (links hold content)
    V.optimize(spark, root, n_files=1)
    V.vacuum(spark, root, keep_last=1, min_staging_age_s=0.0)
    assert V.read_version(spark, dst).count() == 90


def test_clone_guards(spark, root, tmp_path):
    dst = str(tmp_path / "branch")
    with pytest.raises(FileNotFoundError):
        V.clone_table(spark, root, dst)
    V.commit_append(spark, root, _df(spark, 0, 5, "a").coalesce(1), ["k"])
    V.clone_table(spark, root, dst)
    with pytest.raises(ValueError, match="already a versioned table"):
        V.clone_table(spark, root, dst)


def test_convert_merges_evolved_footers(spark, root, tmp_path):
    """A schema-evolved lake (older files missing a later-added column)
    converts with the UNION schema — the late column must not be lost
    to whichever single footer Spark samples."""
    src = str(tmp_path / "lake")
    _df(spark, 0, 5, "a").coalesce(1).write.parquet(src)
    spark.range(10, 15).selectExpr(
        "id AS k", "'b' AS v", "id * 2 AS w"
    ).coalesce(1).write.mode("append").parquet(src)
    V.convert_to_versioned(spark, root, src, ["k"])
    got = V.read_version(spark, root)
    assert set(got.columns) == {"k", "v", "w"}
    vals = {r["k"]: r["w"] for r in got.collect()}
    assert vals[0] is None and vals[10] == 20


def test_convert_refuses_nested_and_query_string(spark, root, tmp_path):
    src = str(tmp_path / "lake")
    _df(spark, 0, 5, "a").write.partitionBy("v").parquet(src)
    with pytest.raises(ValueError, match="FLAT directories only"):
        V.convert_to_versioned(spark, root, src)
    with pytest.raises(ValueError, match="plain"):
        V.convert_to_versioned(spark, root, src + "?region=x")


def test_convert_race_collides_and_cleans_up(spark, root, tmp_path,
                                             monkeypatch):
    """A table created between convert's fresh-root check and its
    publish must COLLIDE (version pinned to 0), never be silently
    buried under the adopted files — and the loser's adopted staging
    dir is reclaimed."""
    src = str(tmp_path / "lake")
    _df(spark, 0, 5, "a").coalesce(1).write.parquet(src)
    orig = V._write_manifest_atomic
    state = {"armed": True}

    def racy(sp, rt, version, manifest):
        if state["armed"]:
            state["armed"] = False
            V.commit_append(spark, root, _df(spark, 50, 55, "win"), ["k"])
        return orig(sp, rt, version, manifest)

    monkeypatch.setattr(V, "_write_manifest_atomic", racy)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        V.convert_to_versioned(spark, root, src, ["k"])
    # the winner's table is intact and the loser left no orphan dirs
    assert V.read_version(spark, root).count() == 5
    assert V.read_version(spark, root).where("v = 'win'").count() == 5
    dirs = os.listdir(os.path.join(root, V.DATA_DIR))
    assert len(dirs) == 1  # only the winner's staging dir


def test_changefeed_spans_convert_and_clone(spark, root, tmp_path):
    """CDF parity with Delta: neither CONVERT nor CLONE serves change
    rows — a feed spanning version 0 skips them instead of raising."""
    src = str(tmp_path / "lake")
    _df(spark, 0, 5, "a").coalesce(1).write.parquet(src)
    V.convert_to_versioned(spark, root, src, ["k"])
    V.commit_append(spark, root, _df(spark, 10, 12, "b"))
    ch = V.table_changes(spark, root, 0)
    assert sorted(r["k"] for r in ch.collect()) == [10, 11]
    dst = str(tmp_path / "branch")
    V.clone_table(spark, root, dst)
    V.commit_append(spark, dst, _df(spark, 20, 21, "c"))
    ch2 = V.table_changes(spark, dst, 0)
    assert sorted(r["k"] for r in ch2.collect()) == [20]


def test_clone_history_reads_as_relink(spark, root, tmp_path):
    """A clone of a source whose data landed at the SOURCE's v0 (dirs
    named commit-v0-*) must still read as files_relinked, never as
    ingest — by-reference semantics, not the dir-name heuristic."""
    dst = str(tmp_path / "branch")
    V.commit_append(spark, root, _df(spark, 0, 5, "a").coalesce(1), ["k"])
    V.clone_table(spark, root, dst)
    h0 = V.history(spark, dst)[0]
    assert h0["op"] == "clone"
    assert h0["files_added"] == 0 and h0["rows_added"] == 0
    assert h0["files_relinked"] == 1
