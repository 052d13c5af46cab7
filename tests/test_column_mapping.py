"""Column mapping (Delta columnMapping, name mode): RENAME/DROP as
metadata-only commits — physical parquet names are frozen at column
birth, logical names move over them, dropped physicals are tombstoned
so a re-added name can never resurrect old values. Time travel, CDF and
restore all read through each snapshot's own mapping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amadeus_spark.operators import versioned as V


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _df(spark, lo, hi, tag, cols="k, v"):
    k, v = [c.strip() for c in cols.split(",")]
    return spark.range(lo, hi).selectExpr(
        f"id AS {k}", f"'{tag}' AS {v}"
    )


def _physical_cols(root, version_dir_prefix=None):
    """Footer column names across the table's data files."""
    import pyarrow.parquet as pq

    out = {}
    ddir = os.path.join(root, V.DATA_DIR)
    for d in sorted(os.listdir(ddir)):
        for f in sorted(os.listdir(os.path.join(ddir, d))):
            if f.endswith(".parquet"):
                out[(d, f)] = pq.read_schema(
                    os.path.join(ddir, d, f)
                ).names
    return out


def test_rename_lifecycle_time_travel_and_cdf(spark, root):
    V.commit_append(
        spark, root, _df(spark, 0, 10, "a").coalesce(1), ["k"],
        changefeed=True,
    )
    v1 = V.rename_column(spark, root, "v", "label")
    assert V.history(spark, root)[-1]["op"] == "rename_column"
    # current read serves the NEW logical name, same values
    cur = V.read_version(spark, root)
    assert cur.columns == ["k", "label"]
    assert cur.where("label = 'a'").count() == 10
    # mapping recorded: logical label -> physical v
    assert V.describe_detail(spark, root)["column_mapping"] == {
        "label": "v"
    }
    # writes through the new name land under the OLD physical name
    upd = spark.createDataFrame([(3, "B")], "k bigint, label string")
    v2, rewritten, _ = V.commit_upsert(
        spark, root, upd, "k", changefeed=True
    )
    assert rewritten == 1
    got = {r["k"]: r["label"] for r in V.read_version(spark, root).collect()}
    assert got[3] == "B" and got[0] == "a"
    phys = _physical_cols(root)
    assert all("v" in names and "label" not in names
               for names in phys.values())
    # TIME TRAVEL serves the PRE-RENAME logical name
    old = V.read_version(spark, root, 0)
    assert old.columns == ["k", "v"]
    assert old.where("v = 'a'").count() == 10
    # CDF ACROSS THE RENAME: one feed, ending-version logical names
    # unify rows from before the rename by physical identity
    ch = V.table_changes(spark, root, 0)
    assert "label" in ch.columns and "v" not in ch.columns
    by = {(r["_commit_version"], r["_change_type"], r["k"]): r["label"]
          for r in ch.collect()}
    assert by[(0, "insert", 3)] == "a"          # pre-rename insert
    assert by[(v2, "update_preimage", 3)] == "a"
    assert by[(v2, "update_postimage", 3)] == "B"
    assert v1 == 1
    # streaming feed schema serves current logical names too
    assert "label" in V.stream_table_changes(spark, root).columns


def test_rename_prune_key_still_prunes(spark, root):
    for lo in (0, 1000):
        V.commit_append(
            spark, root, _df(spark, lo, lo + 100, "base").coalesce(1),
            ["k"],
        )
    V.rename_column(spark, root, "k", "id")
    upd = spark.createDataFrame([(1005, "new")], "id bigint, v string")
    v, rewritten, carried = V.commit_upsert(spark, root, upd, "id")
    assert (rewritten, carried) == (1, 1)  # stats pruning through the map
    got = {r["id"]: r["v"] for r in V.read_version(spark, root).collect()}
    assert got[1005] == "new" and got[5] == "base"
    # read-side key_range pruning translates too
    assert V.read_version(
        spark, root, key_col="id", key_range=(0, 50)
    ).count() == 100  # file-level pruning keeps the whole first file


def test_drop_and_readd_never_resurrects(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 5, "old").coalesce(1), ["k"])
    V.drop_column(spark, root, "v")
    assert V.read_version(spark, root).columns == ["k"]
    # re-ADD a column with the SAME logical name: fresh physical via
    # the tombstone — pre-drop values must NOT come back
    V.commit_append(
        spark, root, _df(spark, 10, 15, "new").coalesce(1)
    )
    got = {r["k"]: r["v"] for r in V.read_version(spark, root).collect()}
    assert all(got[k] is None for k in range(0, 5))      # no resurrection
    assert all(got[k] == "new" for k in range(10, 15))
    # the fresh physical name is uuid-suffixed, tombstone recorded
    seg = V._read_manifest(spark, root, V.current_version(spark, root))
    assert seg["dropped_physical"] == ["v"]
    assert seg["column_mapping"]["v"].startswith("v_")
    # time travel to the pre-drop snapshot still serves the old values
    old = {r["k"]: r["v"] for r in V.read_version(spark, root, 0).collect()}
    assert all(old[k] == "old" for k in range(0, 5))


def test_restore_across_rename_rolls_mapping_back(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 5, "a").coalesce(1), ["k"])
    V.rename_column(spark, root, "v", "w")
    V.commit_upsert(
        spark, root,
        spark.createDataFrame([(0, "W")], "k bigint, w string"), "k")
    v, relinked, removed = V.restore_version(spark, root, 0)
    cur = V.read_version(spark, root)
    assert cur.columns == ["k", "v"]
    assert {r["v"] for r in cur.collect()} == {"a"}
    assert V.describe_detail(spark, root)["column_mapping"] == {}
    # and the table keeps working: rename again, write, read
    V.rename_column(spark, root, "v", "z")
    V.commit_upsert(
        spark, root,
        spark.createDataFrame([(1, "Z")], "k bigint, z string"), "k")
    got = {r["k"]: r["z"] for r in V.read_version(spark, root).collect()}
    assert got[1] == "Z" and got[0] == "a"


def test_rename_readd_old_name_gets_fresh_physical(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 3, "a").coalesce(1), ["k"])
    V.rename_column(spark, root, "v", "label")
    # a NEW column reusing the old logical name "v": physical "v" is
    # taken (by label) -> fresh uuid physical; label values untouched
    wide = spark.range(10, 13).selectExpr(
        "id AS k", "'lab' AS label", "'fresh' AS v"
    )
    V.commit_append(spark, root, wide)
    seg = V._read_manifest(spark, root, V.current_version(spark, root))
    assert seg["column_mapping"]["label"] == "v"
    assert seg["column_mapping"]["v"].startswith("v_")
    got = {r["k"]: (r["label"], r["v"])
           for r in V.read_version(spark, root).collect()}
    assert got[0] == ("a", None) and got[10] == ("lab", "fresh")


def test_rename_drop_guards(spark, root):
    V.commit_append(spark, root, _df(spark, 0, 3, "a").coalesce(1), ["k"])
    with pytest.raises(ValueError, match="no column"):
        V.rename_column(spark, root, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        V.rename_column(spark, root, "v", "k")
    with pytest.raises(ValueError, match="reserved"):
        V.rename_column(spark, root, "v", "__dv_dir")
    with pytest.raises(ValueError, match="no column"):
        V.drop_column(spark, root, "nope")
    V.drop_column(spark, root, "v")
    with pytest.raises(ValueError, match="only column"):
        V.drop_column(spark, root, "k")
    # constraint-referenced columns refuse rename/drop
    root2 = root + "2"
    V.commit_append(
        spark, root2,
        spark.createDataFrame([(1, 5)], "k bigint, val bigint")
        .coalesce(1), ["k"])
    V.set_check_constraint(spark, root2, "nonneg", "val >= 0")
    with pytest.raises(ValueError, match="CHECK constraints"):
        V.rename_column(spark, root2, "val", "amount")
    with pytest.raises(ValueError, match="CHECK constraints"):
        V.drop_column(spark, root2, "val")
    # unreferenced columns still rename under constraints
    V.rename_column(spark, root2, "k", "id")
    assert V.read_version(spark, root2).columns == ["id", "val"]


def test_optimize_and_dv_after_rename(spark, root):
    for lo in (0, 100):
        V.commit_append(
            spark, root, _df(spark, lo, lo + 100, "a").coalesce(1), ["k"]
        )
    V.rename_column(spark, root, "k", "id")
    # DV delete through the renamed predicate column
    v, _, _, n_del = V.commit_delete_where(
        spark, root, "id % 10 = 0", mode="dv"
    )
    assert n_del == 20
    assert V.read_version(spark, root).count() == 180
    # compaction range-sorts by the stats column's LOGICAL twin and
    # purges the DVs
    V.optimize(spark, root, n_files=1)
    df = V.read_version(spark, root)
    assert df.columns == ["id", "v"] and df.count() == 180
    assert V.describe_detail(spark, root)["dv_files"] == 0


def test_rename_race_rejects_rebase(spark, root, monkeypatch):
    """An interposed RENAME changes what the loser's staged physical
    files mean — classification must refuse and recompute."""
    V.commit_append(spark, root, _df(spark, 0, 10, "a").coalesce(1), ["k"])
    orig = V._write_manifest_atomic
    state = {"armed": True}

    def racy(sp, rt, version, manifest):
        if state["armed"]:
            state["armed"] = False
            V.rename_column(spark, root, "v", "w")
        return orig(sp, rt, version, manifest)

    monkeypatch.setattr(V, "_write_manifest_atomic", racy)
    calls = {"n": 0}

    def closure():
        calls["n"] += 1
        # the retry re-resolves: second attempt must use the NEW name
        cols = V.read_version(spark, root).columns
        payload = "'x' AS " + ("w" if "w" in cols else "v")
        return V.commit_append(
            spark, root,
            spark.range(100, 105).selectExpr("id AS k", payload))

    V.commit_with_retry(closure)
    assert calls["n"] == 2
    got = V.read_version(spark, root)
    assert got.columns == ["k", "w"]
    assert got.where("w = 'x'").count() == 5


def test_upsert_race_rebases_through_renamed_prune_key(
    spark, root, monkeypatch
):
    """The conflict checker's key-range proof must read entry stats
    under the PHYSICAL key: after rename k->id, disjoint racing upserts
    on 'id' still re-base (stats live under physical 'k')."""
    for lo in (0, 1000):
        V.commit_append(
            spark, root, _df(spark, lo, lo + 100, "base").coalesce(1),
            ["k"],
        )
    V.rename_column(spark, root, "k", "id")
    orig = V._write_manifest_atomic
    state = {"armed": True}

    def racy(sp, rt, version, manifest):
        if state["armed"]:
            state["armed"] = False
            V.commit_upsert(
                spark, root,
                spark.createDataFrame([(1001, "win")], "id bigint, v string"),
                "id")
        return orig(sp, rt, version, manifest)

    monkeypatch.setattr(V, "_write_manifest_atomic", racy)
    calls = {"n": 0}

    def closure():
        calls["n"] += 1
        return V.commit_upsert(
            spark, root,
            spark.createDataFrame([(1, "lose")], "id bigint, v string"),
            "id")

    V.commit_with_retry(closure)
    assert calls["n"] == 1  # re-based: the physical-stats proof fired
    got = {r["id"]: r["v"] for r in V.read_version(spark, root).collect()}
    assert got[1] == "lose" and got[1001] == "win" and got[50] == "base"


def test_restore_refuses_constraint_on_renamed_column(spark, root):
    """A parseable CHECK whose column the TARGET snapshot serves under
    a different (pre-rename) name fails fast with the remedy — the
    restored table could never enforce it."""
    V.commit_append(
        spark, root,
        spark.createDataFrame([(1, 5)], "k bigint, val bigint")
        .coalesce(1), ["k"])
    V.rename_column(spark, root, "val", "amount")
    V.set_check_constraint(spark, root, "nonneg", "amount >= 0")
    with pytest.raises(ValueError, match="does not serve under that name"):
        V.restore_version(spark, root, 0)


def test_append_race_stats_cols_change_recomputes(spark, root, monkeypatch):
    """An interposed stats_cols change (zorder widening, explicit
    append override) rejects the re-base — republishing the stale list
    would silently revert it."""
    V.commit_append(spark, root, _df(spark, 0, 10, "base"), ["k"])
    orig = V._write_manifest_atomic
    state = {"armed": True}

    def racy(sp, rt, version, manifest):
        if state["armed"]:
            state["armed"] = False
            V.commit_append(
                spark, root, _df(spark, 10, 20, "win"), ["k", "v"])
        return orig(sp, rt, version, manifest)

    monkeypatch.setattr(V, "_write_manifest_atomic", racy)
    calls = {"n": 0}

    def closure():
        calls["n"] += 1
        return V.commit_append(spark, root, _df(spark, 20, 30, "lose"))

    V.commit_with_retry(closure)
    assert calls["n"] == 2  # recompute resolved the winner's list
    seg = V._read_manifest(spark, root, V.current_version(spark, root))
    assert seg["stats_cols"] == ["k", "v"]
    assert V.read_version(spark, root).count() == 30


def test_zorder_after_rename_translates_stats_cols(spark, root):
    """OPTIMIZE ZORDER BY a renamed column: the layout runs on the
    LOGICAL frame, the manifest's stats_cols gains the column's
    PHYSICAL name, and key-range pruning works on the logical name
    afterwards."""
    V.commit_append(
        spark, root,
        spark.range(0, 200).selectExpr(
            "id AS k", "(id * 37) % 200 AS val", "'x' AS pad"),
        ["k"])
    V.rename_column(spark, root, "val", "score")
    V.optimize(spark, root, zorder_cols=["score"], n_files=4)
    seg = V._read_manifest(spark, root, V.current_version(spark, root))
    # the physical name (val) joined stats_cols, not the logical one
    assert "val" in seg["stats_cols"] and "score" not in seg["stats_cols"]
    # read-side pruning through the logical name: only files whose
    # zordered val-range intersects [0,40] survive the index filter
    res = V._resolve(spark, root, V.current_version(spark, root))
    pruned = V._pruned_entries(spark, root, res, "score", 0, 40)
    assert 0 < len(pruned) < seg["total_files"]
    df = V.read_version(spark, root, key_col="score", key_range=(0, 40))
    assert df.count() >= 41  # every matching row present (file-level skip)
    got = {r["k"] for r in df.where("score <= 40").collect()}
    assert got == {k for k in range(200) if (k * 37) % 200 <= 40}


# ------------------------------------------------- ALTER family (r14):
# ADD COLUMN and TYPE WIDENING as metadata-only commits.


def test_add_column_metadata_only(spark, root):
    V.commit_append(
        spark, root,
        spark.range(10).selectExpr("id AS k", "id * 2 AS val").coalesce(1),
        ["k"],
    )
    v = V.add_column(spark, root, "tag", "string")
    assert v == 1
    h = {r["version"]: r for r in V.history(spark, root)}
    assert h[1]["op"] == "add_column" and h[1]["files_added"] == 0
    got = V.read_version(spark, root)
    assert got.columns == ["k", "val", "tag"]
    assert got.where("tag IS NULL").count() == 10  # NULL-backfilled
    # writes through the widened schema; old rows stay NULL
    V.commit_append(
        spark, root,
        spark.createDataFrame([(100, 1, "x")],
                              "k bigint, val bigint, tag string"))
    vals = {r["k"]: r["tag"] for r in V.read_version(spark, root).collect()}
    assert vals[100] == "x" and vals[0] is None
    # time travel serves the pre-add schema
    assert V.read_version(spark, root, 0).columns == ["k", "val"]
    with pytest.raises(ValueError, match="already exists"):
        V.add_column(spark, root, "tag", "string")


def test_add_column_after_drop_gets_fresh_physical(spark, root):
    V.commit_append(
        spark, root,
        spark.range(5).selectExpr("id AS k", "id * 7 AS val").coalesce(1),
        ["k"],
    )
    V.drop_column(spark, root, "val")
    v = V.add_column(spark, root, "val", "bigint")
    man = V._read_manifest(spark, root, v)
    # fresh physical: never resurrects the tombstoned values
    assert man["column_mapping"]["val"] != "val"
    assert "val" in man["dropped_physical"]
    got = V.read_version(spark, root)
    assert got.where("val IS NULL").count() == 5  # old values stay gone
    # and it is writable under the new physical
    V.commit_upsert(
        spark, root,
        spark.createDataFrame([(2, 99)], "k bigint, val bigint"), "k")
    vals = {r["k"]: r["val"] for r in V.read_version(spark, root).collect()}
    assert vals[2] == 99 and vals[3] is None


def test_widen_column_type_lifecycle(spark, root):
    V.commit_append(
        spark, root,
        spark.createDataFrame([(1, 10), (2, 20)], "k int, val int")
        .coalesce(1),
        ["k"],
    )
    v = V.widen_column_type(spark, root, "val", "bigint")
    assert v == 1
    got = V.read_version(spark, root)
    assert dict(got.dtypes)["val"] == "bigint"
    # old narrow files read upcast; new wide values land
    big = 1 << 40
    V.commit_append(
        spark, root,
        spark.createDataFrame([(3, big)], "k int, val bigint")
        .coalesce(1))
    assert V.read_version(spark, root).where(f"val = {big}").count() == 1
    # pruning on the INT-statted key survives widened bounds
    V.widen_column_type(spark, root, "k", "bigint")
    p = V.read_version(spark, root, key_range=(3, 3), key_col="k")
    assert p.count() == 1 and len(p.inputFiles()) == 1
    # time travel serves the narrow schema
    assert dict(V.read_version(spark, root, 0).dtypes)["val"] == "int"
    # CDF spans the widening: types unify on the wide side
    ch = V.table_changes(spark, root, 0)
    assert ch.where("_change_type = 'insert'").count() == 3
    # no-op and refusals
    assert V.widen_column_type(spark, root, "val", "bigint") == 3
    for bad in [("val", "int"), ("val", "string"), ("val", "double")]:
        with pytest.raises(ValueError, match="lossless widenings only"):
            V.widen_column_type(spark, root, *bad)
    h = V.history(spark, root)
    assert [r["op"] for r in h][:2] == ["append", "widen_type"]


def test_widen_float_and_small_ints(spark, root):
    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(1, 1.5, 7)],
            "k bigint, f float, b tinyint",
        ).coalesce(1),
        ["k"],
    )
    V.widen_column_type(spark, root, "f", "double")
    V.widen_column_type(spark, root, "b", "int")
    got = V.read_version(spark, root)
    assert dict(got.dtypes) == {"k": "bigint", "f": "double", "b": "int"}
    r = got.collect()[0]
    assert r["f"] == 1.5 and r["b"] == 7


def test_widen_after_rename_through_mapping(spark, root):
    """Widening a RENAMED column: the logical schema widens while the
    frozen physical name keeps serving the old narrow files through
    the mapping."""
    V.commit_append(
        spark, root,
        spark.createDataFrame([(1, 10)], "k int, val int").coalesce(1),
        ["k"],
    )
    V.rename_column(spark, root, "val", "score")
    V.widen_column_type(spark, root, "score", "bigint")
    got = V.read_version(spark, root)
    assert dict(got.dtypes)["score"] == "bigint"
    assert got.collect()[0]["score"] == 10
    big = 1 << 40
    V.commit_upsert(
        spark, root,
        spark.createDataFrame([(2, big)], "k int, score bigint"), "k")
    vals = {r["k"]: r["score"] for r in V.read_version(spark, root).collect()}
    assert vals == {1: 10, 2: big}
    # physical name stayed frozen through both ALTERs
    assert V.describe_detail(spark, root)["column_mapping"] == {
        "score": "val"}


def test_alter_duplicate_checks_are_case_insensitive(spark, root):
    """Spark resolution is case-insensitive by default: committing both
    'val' and 'VAL' would make every later reference ambiguous (review
    finding r14) — add/rename refuse case-variant duplicates."""
    V.commit_append(
        spark, root,
        spark.range(3).selectExpr("id AS k", "id AS val").coalesce(1),
        ["k"],
    )
    with pytest.raises(ValueError, match="already exists"):
        V.add_column(spark, root, "VAL", "string")
    with pytest.raises(ValueError, match="already exists"):
        V.rename_column(spark, root, "val", "K")
    # a case-only rename of the SAME column is legitimate
    V.rename_column(spark, root, "val", "VAL")
    got = V.read_version(spark, root)
    assert got.columns == ["k", "VAL"]
    assert got.where("VAL = 2").count() == 1


def test_widened_table_accepts_narrow_writers(spark, root):
    """After widen_column_type, OLD writers still committing the narrow
    type keep working: their files land narrow and read upcast through
    the wide manifest schema (the widening read contract). A frame
    WIDER than the table still raises, pointing at widen_column_type."""
    V.commit_append(
        spark, root,
        spark.createDataFrame([(1, 10)], "k int, val int").coalesce(1),
        ["k"],
    )
    V.widen_column_type(spark, root, "val", "bigint")
    # narrow-typed writer: accepted, schema stays wide
    V.commit_append(
        spark, root,
        spark.createDataFrame([(2, 20)], "k int, val int").coalesce(1))
    got = V.read_version(spark, root)
    assert dict(got.dtypes)["val"] == "bigint"
    assert {r["val"] for r in got.collect()} == {10, 20}
    # wider-than-table frame: refused with the widening hint
    with pytest.raises(ValueError, match="widen_column_type"):
        V.commit_append(
            spark, root,
            spark.createDataFrame([(3, 3)], "k bigint, val bigint"))
    # a non-widening retype still gets the hard refusal
    with pytest.raises(ValueError, match="only ADD columns"):
        V.commit_append(
            spark, root,
            spark.createDataFrame([(3, "x")], "k int, val string"))


def test_widen_nested_positions(spark, root):
    """NESTED type widening (Delta type widening inside array/map/
    struct): the scalar matrix recursed into element/value/field
    positions — metadata-only, old files read upcast at the nested
    leaves (Spark's parquet scan promotes nested leaf types through
    the declared read schema exactly like top-level ones)."""
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [(1, [1, 2, 3], {"a": 5}, (7, 1.5))],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("arr", T.ArrayType(T.IntegerType())),
            T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
            T.StructField("s", T.StructType([
                T.StructField("x", T.IntegerType()),
                T.StructField("y", T.FloatType()),
            ])),
        ]),
    ).coalesce(1)
    V.commit_append(spark, root, df, ["k"])
    V.widen_column_type(spark, root, "arr", "array<bigint>")
    V.widen_column_type(spark, root, "m", "map<string,bigint>")
    V.widen_column_type(spark, root, "s", "struct<x:double,y:double>")
    got = V.read_version(spark, root)
    assert dict(got.dtypes) == {
        "k": "bigint",
        "arr": "array<bigint>",
        "m": "map<string,bigint>",
        "s": "struct<x:double,y:double>",
    }
    r = got.collect()[0]
    assert r["arr"] == [1, 2, 3] and r["m"] == {"a": 5}
    assert r["s"]["x"] == 7.0 and r["s"]["y"] == 1.5
    # wide values land; NARROW writers keep working post-widen (the
    # nested recursion applies to _evolve_schema's acceptance too)
    big = 1 << 40
    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(2, [big], {"b": big}, (0.5, 0.5))],
            "k bigint, arr array<bigint>, m map<string,bigint>, "
            "s struct<x:double,y:double>").coalesce(1))
    V.commit_append(spark, root, df.selectExpr(
        "k + 10 AS k", "arr", "m", "s"))
    assert V.read_version(spark, root).count() == 3
    # time travel serves the narrow nested schema
    assert dict(V.read_version(spark, root, 0).dtypes)["arr"] == "array<int>"
    # refusals: map KEY change, struct field add, element narrowing
    with pytest.raises(ValueError, match="KEY types are frozen"):
        V.widen_column_type(spark, root, "m", "map<bigint,bigint>")
    with pytest.raises(ValueError, match="lossless widenings"):
        V.widen_column_type(
            spark, root, "s", "struct<x:double,y:double,z:int>")
    with pytest.raises(ValueError, match="lossless widenings"):
        V.widen_column_type(spark, root, "arr", "array<int>")


def test_widen_decimal_precision_and_scale(spark, root):
    """decimal(p,s) widens to any decimal whose scale AND integer-digit
    count grow-or-hold (Delta type widening): every representable value
    carries over exactly; decimal columns carry no manifest stats
    (footer stats are Decimal objects _stat_jsonable refuses), so the
    collation space is untouched. Integer-digit shrink is refused."""
    import decimal

    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(1, decimal.Decimal("12345678.91"))],
            "k bigint, amt decimal(10,2)").coalesce(1),
        ["k"],
    )
    V.widen_column_type(spark, root, "amt", "decimal(14,2)")
    got = V.read_version(spark, root)
    assert dict(got.dtypes)["amt"] == "decimal(14,2)"
    assert got.collect()[0]["amt"] == decimal.Decimal("12345678.91")
    # scale growth with integer digits held
    V.widen_column_type(spark, root, "amt", "decimal(18,6)")
    assert V.read_version(spark, root).collect()[0]["amt"] == (
        decimal.Decimal("12345678.910000"))
    # narrow decimal writers still land (read upcast)
    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(2, decimal.Decimal("1.50"))],
            "k bigint, amt decimal(10,2)").coalesce(1))
    assert V.read_version(spark, root).count() == 2
    # integer digits would shrink: 12 - 8 < 18 - 6 — refused
    with pytest.raises(ValueError, match="lossless widenings"):
        V.widen_column_type(spark, root, "amt", "decimal(12,8)")
    with pytest.raises(ValueError, match="lossless widenings"):
        V.widen_column_type(spark, root, "amt", "decimal(18,2)")


def test_alter_resolution_is_case_insensitive(spark, root):
    """ALTERs resolve the TARGET column case-insensitively (r14 advice):
    Spark resolution is, so widen/rename/drop addressed as 'Val' must
    find the column every read already resolves as 'val'."""
    V.commit_append(
        spark, root,
        spark.createDataFrame(
            [(1, 10, 5)], "k bigint, val int, aux int").coalesce(1),
        ["k"],
    )
    V.widen_column_type(spark, root, "VAL", "bigint")
    got = V.read_version(spark, root)
    assert dict(got.dtypes)["val"] == "bigint"  # schema spelling kept
    V.rename_column(spark, root, "Val", "score")
    V.drop_column(spark, root, "AUX")
    got = V.read_version(spark, root)
    assert got.columns == ["k", "score"]
    with pytest.raises(ValueError, match="no column"):
        V.widen_column_type(spark, root, "gone", "bigint")
