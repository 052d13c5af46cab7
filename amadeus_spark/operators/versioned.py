"""Manifest-based versioned tables — snapshot isolation, time travel,
and stats-pruned copy-on-write upserts on plain parquet ("Delta-lite").

Beyond the reference (its storage model is stateless file scans,
SURVEY §1.3); included because a 100 TB training-data pipeline is an
INCREMENTAL system: the corpus is re-ingested, re-deduped and re-mixed
daily, and consumers (snapshot_diff, incremental near-dup, shard
export) need a consistent snapshot while writers land the next
version. This module supplies the minimal, public table-format
contract the lakehouse formats (Delta/Iceberg/Hudi) standardize:

- a table is ``root/data/commit-vN/`` parquet directories plus
  ``root/_manifests/vN.json`` manifest files;
- a manifest lists the data FILES of that snapshot with per-file row
  counts and per-column min/max stats captured at commit time;
- readers resolve a manifest (latest or pinned ``version=``) and read
  exactly its files — writers never mutate visible state;
- commits are optimistic: the manifest is staged and RENAMED into
  place; rename-onto-existing fails, so two racing writers conflict
  instead of corrupting (the merge_upsert swap discipline — all
  mutation through the Hadoop FileSystem API, file/hdfs/s3a alike);
- upserts are copy-on-write at FILE granularity: manifest stats prune
  the rewrite set to files whose key range intersects the update, so
  a 1%-of-keys update rewrites ~1% of files; untouched files are
  carried into the new manifest BY REFERENCE (zero data movement).

Stats live in the manifest, not in footers-at-read-time: at 100 TB,
opening 10⁶ footers to plan a merge is itself a job; the manifest read
is one small JSON.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amadeus_spark.operators.storage import _hadoop_fs

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _arrow_fs(uri: str):
    """pyarrow ``(fs, path)`` for a table URI. ``s3a://`` — the JVM/
    Hadoop spelling Spark writes through — maps to pyarrow's native
    ``s3://`` client over the SAME objects (the read_warc streaming
    posture; pyarrow rejects the s3a scheme outright); bare paths get
    ``file://``."""
    from pyarrow import fs as pafs

    if uri.startswith("s3a://"):
        uri = "s3://" + uri[len("s3a://"):]
    elif "://" not in uri:
        uri = f"file://{uri}"
    return pafs.FileSystem.from_uri(uri)


def _read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    fs, rel = _arrow_fs(f"{root}/{MANIFEST_DIR}/v{version}.json")
    with fs.open_input_file(rel) as f:
        return json.loads(f.read().decode("utf-8"))


def _write_manifest_atomic(
    spark: SparkSession, root: str, version: int, manifest: dict
) -> None:
    fs, _ = _hadoop_fs(spark, root)
    mdir = f"{root}/{MANIFEST_DIR}"
    fs.mkdirs(_jpath(spark, mdir))
    tmp = _jpath(spark, f"{mdir}/.tmp-{uuid.uuid4().hex}.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()
    final = _jpath(spark, f"{mdir}/v{version}.json")
    if fs.exists(final) or not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"concurrent commit: version {version} already exists at {mdir}"
        )


def current_version(spark: SparkSession, root: str) -> int:
    """Latest committed version, or -1 for a nonexistent table."""
    fs, _ = _hadoop_fs(spark, root)
    mdir = _jpath(spark, f"{root}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return -1
    best = -1
    for status in fs.listStatus(mdir):
        name = status.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                best = max(best, int(name[1:-5]))
            except ValueError:
                continue
    return best


def _stat_jsonable(v):
    """Manifest stats must survive json.dumps AND compare consistently
    with query bounds: native JSON scalars pass through; date/datetime
    become ISO strings (lexicographic order == chronological order, and
    :func:`_bound` maps query values into the same form). Anything else
    (bytes, Decimal, ...) returns None — the column simply gets no
    stats, which is the CONSERVATIVE direction (no stats = the file is
    never pruned), never a crash after the data already landed."""
    import datetime as _dt

    if isinstance(v, bool) or v is None:
        return None  # bool min/max is useless for range pruning
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return None


def _bound(v):
    """Map a pruning-bound value into manifest-stats space (see
    :func:`_stat_jsonable`)."""
    import datetime as _dt

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def _manifest_schema(man: dict):
    """StructType from the manifest's stored schema, or None for
    manifests written before schemas were recorded."""
    sj = man.get("schema")
    if not sj:
        return None
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(sj))


def _reader(spark: SparkSession, man: dict):
    """The one schema-evolution read contract: plan against the
    manifest schema when recorded (mixed-vintage files agree on
    columns, old files read NULL for later-added ones, no footer
    merging), plain reader for pre-schema manifests."""
    schema = _manifest_schema(man)
    return spark.read.schema(schema) if schema is not None else spark.read


def _evolve_schema(prev_json: str | None, new_struct) -> str:
    """Widen-only schema evolution at commit time: the table schema is
    the previous schema plus any NEW columns this commit adds — a
    commit whose frame is NARROWER than the table (an insert-only CDC
    batch, a partial append) must not silently drop columns table-wide
    for every reader planning against the manifest. A TYPE change on
    an existing column raises HERE, before any data lands: storing it
    would brick every subsequent read of older files at scan time
    ('Parquet column cannot be converted'), discovered only after the
    bad version is already current."""
    from pyspark.sql.types import StructType

    if not prev_json:
        return new_struct.json()
    prev_struct = StructType.fromJson(json.loads(prev_json))
    prev_by_name = {f.name: f for f in prev_struct.fields}
    for f in new_struct.fields:
        pf = prev_by_name.get(f.name)
        # compare the PHYSICAL type (simpleString) — nullability flags
        # on nested fields legitimately differ between frames that
        # write byte-identical parquet, and the manifest schema reads
        # everything nullable anyway
        if pf is not None and (
            pf.dataType.simpleString() != f.dataType.simpleString()
        ):
            raise ValueError(
                f"type change for column {f.name!r}: table has "
                f"{pf.dataType.simpleString()}, commit has "
                f"{f.dataType.simpleString()} — versioned tables only "
                "ADD columns; rewrite into a new table to retype"
            )
    merged = list(prev_struct.fields) + [
        f for f in new_struct.fields if f.name not in prev_by_name
    ]
    return StructType(merged).json()


def _require_full_rows(table_schema, update_cols: list[str], what: str) -> None:
    """Upserts REPLACE the whole row: an update batch that omits an
    existing table column would silently write NULL into it for every
    updated key (allowMissingColumns fills the gap both ways) — a
    malformed feed must raise, not destroy. Updates may still ADD
    columns (schema evolution is widen-only)."""
    if table_schema is None:
        return
    missing = [f.name for f in table_schema.fields if f.name not in update_cols]
    if missing:
        raise ValueError(
            f"{what} omits existing table columns {missing}: an upsert "
            "replaces the WHOLE row — carry them (explicit NULLs if "
            "intended); only NEW columns may be introduced"
        )


def _file_entries(commit_dir: str, stats_cols: list[str]) -> list[dict]:
    """Per-file rows + min/max stats from the just-written footers —
    read ONCE at commit time (bounded by the commit's file count),
    then served from the manifest forever. Stats come from PARQUET LEAF
    columns matched by their dotted path (a top-level primitive's path
    is its name) — matching by arrow top-level position misaligns as
    soon as any earlier column is nested, silently attributing a struct
    field's min/max to the wrong column and corrupting every pruning
    decision downstream."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    fs, rel = _arrow_fs(commit_dir)
    entries = []
    for info in fs.get_file_info(pafs.FileSelector(rel)):
        if not info.path.endswith(".parquet"):
            continue
        md = pq.ParquetFile(fs.open_input_file(info.path)).metadata
        stats: dict[str, list] = {}
        if md.num_row_groups and stats_cols:
            leaf_paths = [
                md.row_group(0).column(ci).path_in_schema
                for ci in range(md.num_columns)
            ]
            for name in stats_cols:
                if name not in leaf_paths:
                    continue  # nested/absent column -> no stats
                ci = leaf_paths.index(name)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        mins, maxs = [], []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    lo = _stat_jsonable(min(mins))
                    hi = _stat_jsonable(max(maxs))
                    if lo is not None and hi is not None:
                        stats[name] = [lo, hi]
        entries.append(
            {
                "path": os.path.basename(info.path),
                "dir": os.path.basename(commit_dir.rstrip("/")),
                "rows": md.num_rows,
                "stats": stats,
            }
        )
    return entries


def _commit(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    keep_files: list[dict],
    op: str,
    stats_cols: list[str],
    extra: dict | None = None,
) -> int:
    cur = current_version(spark, root)
    version = cur + 1
    # streaming txn high-water marks (run_cdc_versioned_sink) survive
    # interleaved maintenance commits: carry the previous manifest's
    # txn map forward and overlay this commit's, else an optimize/
    # append between two micro-batches would silently drop the replay
    # guard and re-open the at-least-once window
    txn: dict = {}
    prev_schema = None
    if cur >= 0:
        prev = _read_manifest(spark, root, cur)
        txn = dict(prev.get("txn", {}))
        prev_schema = prev.get("schema")
    txn.update((extra or {}).get("txn", {}))
    commit_dir = f"{root}/{DATA_DIR}/commit-v{version}"
    new_files: list[dict] = []
    # SCHEMA lives in the manifest (the lakehouse contract): readers
    # plan against it instead of merging 10^6 footers, old files
    # missing a later-added column surface NULLs through it, and each
    # snapshot time-travels with the schema it was written under.
    # Evolution is WIDEN-ONLY (see _evolve_schema — validated BEFORE
    # data lands); a df-less commit carries the previous schema.
    schema_json = (
        _evolve_schema(prev_schema, df.schema) if df is not None else prev_schema
    )
    if df is not None:
        df.write.mode("errorifexists").parquet(commit_dir)
        new_files = _file_entries(commit_dir, stats_cols)
    manifest = {
        "version": version,
        "op": op,
        "stats_cols": stats_cols,
        "files": keep_files + new_files,
        **(extra or {}),
    }
    if schema_json:
        manifest["schema"] = schema_json
    if txn:
        manifest["txn"] = txn
    _write_manifest_atomic(spark, root, version, manifest)
    return version


def commit_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
) -> int:
    """Append a new snapshot = previous files + this commit's files."""
    cur = current_version(spark, root)
    prev = _read_manifest(spark, root, cur) if cur >= 0 else None
    keep = prev["files"] if prev else []
    cols = stats_cols or (prev["stats_cols"] if prev else [])
    return _commit(spark, root, df, keep, "append", cols)


def read_version(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    key_range: tuple | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Snapshot read — exactly the manifest's files; ``version=None``
    resolves latest at CALL time and stays pinned (snapshot isolation:
    later commits never leak into this DataFrame).

    ``key_range=(lo, hi)`` with ``key_col`` applies MANIFEST-stats file
    skipping before the scan even plans — the read-side twin of the
    upsert pruning: files whose [min,max] misses the range never reach
    Spark, which at 100 TB is the difference between listing a million
    files and reading the three that matter. (Parquet row-group skipping
    still applies inside the files that survive; callers add the
    matching .filter() for row-level pruning.)"""
    v = current_version(spark, root) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no versioned table at {root}")
    man = _read_manifest(spark, root, v)
    files = man["files"]
    if key_range is not None:
        if key_col is None or key_col not in man["stats_cols"]:
            raise ValueError(
                f"key_range needs key_col with manifest stats "
                f"(stats_cols={man['stats_cols']})"
            )
        lo, hi = _bound(key_range[0]), _bound(key_range[1])
        files = [
            e
            for e in files
            if e["stats"].get(key_col) is None
            or (e["stats"][key_col][0] <= hi and lo <= e["stats"][key_col][1])
        ]
    paths = [f"{root}/{DATA_DIR}/{e['dir']}/{e['path']}" for e in files]
    schema = _manifest_schema(man)
    if not paths:
        if schema is not None:
            return spark.createDataFrame([], schema)
        if man["files"]:
            # pre-schema manifest: keep the TABLE's schema (a
            # fabricated one breaks the caller's row-level .filter())
            # by planning one real file and keeping zero of its rows
            first = man["files"][0]
            return (
                spark.read.parquet(
                    f"{root}/{DATA_DIR}/{first['dir']}/{first['path']}"
                ).limit(0)
            )
        return spark.createDataFrame([], "dummy string").limit(0)
    return _reader(spark, man).parquet(*paths)


def commit_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_col: str,
) -> tuple[int, int, int]:
    """Copy-on-write MERGE by key with FILE-LEVEL stats pruning: only
    files whose manifest [min,max] range of ``key_col`` intersects the
    update's key range are rewritten (anti-join survivors + updates);
    every other file carries over by reference. Returns (new_version,
    files_rewritten, files_carried)."""
    cur = current_version(spark, root)
    if cur < 0:
        raise FileNotFoundError(f"no versioned table at {root}")
    man = _read_manifest(spark, root, cur)
    if key_col not in man["stats_cols"]:
        raise ValueError(
            f"{key_col} has no manifest stats (stats_cols="
            f"{man['stats_cols']}); re-create the table with it"
        )
    bounds = updates.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    lo, hi = _bound(bounds["lo"]), _bound(bounds["hi"])
    touched, kept = [], []
    for e in man["files"]:
        st = e["stats"].get(key_col)
        if lo is None or st is None or (st[0] <= hi and lo <= st[1]):
            touched.append(e)
        else:
            kept.append(e)
    _require_full_rows(_manifest_schema(man), updates.columns, "updates")
    if touched:
        paths = [
            f"{root}/{DATA_DIR}/{e['dir']}/{e['path']}" for e in touched
        ]
        # survivors read through the manifest schema (_reader);
        # allowMissingColumns lets updates ADD a column — survivors
        # surface NULL for it (widen-only schema evolution; the
        # omit-a-column direction raised above)
        survivors = _reader(spark, man).parquet(*paths).join(
            updates.select(key_col).distinct(), key_col, "left_anti"
        )
        merged = survivors.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    v = _commit(
        spark, root, merged, kept, "upsert", man["stats_cols"]
    )
    return v, len(touched), len(kept)


def apply_changes(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    extra_meta: dict | None = None,
) -> tuple[int, int, int]:
    """CDC changelog apply — fold a batch of keyed change events
    (upserts + deletes) into the next snapshot, LATEST-WINS per key.
    The lakehouse MERGE-from-changefeed shape (Delta CDF / Hudi upsert
    / Iceberg merge-on-read compaction all materialize exactly this):
    a 100 TB corpus is refreshed from change streams, not rebuilt.

    ``changes`` carries the table's payload columns plus ``ts_col``
    (event order) and ``op_col``; rows whose op equals ``delete_op``
    remove the key, anything else upserts the payload. Multiple events
    per key resolve to the single latest by (ts, op, payload) —
    the trailing columns make the winner total-order deterministic
    when a key carries tied timestamps.

    File-level pruning as commit_upsert: only files whose manifest
    [min,max] of ``key_col`` intersects the CHANGE KEY RANGE are
    rewritten (survivors anti-join + surviving upserts); everything
    else carries by reference. A delete whose key hits no file is a
    no-op, an upsert for an absent key is an insert — no read-first
    existence check, so the apply is one bounded job regardless of
    table size. Returns (new_version, n_upserts, n_deletes)."""
    from pyspark.sql import Window

    cur = current_version(spark, root)
    if cur < 0:
        raise FileNotFoundError(f"no versioned table at {root}")
    man = _read_manifest(spark, root, cur)
    if key_col not in man["stats_cols"]:
        raise ValueError(
            f"{key_col} has no manifest stats (stats_cols="
            f"{man['stats_cols']})"
        )
    payload_cols = [c for c in changes.columns if c not in (ts_col, op_col)]
    w = Window.partitionBy(key_col).orderBy(
        *(
            F.desc(c)
            for c in [ts_col, op_col]
            + [c for c in payload_cols if c != key_col]
        )
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", ts_col)
    )
    # one pass over the (small) change batch: key bounds + op counts
    latest = latest.persist()
    agg = latest.agg(
        F.min(key_col).alias("lo"),
        F.max(key_col).alias("hi"),
        F.sum((F.col(op_col) == delete_op).cast("bigint")).alias("nd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo, hi = _bound(agg["lo"]), _bound(agg["hi"])
    n_deletes = int(agg["nd"] or 0)
    n_upserts = int(agg["n"]) - n_deletes
    touched, kept = [], []
    for e in man["files"]:
        st = e["stats"].get(key_col)
        if lo is None or st is None or (st[0] <= hi and lo <= st[1]):
            touched.append(e)
        else:
            kept.append(e)
    upserts = latest.filter(F.col(op_col) != delete_op).select(payload_cols)
    _require_full_rows(_manifest_schema(man), payload_cols, "change payload")
    try:
        if touched:
            paths = [
                f"{root}/{DATA_DIR}/{e['dir']}/{e['path']}" for e in touched
            ]
            # manifest-schema read + allowMissingColumns: same widen-
            # only schema-evolution contract as commit_upsert
            survivors = _reader(spark, man).parquet(*paths).join(
                latest.select(key_col).distinct(), key_col, "left_anti"
            )
            merged = survivors.unionByName(upserts, allowMissingColumns=True)
        else:
            merged = upserts
        v = _commit(
            spark, root, merged, kept, "cdc", man["stats_cols"], extra_meta
        )
    finally:
        # unpersist on failure too: a long-lived streaming driver
        # calling this per micro-batch would otherwise leak one cached
        # frame per commit conflict / write failure
        latest.unpersist()
    return v, n_upserts, n_deletes


def optimize(
    spark: SparkSession,
    root: str,
    target_mb: int = 256,
    zorder_cols: list[str] | None = None,
    n_files: int | None = None,
) -> tuple[int, int, int]:
    """Small-file compaction as a COMMIT: rewrite the current
    snapshot's data into ~``target_mb`` files and publish it as the
    next version. Default layout range-sorts by the first stats column
    (manifest min/max pruning tightens, never degrades); with
    ``zorder_cols`` the rewrite is Morton-interleaved instead
    (storage.zorder_layout — the OPTIMIZE ZORDER BY shape), making
    EVERY clustering column's per-file range narrow simultaneously,
    and those columns join the manifest's stats_cols so read-side
    key_range pruning works on each of them. Old versions stay
    time-travelable — compaction is a new manifest, never an in-place
    rewrite (the versioned twin of storage.compact_files, which
    overwrites plain directories). Returns (new_version, files_before,
    files_after)."""
    import math as _math

    cur = current_version(spark, root)
    if cur < 0:
        raise FileNotFoundError(f"no versioned table at {root}")
    man = _read_manifest(spark, root, cur)
    total = 0
    fs_, _rel = _arrow_fs(root)
    for e in man["files"]:
        info = fs_.get_file_info(f"{_rel}/{DATA_DIR}/{e['dir']}/{e['path']}")
        total += info.size or 0
    # n_files overrides the size-derived count (tests / fixed layouts)
    n_out = n_files or max(1, _math.ceil(total / (target_mb * 1024 * 1024)))
    df = read_version(spark, root, cur)
    stats_cols = man["stats_cols"]
    if zorder_cols:
        from amadeus_spark.operators.storage import zorder_layout

        out = zorder_layout(df, zorder_cols, n_out)
        stats_cols = stats_cols + [
            c for c in zorder_cols if c not in stats_cols
        ]
    else:
        key = stats_cols[0] if stats_cols else None
        out = (
            df.repartitionByRange(n_out, key).sortWithinPartitions(key)
            if key
            else df.repartition(n_out)
        )
    v = _commit(spark, root, out, [], "optimize", stats_cols)
    new_files = len(_read_manifest(spark, root, v)["files"])
    return v, len(man["files"]), new_files


def vacuum(
    spark: SparkSession, root: str, keep_last: int = 1
) -> tuple[int, int]:
    """Reclaim space: delete manifests older than the newest
    ``keep_last`` versions and every data file no kept manifest
    references. Time travel below the cutoff stops working — that is
    the point (at 100 TB, carrying every historical copy-on-write
    snapshot forever IS the storage bill). All deletion goes through
    the Hadoop FileSystem API (file/hdfs/s3a alike). Returns
    (manifests_deleted, data_files_deleted)."""
    cur = current_version(spark, root)
    if cur < 0:
        raise FileNotFoundError(f"no versioned table at {root}")
    cutoff = cur - keep_last + 1
    keep_refs: set[tuple[str, str]] = set()
    for v in range(max(0, cutoff), cur + 1):
        try:
            man = _read_manifest(spark, root, v)
        except (FileNotFoundError, OSError):
            continue  # already vacuumed under a narrower keep window
        for e in man["files"]:
            keep_refs.add((e["dir"], e["path"]))
    kept_dirs = {d for d, _ in keep_refs}
    fs, _ = _hadoop_fs(spark, root)
    n_manifests = 0
    for v in range(0, max(0, cutoff)):
        p = _jpath(spark, f"{root}/{MANIFEST_DIR}/v{v}.json")
        if fs.exists(p):
            fs.delete(p, False)
            n_manifests += 1
    n_data = 0
    ddir = _jpath(spark, f"{root}/{DATA_DIR}")
    if fs.exists(ddir):
        for commit_status in fs.listStatus(ddir):
            cname = commit_status.getPath().getName()
            if cname not in kept_dirs:
                # no kept manifest references ANYTHING here: count its
                # parquet files, then drop the whole directory so the
                # _SUCCESS/.crc markers go with it (a parquet-only
                # delete left every dir alive forever)
                n_data += sum(
                    1
                    for st in fs.listStatus(commit_status.getPath())
                    if st.getPath().getName().endswith(".parquet")
                )
                fs.delete(commit_status.getPath(), True)
                continue
            for st in fs.listStatus(commit_status.getPath()):
                fname = st.getPath().getName()
                if fname.endswith(".parquet") and (cname, fname) not in keep_refs:
                    fs.delete(st.getPath(), False)
                    n_data += 1
    return n_manifests, n_data


def history(spark: SparkSession, root: str) -> list[dict]:
    """Commit log: version, op, file and row counts per snapshot.
    Versions whose manifest was vacuumed away are omitted."""
    out = []
    for v in range(current_version(spark, root) + 1):
        try:
            m = _read_manifest(spark, root, v)
        except (FileNotFoundError, OSError):
            continue
        out.append(
            {
                "version": v,
                "op": m["op"],
                "n_files": len(m["files"]),
                "n_rows": sum(e["rows"] for e in m["files"]),
            }
        )
    return out
