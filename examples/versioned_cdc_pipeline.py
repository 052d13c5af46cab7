"""Versioned-table lifecycle end-to-end: commit a corpus snapshot,
stream a CDC changefeed into it (one snapshot version per micro-batch,
exactly-once), evolve the schema, run predicate DML (DELETE WHERE — the
takedown loop — and UPDATE WHERE), time-travel by version AND by
wall-clock instant, Z-order-compact, and vacuum with both retention
knobs — the incremental-corpus maintenance loop a daily-refresh
training pipeline runs.

    python examples/versioned_cdc_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amadeus_spark import get_spark
from amadeus_spark.operators import versioned as V
from amadeus_spark.streaming.events import run_cdc_versioned_sink


def main(sf_dir: str) -> None:
    spark = get_spark("versioned_cdc_example")
    work = tempfile.mkdtemp(prefix="versioned_cdc_")
    root = os.path.join(work, "corpus")
    try:
        # 1. initial snapshot: documents keyed by doc_id, stats on the key
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        v0 = V.commit_append(
            spark, root, docs.repartitionByRange(4, "doc_id"), ["doc_id"]
        )
        print(f"v{v0}: initial snapshot,", V.history(spark, root)[-1])

        # 2. a CDC changefeed lands as files; stream it in (availableNow),
        #    one snapshot version per micro-batch, replay-safe via the
        #    manifest's txn high-water mark. The feed re-texts a few docs
        #    and deletes a few others — and ADDS a quality column the
        #    base snapshot never had (schema evolution: old rows read
        #    NULL through the manifest schema).
        feed = os.path.join(work, "changes")
        docs.filter("doc_id % 97 = 0").selectExpr(
            "doc_id",
            "lang",
            "concat(text, ' [rev2]') AS text",
            "CAST(0.5 AS DOUBLE) AS quality",
            "CAST(1 AS BIGINT) AS ts",
            "'U' AS op",
        ).coalesce(1).write.json(feed)
        docs.filter("doc_id % 101 = 0").selectExpr(
            "doc_id",
            "lang",
            "CAST(NULL AS STRING) AS text",
            "CAST(NULL AS DOUBLE) AS quality",
            "CAST(2 AS BIGINT) AS ts",
            "'D' AS op",
        ).coalesce(1).write.mode("append").json(feed)
        stream = (
            spark.readStream.schema(
                "doc_id long, lang string, text string, "
                "quality double, ts long, op string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(feed)
        )
        run_cdc_versioned_sink(stream, root, "doc_id", "ts")
        cur = V.current_version(spark, root)
        print(f"v{cur}: after CDC stream,", V.history(spark, root)[-1])

        # 3. time-travel diff: what did the feed change vs v0?
        before, after = V.read_version(spark, root, v0), V.read_version(spark, root)
        print(
            "rows before/after:", before.count(), "/", after.count(),
            "| revised:",
            after.filter(F.col("text").endswith("[rev2]")).count(),
            "| quality backfilled NULL on old rows:",
            after.filter("quality IS NULL").count(),
        )

        # 4. predicate DML (the takedown loop): DELETE every row from a
        #    "flagged" slice without knowing keys — one predicate-pushed
        #    scan finds the files holding matches, ONLY those rewrite —
        #    then UPDATE a quality backfill over another slice (each SET
        #    sees the PRE-update row; schema never evolves).
        dv, n_rw, n_carried, n_del = V.commit_delete_where(
            spark, root, "lang = 'de' AND doc_id % 11 = 0", changefeed=True
        )
        print(
            f"v{dv}: DELETE WHERE removed {n_del} rows "
            f"({n_rw} files rewritten, {n_carried} carried by reference)"
        )
        uv, n_rw, _ = V.commit_update_where(
            spark, root, "quality IS NULL", {"quality": "CAST(0.1 AS DOUBLE)"}
        )
        print(f"v{uv}: UPDATE WHERE backfilled quality ({n_rw} files)")

        # 4b. merge-on-read DML (deletion vectors): the same takedown,
        #     but O(matched rows) instead of a file rewrite — matched
        #     row identities land in _deletion_vectors/, every file
        #     carries by reference; readers anti-join, OPTIMIZE purges.
        dvv, n_rw, n_carried, n_del = V.commit_delete_where(
            spark, root, "lang = 'fr' AND doc_id % 13 = 0", mode="dv"
        )
        print(
            f"v{dvv}: DV DELETE removed {n_del} rows with "
            f"{n_rw} rewrites ({n_carried} files carried)"
        )

        # 4c. general MERGE INTO: a re-crawl batch — re-texted docs
        #     update, stale low-quality matches drop, brand-new docs
        #     insert — one commit, full Delta clause surface.
        recrawl = V.read_version(spark, root).filter(
            "doc_id % 89 = 0"
        ).selectExpr(
            "doc_id", "lang",
            "concat(text, ' [crawl3]') AS text",
            "CAST(0.9 AS DOUBLE) AS quality",
        ).unionByName(
            spark.createDataFrame(
                [(10_000_001, "en", "fresh doc", 0.8)],
                "doc_id long, lang string, text string, quality double",
            )
        )
        mv, n_rw, n_carried = V.commit_merge(
            spark, root, recrawl, "doc_id",
            matched=[
                {"action": "delete", "condition": "t.quality < 0.05"},
                {"action": "update",
                 "set": {"text": "s.text", "quality": "s.quality"}},
            ],
            not_matched=[{"action": "insert", "values": None}],
        )
        print(f"v{mv}: MERGE rewrote {n_rw} files ({n_carried} carried)")

        # 4d. oops — roll the merge back, BY REFERENCE (no data moves),
        #     then roll the rollback back (history is preserved).
        rv, relinked, removed = V.restore_version(spark, root, version=mv - 1)
        print(f"v{rv}: RESTORE to v{mv - 1} relinked {relinked}, "
              f"removed {removed} entries")
        V.restore_version(spark, root, version=mv)

        # 4e. schema drift: the next crawl batch carries a NEW column
        #      — evolve_schema=True (Delta autoMerge) widens the table;
        #      every older row reads NULL for it through the manifest
        drift = spark.createDataFrame(
            [(10_000_002, "en", "tagged doc", 0.7, "crawl-4")],
            "doc_id long, lang string, text string, quality double,"
            " source string",
        )
        ev, _, _ = V.commit_merge(
            spark, root, drift, "doc_id",
            not_matched=[{"action": "insert", "values": None}],
            evolve_schema=True,
        )
        n_src = V.read_version(spark, root).where(
            "source IS NOT NULL").count()
        print(f"v{ev}: schema evolved (+source), {n_src} row carries it")

        # 4f. CHECK constraint (Delta ADD CONSTRAINT): validated once
        #     against existing data, then enforced IN every write pass
        cv = V.set_check_constraint(
            spark, root, "quality_bounded",
            "quality IS NULL OR (quality >= 0 AND quality <= 1)",
        )
        detail = V.describe_detail(spark, root)
        print(f"v{cv}: constraint set;", detail["constraints"],
              "| live bytes:", detail["size_bytes"])

        # 5. timestamp time travel: read the table as of the instant
        #    the CDC stream finished — the pre-takedown state.
        ts_cdc = V.history(spark, root)[cur]["ts"]
        asof = V.read_version(spark, root, as_of_ts=ts_cdc)
        print(
            f"as-of v{V.version_as_of(spark, root, ts_cdc)} rows:",
            asof.count(), "(pre-takedown)",
        )

        # 6. maintenance: range-compact on doc_id (zorder_cols takes
        #    several NUMERIC columns when the table has them — every
        #    clustering column then prunes), then vacuum history with
        #    BOTH retention knobs — versions newer than the CDC commit's
        #    wall-clock instant survive keep_since even past keep_last.
        v, n_before, n_after = V.optimize(
            spark, root, zorder_cols=["doc_id"], n_files=4
        )
        print(f"v{v}: optimize {n_before} -> {n_after} files")
        sliver = V.read_version(
            spark, root, key_range=(0, 100), key_col="doc_id"
        )
        print("stats-pruned read plans", len(sliver.inputFiles()), "of",
              n_after, "files")
        n_man, n_data = V.vacuum(
            # this process is the only writer and it is quiesced here,
            # so the in-flight grace window can be waived
            spark, root, keep_last=2, keep_since=ts_cdc,
            min_staging_age_s=0.0,
        )
        print(f"vacuum: {n_man} manifests, {n_data} data files reclaimed;",
              "history now", [h["version"] for h in V.history(spark, root)])
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
