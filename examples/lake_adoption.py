"""Adopting an already-landed lake and branching it — the r14 layer.

The 100 TB onboarding story: a hive-partitioned parquet lake that some
other system wrote joins the commit log with ZERO data movement
(CONVERT TO DELTA ... PARTITIONED BY), gets branched for a dev
experiment by reference (SHALLOW CLONE — no object copies even on an
object store), diverges via deletion-vector DML, and is finally
localized with OPTIMIZE once the branch graduates. Along the way the
example shows the maintenance posture: vacuum's in-flight grace window
and the foreign-file debt surfaced by describe_detail.

Run: python examples/lake_adoption.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amadeus_spark.operators import versioned as V  # noqa: E402
from amadeus_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="lake-adoption-example")
    work = tempfile.mkdtemp(prefix="lake_adopt_")
    try:
        # ---- somebody else's lake: hive-partitioned by order status
        lake = os.path.join(work, "lake")
        (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .selectExpr(
                "o_orderkey AS k",
                "CAST(o_totalprice * 100 AS BIGINT) AS cents",
                "o_orderstatus AS status",
            )
            .repartition(4)
            .write.partitionBy("status")
            .parquet(lake)
        )

        # ---- CONVERT: adopt it as version 0 — hard links, no rewrite.
        # Partition values parse out of the directory names as per-file
        # min==max stats, so partition pruning works immediately.
        root = os.path.join(work, "table")
        v, n_files, n_rows = V.convert_to_versioned(
            spark, root, lake, stats_cols=["k"], partition_cols=["status"]
        )
        print(f"converted: v{v}, {n_files} files, {n_rows} rows adopted")
        full = V.read_version(spark, root)
        pruned = V.read_version(
            spark, root, key_range=("F", "F"), key_col="status"
        )
        print(
            "partition pruning:",
            len(pruned.inputFiles()), "of", len(full.inputFiles()),
            "files planned for status='F'",
        )

        # ---- SHALLOW CLONE: branch it by reference — zero objects move
        branch = os.path.join(work, "branch")
        V.clone_table(spark, root, branch, shallow=True)
        staged = glob.glob(
            os.path.join(branch, "data", "**", "*.parquet"), recursive=True
        )
        d = V.describe_detail(spark, branch)
        print(
            f"shallow clone: {len(staged)} objects staged, "
            f"{d['foreign_files']} foreign refs, {d['n_rows']} rows"
        )

        # ---- diverge the branch: DV delete + predicate update, both
        # resolving row identity THROUGH the foreign references
        V.commit_delete_where(spark, branch, "k % 100 = 7", mode="dv")
        V.commit_update_where(
            spark, branch, "status = 'F' AND k % 100 = 11",
            {"cents": "cents + 1"},
        )
        src_n = V.read_version(spark, root).count()
        br_n = V.read_version(spark, branch).count()
        print(f"diverged: source {src_n} rows (untouched), branch {br_n}")

        # ---- graduate the branch: OPTIMIZE localizes the foreign refs
        V.optimize(spark, branch, target_mb=128)
        print(
            "localized: foreign_files ->",
            V.describe_detail(spark, branch)["foreign_files"],
        )

        # ---- maintenance: vacuum with the in-flight grace window.
        # Default min_staging_age_s=4h protects concurrent writers'
        # staged-but-unpublished commits; this process is the only
        # writer and it is quiesced, so the window can be waived.
        n_man, n_data = V.vacuum(
            spark, branch, keep_last=1, min_staging_age_s=0.0
        )
        print(f"vacuum: {n_man} manifests, {n_data} data files reclaimed")
        print(
            "branch history:",
            [(h["version"], h["op"]) for h in V.history(spark, branch)],
        )
        agg = (
            V.read_version(spark, branch)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("status")
        )
        agg.show()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
