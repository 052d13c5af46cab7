"""Needle operations on a versioned corpus table — the r15 layer.

The 100 TB point-access story: min/max stats prune RANGES, but a
single document id lives inside every file's [min,max] interval, so
an equality probe ("fetch doc X", "forget user Y") would scan the
corpus. The bloom filter index (set_bloom_index — Delta's
bloomFilterIndex) gives every file a small membership bitmap; point
lookups (read_version(key_in=...)) and keyed deletes
(commit_delete_keys — the right-to-be-forgotten path) then touch only
the files that can possibly hold the needles. The example also shows
the metadata-only ALTER family widened in r15 (nested array and
decimal positions) and the log features ratchet recording what the
snapshot uses.

Run: python examples/needle_operations.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amadeus_spark.operators import versioned as V  # noqa: E402
from amadeus_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("needle_operations")
    work = tempfile.mkdtemp(prefix="needle_")
    try:
        root = os.path.join(work, "corpus")
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        base = docs.selectExpr(
            "doc_id AS k",
            "'doc-' || CAST(doc_id AS STRING) AS doc_key",
            "length(text) AS n_chars",
        )

        # ---- ingest in three interleaved batches: every file's
        # [min,max] doc_key range overlaps every other, so stats alone
        # cannot prune a point probe — the bloom case.
        V.commit_append(
            spark, root, base.where("k % 3 = 0").repartition(2, "k"),
            ["k"],
        )
        V.set_bloom_index(spark, root, ["doc_key"], fpp=0.01)
        V.commit_append(spark, root, base.where("k % 3 = 1").repartition(2, "k"))
        V.commit_append(spark, root, base.where("k % 3 = 2").repartition(2, "k"))

        # ---- point lookup: only the files whose bitmap admits the
        # needle are scanned (plus the pre-index first commit, kept
        # conservatively — an optimize rewrite would re-index it).
        needles = ["doc-3", "doc-7"]
        hit = V.read_version(spark, root, key_in=needles, key_col="doc_key")
        total = V.describe_detail(spark, root)["n_files"]
        print(
            f"lookup scanned {len(hit.inputFiles())} of {total} files"
        )
        hit.where(F.col("doc_key").isin(needles)).show()

        # ---- right to be forgotten: candidates from stats+bloom,
        # deletion vectors write O(matched rows) — no rewrite.
        v, n_rw, n_carry, n_del = V.commit_delete_keys(
            spark, root, needles, "doc_key"
        )
        print(
            f"delete_keys: v{v}, {n_del} rows via DVs, "
            f"{n_rw} files rewritten, {n_carry} carried"
        )
        assert (
            V.read_version(spark, root)
            .where(F.col("doc_key").isin(needles))
            .count()
            == 0
        )

        # ---- r15 ALTER family: nested + decimal widening are
        # metadata-only; narrow writers keep working afterwards.
        V.add_column(spark, root, "weights", "array<int>")
        V.widen_column_type(spark, root, "weights", "array<bigint>")
        V.add_column(spark, root, "price", "decimal(10,2)")
        V.widen_column_type(spark, root, "price", "decimal(14,2)")

        # ---- the features ratchet records what this snapshot uses;
        # an older reader meeting an unknown feature refuses loudly.
        cur = V.current_version(spark, root)
        print(
            "log features:",
            V._read_manifest(spark, root, cur).get("features"),
        )
        print(
            "history:",
            [(h["version"], h["op"]) for h in V.history(spark, root)],
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
