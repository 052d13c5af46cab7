"""WebDataset shard ingest end-to-end: index tar shards (header-hopping,
O(members) I/O), roll members into samples, ranged-fetch the payload
windows, and land the text slots in a versioned table whose changefeed
downstream consumers poll — the multimodal front door of an
incremental training-corpus pipeline.

    python examples/webdataset_ingest.py
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
from amadeus_spark.sources import wds_golden as G
from amadeus_spark.sources.webdataset import (
    fetch_members,
    read_index_sidecars,
    read_webdataset_index,
    sample_plans,
    write_webdataset_shards,
)


def main() -> None:
    spark = get_spark("webdataset_ingest_example")
    shards = [os.path.join(G.fixture_dir(), s) for s in G.GOLDEN]

    # 1. index: one task per shard, 512 bytes read per member
    idx = read_webdataset_index(spark, shards)
    print("member index:")
    idx.orderBy("shard", "offset").show(truncate=False)

    # 2. samples: slot -> byte-range plans, decode nothing yet
    plans = sample_plans(idx)
    print("sample plans:")
    plans.orderBy("sample_key").show(truncate=False)

    # 3. fetch only the txt/json slots (images stay unread byte ranges)
    text_rows = fetch_members(
        idx.filter(F.col("slot").isin("txt", "json"))
    ).select(
        "sample_key",
        "slot",
        F.col("size").alias("n_bytes"),
        F.sha1("content").alias("content_sha1"),
    )

    # 4. land in a versioned table; the commit's changefeed is what an
    # incremental tokenizer/indexer consumes next run
    work = tempfile.mkdtemp(prefix="wds_ingest_")
    try:
        root = os.path.join(work, "wds_text")
        v = V.commit_append(spark, root, text_rows, ["sample_key"])
        feed = V.table_changes(spark, root, starting_version=v)
        print(f"v{v} changefeed ({feed.count()} rows):")
        feed.orderBy("sample_key", "slot").show(truncate=False)

        # 5. RE-SHARD (the write half): fetch everything, write new
        # size-balanced tar shards — samples kept whole, global key
        # order, write-time index + .index.parquet sidecars — then read
        # the index back through the sidecar FAST PATH (plain parquet
        # scan; no tar-header re-scan)
        out = os.path.join(work, "reshard")
        # slotless metadata members ride with their name as the key
        # (writer convention — they read back slotless again)
        members = fetch_members(idx).select(
            F.coalesce("sample_key", "member").alias("sample_key"),
            "slot",
            "content",
        )
        write_webdataset_shards(
            members, out, target_shard_bytes=4096
        ).count()  # materializing the index IS the write job
        side = read_index_sidecars(spark, out)
        print("re-sharded (sidecar fast-path index):")
        side.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("size").alias("payload_bytes"),
        ).orderBy("shard").show(truncate=False)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
