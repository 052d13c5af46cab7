"""Driver-sim strict compare for a subset of queries (all if no args).

Usage: python scripts/verify_queries.py [name ...]
Mirrors the driver's CORRECTNESS gate: plain SparkSession, DuckDB views
over the same sf0.01 parquet, sorted-stringified row compare.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    qs, osql = m.queries(), m.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        sdf = qs[name](spark, SF)
        srows = sorted(
            tuple(str(v) for _, v in sorted(r.asDict().items()))
            for r in sdf.collect()
        )
        if name not in osql:
            print(f"{name}: rows-only n={len(srows)}")
            continue
        od = con.sql(osql[name]).fetchdf()
        orows = sorted(
            tuple(str(v) for _, v in sorted(r.items()))
            for r in od.to_dict("records")
        )
        ok = srows == orows
        bad += not ok
        print(f"{name}: match={ok} n={len(srows)}")
        if not ok:
            sdiff = [r for r in srows if r not in orows][:3]
            odiff = [r for r in orows if r not in srows][:3]
            print("  spark-only:", sdiff)
            print("  oracle-only:", odiff)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
