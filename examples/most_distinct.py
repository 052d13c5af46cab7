"""The reference README's headline query (README.md:94-117) Spark-first:
read parquet → derive (key, value) → top-k keys by approximate distinct
count of values.

Reference: rows.par_stream().map(|r| (r.url, r.ip))
              .most_distinct(&pool, 100, 0.99, 0.002, 0.0808)
Here: the lineitem stand-in — top suppliers by (approx) distinct parts.
``error_rate`` maps to Spark HLL++ ``rsd`` (same ε→precision law as the
reference's HyperLogLog, distinct.rs:152-166).

    python examples/most_distinct.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from amadeus_spark import get_spark
from amadeus_spark.operators import sketches


def main(sf_dir: str) -> None:
    spark = get_spark("most_distinct_example")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    exact = sketches.most_distinct(lineitem, "l_suppkey", "l_partkey", 10)
    approx = sketches.most_distinct(
        lineitem, "l_suppkey", "l_partkey", 10, error_rate=0.0808
    )
    print("exact top-10 suppliers by distinct parts:")
    for r in exact.collect():
        print("  ", r.l_suppkey, r.distinct_vals)
    print("approx (HLL++, rsd=0.0808):")
    for r in approx.collect():
        print("  ", r.l_suppkey, r.distinct_vals)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
