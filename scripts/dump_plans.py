"""Dump .explain("formatted") for named registry queries to
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan
evidence (the judge checks plan claims against these files).

Usage: SPARK_GRAFT_PLANS="a,b" SPARK_GRAFT_PLAN_SUFFIX=before \
       python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from amadeus_spark import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r15")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    names = [
        n.strip()
        for n in os.environ.get("SPARK_GRAFT_PLANS", "").split(",")
        if n.strip()
    ]
    queries = entrymod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("amadeus_spark_plans")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
