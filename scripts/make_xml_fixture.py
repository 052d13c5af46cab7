"""Generate fixtures/xml_docs/*.xml + fixtures/xml_docs_truth.parquet —
the same records in both representations, so the XML reader gate query
(`xml_source`) can be verified hash-exact against parser-independent
ground truth (DuckDB reads the parquet twin; the warc_stats pattern).

Three files so the distributed read exercises multiple input splits.
Deterministic: seed 20240814. Regenerate with
`python scripts/make_xml_fixture.py`.
"""

from __future__ import annotations

import os
import random
from xml.sax.saxutils import escape

import pyarrow as pa
import pyarrow.parquet as pq

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
XML_DIR = os.path.join(FIX, "xml_docs")
TRUTH = os.path.join(FIX, "xml_docs_truth.parquet")

NAMES = ["widget", "gear", "bolt", "gizmo", "ring", "cog & pin", "<spare>"]


def main() -> None:
    rng = random.Random(20240814)
    os.makedirs(XML_DIR, exist_ok=True)
    rows = []
    rid = 0
    for f in range(3):
        recs = []
        for _ in range(70):
            name = rng.choice(NAMES)
            qty = rng.randint(1, 50)
            # 2-decimal price so the micro-unit money rule applies exactly
            price = round(rng.uniform(1.0, 500.0), 2)
            rows.append(
                {"id": rid, "name": name, "qty": qty, "price": price}
            )
            recs.append(
                f"  <item><id>{rid}</id><name>{escape(name)}</name>"
                f"<qty>{qty}</qty><price>{price}</price></item>"
            )
            rid += 1
        with open(os.path.join(XML_DIR, f"part-{f}.xml"), "w") as fh:
            fh.write("<items>\n" + "\n".join(recs) + "\n</items>\n")

    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("id", pa.int64()),
                ("name", pa.string()),
                ("qty", pa.int64()),
                ("price", pa.float64()),
            ]
        ),
    )
    pq.write_table(table, TRUTH)
    print(f"wrote {rid} records -> {XML_DIR} (3 files) + {TRUTH}")


if __name__ == "__main__":
    main()
