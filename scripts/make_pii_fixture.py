"""Generate the committed PII fixture (deterministic).

A small parquet of documents with planted PII surface forms (emails,
phone numbers, IPv4 addresses) mixed into clean text, so the PII
detection/redaction pass runs through the driver's hash-checked gate
(the synthetic documents table contains no PII, which would make the
gate query degenerate).

Run: python scripts/make_pii_fixture.py  (writes fixtures/pii_docs.parquet)
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "pii_docs.parquet"
)

WORDS = "the quick brown fox jumps over a lazy dog near the river bank".split()


def main() -> None:
    rng = random.Random(99112)
    rows = []
    for i in range(120):
        lang = ["en", "de", "es"][i % 3]
        words = [rng.choice(WORDS) for _ in range(rng.randrange(10, 30))]
        if i % 4 == 0:
            words.insert(rng.randrange(len(words)), f"user{i}@example{i % 7}.com")
        if i % 5 == 0:
            words.insert(rng.randrange(len(words)), f"+1-555-{i % 900 + 100:03d}-{i % 9000 + 1000:04d}")
        if i % 6 == 0:
            words.insert(rng.randrange(len(words)), f"10.{i % 256}.{(3 * i) % 256}.{(7 * i) % 256}")
        rows.append((i, lang, " ".join(words)))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, OUT, compression="snappy")
    print(OUT, os.path.getsize(OUT))


if __name__ == "__main__":
    main()
