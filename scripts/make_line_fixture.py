"""Generate fixtures/line_docs.parquet — multi-line documents with
planted cross-document boilerplate lines for the line-level dedup gate
query (`line_dedup`).

The driver's synthetic documents.parquet is single-line (no '\\n' in any
text cell), so line-level dedup over it would be vacuous; this fixture
plants the structure the operator exists for (the same pattern as
fixtures/pii_docs.parquet): a pool of boilerplate lines (nav headers,
cookie banners, footers) repeated across many documents, interleaved
with per-document unique content lines, plus whitespace-only and
space-padded lines to pin the trim semantics in both engines.

Deterministic: seed 20240814. Regenerate with
`python scripts/make_line_fixture.py`.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "line_docs.parquet")

BOILERPLATE = [
    "subscribe to our newsletter for updates",
    "all rights reserved 2020 example corp",
    "home | products | about | contact",
    "accept cookies to continue browsing",
    "share this article on social media",
    "comments are closed for this post",
    "related articles you might enjoy",
    "sign in to your account to comment",
    "terms of service and privacy policy",
    "advertisement",
    "back to top",
    "loading more stories",
]

WORDS = ("data spark line dedup corpus quality token batch shuffle join "
         "filter window agg scan merge sort hash key value part").split()


def main() -> None:
    rng = random.Random(20240814)
    rows = []
    for i in range(300):
        lang = "en" if i % 3 else "de"
        n_content = rng.randint(5, 15)
        content = [
            f"doc {i} content line {j} "
            + " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 9)))
            for j in range(n_content)
        ]
        # 3-6 boilerplate lines; ~10% arrive space-padded so the trimmed
        # key still matches across documents
        boiler = rng.sample(BOILERPLATE, rng.randint(3, 6))
        boiler = [("  " + b + " ") if rng.random() < 0.1 else b for b in boiler]
        lines = content + boiler
        rng.shuffle(lines)
        # whitespace-only / empty lines are kept by the operator (never
        # counted as duplicates): plant some to pin that rule
        if rng.random() < 0.3:
            lines.insert(rng.randrange(len(lines)), "")
        if rng.random() < 0.2:
            lines.insert(rng.randrange(len(lines)), "   ")
        rows.append({"doc_id": i, "lang": lang, "text": "\n".join(lines)})

    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
        ),
    )
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} docs -> {OUT}")


if __name__ == "__main__":
    main()
