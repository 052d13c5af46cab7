"""Generate the committed WARC fixture + independent expected-stats CSV.

One plain .warc and one .warc.gz (ISO 28500 / WARC 1.0 records, mixed
response/request types, bodies with CRLFs and binary bytes) under
fixtures/warc/. The generator ALSO writes expected_domain_stats.csv
computed directly from the record list — an oracle independent of the
Spark-side parser (amadeus_spark/sources/warc.py), so the driver gate
can hash-compare the distributed parse against ground truth.

Run: python scripts/make_warc_fixture.py
"""

from __future__ import annotations

import gzip
import os
import random
import re

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "warc"
)

DOMAINS = ["example.com", "example.org", "docs.test", "blog.test", "shop.test"]


def make_records(rng: random.Random, n: int, tag: str) -> list[tuple[str, str, str, bytes]]:
    recs = []
    for i in range(n):
        dom = rng.choice(DOMAINS)
        url = f"http://{dom}/{tag}/page{i}"
        ip = f"203.0.113.{rng.randrange(200)}"
        body = (
            f"<html><body>{tag} page {i} of {dom} " + "x" * rng.randrange(400)
        ).encode() + b"\r\n<raw\x00bytes>\xff</body></html>"
        wtype = "response" if i % 5 != 4 else "request"  # some non-response
        recs.append((url, ip, wtype, body))
    return recs


def serialize(recs: list[tuple[str, str, str, bytes]]) -> bytes:
    out = b""
    for url, ip, wtype, body in recs:
        headers = (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-IP-Address: {ip}\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode()
        out += headers + body + b"\r\n\r\n"
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(28500)
    plain = make_records(rng, 25, "a")
    gzed = make_records(rng, 25, "b")
    with open(os.path.join(OUT, "cc-0001.warc"), "wb") as f:
        f.write(serialize(plain))
    with open(os.path.join(OUT, "cc-0002.warc.gz"), "wb") as f:
        f.write(gzip.compress(serialize(gzed)))

    # ground truth computed from the record lists, NOT via the parser
    stats: dict[str, list[int]] = {}
    for url, _ip, wtype, body in plain + gzed:
        if wtype != "response":
            continue
        dom = re.match(r"http://([^/]+)/", url).group(1)
        s = stats.setdefault(dom, [0, 0])
        s[0] += 1
        s[1] += len(body)
    with open(os.path.join(OUT, "expected_domain_stats.csv"), "w") as f:
        f.write("domain,n_pages,total_bytes\n")
        for dom in sorted(stats):
            f.write(f"{dom},{stats[dom][0]},{stats[dom][1]}\n")
    for fn in sorted(os.listdir(OUT)):
        print(fn, os.path.getsize(os.path.join(OUT, fn)))


if __name__ == "__main__":
    main()
