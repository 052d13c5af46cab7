"""Generate the committed CloudFront access-log fixture (deterministic).

Two gzip'd W3C extended log files in the CloudFront standard format
(the shape amadeus-aws/src/cloudfront.rs consumes: #Version/#Fields
headers, 26 tab-separated fields, '-' sentinel for absent values) so
the source can be exercised through the driver's hash-checked gate,
not just pytest.

Run: python scripts/make_cloudfront_fixture.py  (writes fixtures/cloudfront/)
"""

from __future__ import annotations

import gzip
import os
import random

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "cloudfront"
)

HEADER = (
    "#Version: 1.0\n"
    "#Fields: date time x-edge-location sc-bytes c-ip cs-method cs(Host) "
    "cs-uri-stem sc-status cs(Referer) cs(User-Agent) cs-uri-query cs(Cookie) "
    "x-edge-result-type x-edge-request-id x-host-header cs-protocol cs-bytes "
    "time-taken x-forwarded-for ssl-protocol ssl-cipher "
    "x-edge-response-result-type cs-protocol-version fle-status fle-encrypted-fields\n"
)

EDGES = ["LAX1", "IAD12", "FRA2", "NRT57"]
METHODS = ["GET", "GET", "GET", "POST", "HEAD"]
STEMS = ["/index.html", "/api/v1/items", "/img/logo.png", "/health"]
STATUSES = [200, 200, 200, 200, 304, 404, 500]
AGENTS = ["Mozilla/5.0", "curl/7.1", "-"]
REFERERS = ["https://example.com/", "-", "-"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260813)
    for fi in range(2):
        lines = [HEADER]
        for i in range(200):
            day = 1 + (i % 3)
            ts = f"2019-12-0{day}\t{10 + i % 12}:{i % 60:02d}:{(7 * i) % 60:02d}"
            status = rng.choice(STATUSES)
            line = "\t".join(
                [
                    ts,
                    rng.choice(EDGES),
                    str(200 + rng.randrange(5000)),
                    f"192.0.2.{rng.randrange(40)}",
                    rng.choice(METHODS),
                    "d111111abcdef8.cloudfront.net",
                    rng.choice(STEMS),
                    str(status),
                    rng.choice(REFERERS),
                    rng.choice(AGENTS),
                    "-",
                    "-",
                    "Hit" if status == 200 else "Error",
                    f"req{fi}-{i:04d}",
                    "d111111abcdef8.cloudfront.net",
                    "https",
                    str(20 + rng.randrange(400)),
                    f"0.{rng.randrange(1000):03d}",
                    "-",
                    "TLSv1.2",
                    "ECDHE-RSA-AES128-GCM-SHA256",
                    "Hit" if status == 200 else "Error",
                    "HTTP/2.0",
                    "-",
                    "-",
                ]
            )
            lines.append(line + "\n")
        # degenerate lines, so the short-line/sentinel normalization is
        # actually exercised by the gate (r3 advice): a truncated 9-field
        # line from an older log version (missing referer and everything
        # after), an 8-field line (missing status too → the -1 group),
        # and a '-' status/bytes line (client-disconnect style).
        full = lines[-1].rstrip("\n").split("\t")
        lines.append("\t".join(full[:9]) + "\n")
        lines.append("\t".join(full[:8]) + "\n")
        degen = list(full)
        degen[3] = "-"  # sc-bytes
        degen[8] = "-"  # sc-status
        lines.append("\t".join(degen) + "\n")
        path = os.path.join(OUT, f"E2EXAMPLE.2019-12-0{fi + 1}.gz")
        with gzip.open(path, "wt") as f:
            f.writelines(lines)
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
