"""Compare two bench_results JSON files per query.

Usage: python scripts/bench_diff.py old.json new.json [threshold]
Prints queries whose median moved more than ``threshold`` (default
1.5x) either way, plus totals — the cross-round regression scan the
trajectory table summarizes.
"""

import json
import sys


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    if "queries" not in old or "queries" not in new:
        raise SystemExit(
            "both inputs need a 'queries' map (bench_results.json shape)"
        )
    oq, nq = old["queries"], new["queries"]

    def val(d, k):
        v = d[k]
        if isinstance(v, (int, float)):
            return float(v)
        return float(v.get("median", 0.0)) if isinstance(v, dict) else 0.0

    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    moved = []
    for k in shared:
        a, b = val(oq, k), val(nq, k)
        if a and b and (b / a >= thresh or a / b >= thresh) and max(a, b) > 0.5:
            moved.append((b / a, k, a, b))
    moved.sort(reverse=True)
    print(f"shared={len(shared)} added={len(added)} removed={len(removed)}")
    print(
        f"shared-total old={sum(val(oq, k) for k in shared):.1f}s "
        f"new={sum(val(nq, k) for k in shared):.1f}s"
    )
    if added:
        print(
            "added-total "
            f"{sum(val(nq, k) for k in added):.1f}s: "
            + ", ".join(f"{k}={val(nq, k):.2f}" for k in added)
        )
    for ratio, k, a, b in moved:
        print(f"  {k}: {a:.2f} -> {b:.2f}  ({ratio:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
