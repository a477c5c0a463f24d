"""Compare two bench JSON lines: per-query ratios, sorted by delta.

Usage: python plans/r13/compare_bench.py before.json after.json [top_n]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb), key=lambda n: qb[n] - qa[n])
    print(f"total: {a['value']:.1f} -> {b['value']:.1f} "
          f"({b['value'] / a['value']:.3f}x), {len(common)} common queries")
    rows = [(n, qa[n], qb[n], qb[n] - qa[n]) for n in common]
    print("\n== biggest improvements ==")
    for n, x, y, d in rows[:top]:
        print(f"{n:32s} {x:8.3f} -> {y:8.3f}  ({d:+.3f}s, {y / x if x else 0:.2f}x)")
    print("\n== biggest regressions ==")
    for n, x, y, d in rows[-top:][::-1]:
        if d <= 0:
            break
        print(f"{n:32s} {x:8.3f} -> {y:8.3f}  ({d:+.3f}s, {y / x if x else 0:.2f}x)")


if __name__ == "__main__":
    main()
