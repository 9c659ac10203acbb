"""Diff two bench.py JSON outputs and flag real movers.

Usage: python tools/compare_bench.py OLD.json NEW.json [ratio=2.0]

Container CPU contention swings single runs ~2x (BASELINE.md §3), so only
per-query ratios beyond the threshold are flagged; queries present in only
one file are listed separately so set growth isn't misread as regression.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    shared = sorted(set(old) & set(new))
    slower, faster = [], []
    for q in shared:
        if old[q] <= 0:
            continue
        r = new[q] / old[q]
        if r >= thresh:
            slower.append((r, q))
        elif r <= 1 / thresh:
            faster.append((r, q))
    print(f"shared {len(shared)}  added {len(set(new) - set(old))}  "
          f"removed {len(set(old) - set(new))}")
    print(f"old total {sum(old[q] for q in shared):.2f}s -> "
          f"new total {sum(new[q] for q in shared):.2f}s (shared set)")
    for r, q in sorted(slower, reverse=True):
        print(f"SLOWER {r:5.2f}x  {q}  {old[q]:.2f}s -> {new[q]:.2f}s")
    for r, q in sorted(faster):
        print(f"faster {r:5.2f}x  {q}  {old[q]:.2f}s -> {new[q]:.2f}s")
    if not slower and not faster:
        print(f"no per-query movement beyond {thresh}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
