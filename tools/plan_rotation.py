"""Plan the next round's driver-correctness window rotation.

The round driver oracle-checks only the FIRST 50 ``queries()`` entries, so
each round the dict must be reordered to put the least-recently-verified
entries inside the window. This tool reads every ``CORRECTNESS_r*.json``
in the repo root, computes each query's last fully-green round, and prints
the proposed next ordering: never-checked first, then stalest-first, with
ties broken by current position (stable). Usage:

    python tools/plan_rotation.py [window_size=50]

Apply by reordering the dict in ``__spark_entry__.queries()`` and updating
``tests/test_entry_ordering.py``'s constants.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def last_green_round() -> dict[str, int]:
    """query -> highest round number with a fully-green row (rows+schema+
    hash for oracle entries; rows-only entries count any non-error row)."""
    green: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        data = json.load(open(path))
        for q, row in data.items():
            ok = row.get("err") is None and row.get("rows_match")
            if ok and row.get("hash_match") is not None:
                ok = row.get("hash_match") or q in ROWS_ONLY
            if ok:
                green[q] = max(green.get(q, 0), rnd)
    return green


ROWS_ONLY = {
    "minhash_buckets", "lsh_candidate_pairs", "simhash_near_pairs",
    "ivf_kmeans_assign", "bpe_merges", "bpe_encode",
}


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(entry.queries().keys())
    green = last_green_round()
    pos = {n: i for i, n in enumerate(names)}
    # never-green first (staleness -1 < any round), then stalest, stable
    ordered = sorted(names, key=lambda n: (green.get(n, -1), pos[n]))
    print(f"# proposed ordering ({len(names)} entries, window={window})")
    for i, n in enumerate(ordered, 1):
        mark = "  <-- window boundary" if i == window else ""
        status = f"r{green[n]}-green" if n in green else "NEVER-CHECKED"
        print(f"{i:3d}  {n:35s} {status}{mark}")
    never_out = [n for n in ordered[window:] if n not in green]
    if never_out:
        print(f"\nWARNING: {len(never_out)} never-checked entries do not fit "
              f"the window: {never_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
