"""Print the parity tier ledger as a markdown table from PARITY_*.json.

Ground truth for "which model is verified at which tier" — regenerate the
PERF.md ledger from this instead of hand-editing rows.
"""
from __future__ import annotations

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

ORDER = {"small": 0, "medium": 1, "ml": 2, "mlfull": 3, "xing": 3}


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(HERE, "PARITY_*.json"))):
        name = os.path.basename(path)[len("PARITY_"):-len(".json")]
        with open(path) as f:
            d = json.load(f)
        rows.append((name, d.get("scale", "?"), bool(d.get("pass")),
                     d.get("runs", "?")))
    print("| artifact | tier | runs | status |")
    print("|---|---|---|---|")
    for name, scale, ok, runs in rows:
        print(f"| {name} | {scale} | {runs} | "
              f"{'pass' if ok else 'FAIL'} |")
    n_pass = sum(1 for r in rows if r[2])
    by_tier = {}
    for _, scale, ok, _ in rows:
        by_tier[scale] = by_tier.get(scale, 0) + 1
    print(f"\n{n_pass}/{len(rows)} artifacts pass; tiers: "
          + ", ".join(f"{k}={v}" for k, v in sorted(by_tier.items())))


if __name__ == "__main__":
    main()
