"""Window-rotation planner for the driver's 50-query correctness gate.

The driver oracle-checks only the first 50 entries of
``__spark_entry__.queries()`` per round. This tool cross-references
every recorded ``CORRECTNESS_r*.json`` with the current declaration
order and reports, for each query: its position, whether it sits in
the checked window, and its best driver verdict so far — so each
round's reorder can promote never-green queries and keep regression
guards without bookkeeping by hand.

Usage: python tools/window_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    import __spark_entry__ as entrymod

    order = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())

    # Rank verdicts PASS > rows-only > FAIL and keep the best across
    # rounds, so a later rows-only/pass result upgrades an earlier FAIL.
    RANK = {"FAIL": 0, "rows-only": 1, "PASS": 2}
    best: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        data = json.load(open(path))
        for name, res in data.items():
            if res.get("hash_match"):
                kind = "PASS"
            elif res.get("rows_match"):
                kind = "rows-only"
            else:
                kind = "FAIL"
            entry = (RANK[kind], f"{kind} ({os.path.basename(path)})")
            if name not in best or entry[0] >= best[name][0]:
                best[name] = entry
    verdict = {name: label for name, (_, label) in best.items()}

    never = [q for q in order if q not in verdict and q in oracles]
    in_window_never = [q for q in never if order.index(q) < WINDOW]
    out_window_never = [q for q in never if order.index(q) >= WINDOW]

    print(f"{len(order)} declared; {len(oracles)} with oracles; "
          f"window = first {WINDOW}")
    print(f"\nnever driver-checked, IN window ({len(in_window_never)}):")
    for q in in_window_never:
        print(f"  {order.index(q):3d} {q}")
    print(f"\nnever driver-checked, OUT of window ({len(out_window_never)})"
          " — promote these next round:")
    for q in out_window_never:
        print(f"  {order.index(q):3d} {q}")
    print("\nwindow slots spent on already-green queries:")
    for q in order[:WINDOW]:
        if verdict.get(q, "").startswith("PASS"):
            print(f"  {order.index(q):3d} {q}  {verdict[q]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
