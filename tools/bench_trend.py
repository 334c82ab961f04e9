"""Per-query bench trend across driver rounds.

Reads every ``BENCH_r*.json`` (driver-recorded; compact stdout line
carries only the slowest queries, so coverage per round is partial)
plus the latest local ``BENCH_FULL.json``, and prints a per-query
timing series with flags:

- ``REGRESSED``: latest ≥1.5× its best recorded round AND ≥0.3 s
  absolute — worth a plan diff before blaming machine load.
- ``new``: first appearance this round (no comparison possible).

Totals across rounds are NOT like-for-like when the declared-query
count changes; the per-query series is the comparable unit.

Usage: python tools/bench_trend.py [--all]   (--all prints every
query, default only flagged/slow ones)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_num(path: str) -> int:
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _load(path: str) -> dict[str, float]:
    data = json.load(open(path))
    if "parsed" in data:  # driver capture wraps the stdout line
        data = data["parsed"] or {}  # None when the capture truncated
    # bench.py records -1.0 for errored queries: keep the sentinel out
    # of the min()/ratio math but surface it as ERRORED. A JSON null
    # (possible in a driver-captured line) would TypeError in the sort
    # key and the `latest < 0` flag — drop non-numeric values here.
    return {
        k: v
        for k, v in (data.get("queries") or {}).items()
        # bool is an int subclass: a malformed true/false must not
        # become a phantom 1.0s/0.0s baseline timing
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }


def main() -> int:
    show_all = "--all" in sys.argv
    series: dict[str, dict[str, float]] = {}
    cols: list[str] = []
    for path in sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=_round_num
    ):
        tag = f"r{_round_num(path)}"
        cols.append(tag)
        for q, sec in _load(path).items():
            series.setdefault(q, {})[tag] = sec
    full = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(full):
        cols.append("local")
        for q, sec in _load(full).items():
            series.setdefault(q, {})["local"] = sec

    flagged = 0
    header = f"{'query':34s} " + " ".join(f"{c:>7s}" for c in cols) + "  note"
    print(header)
    for q in sorted(series, key=lambda q: -max(series[q].values())):
        vals = series[q]
        latest_col = next(c for c in reversed(cols) if c in vals)
        latest = vals[latest_col]
        prior = [
            v
            for c, v in vals.items()
            if c != latest_col and v is not None and v >= 0
        ]
        note = ""
        if latest < 0:
            note = "ERRORED (latest run)"
            flagged += 1
        elif not prior:
            note = "new"
        else:
            best = min(prior)
            if latest >= 1.5 * best and latest - best >= 0.3:
                note = f"REGRESSED ({best:.2f}->{latest:.2f})"
                flagged += 1
        if not (show_all or note or latest >= 1.0):
            continue
        row = " ".join(
            f"{vals[c]:7.2f}" if vals.get(c) is not None else f"{'-':>7s}"
            for c in cols
        )
        print(f"{q:34s} {row}  {note}")
    print(f"\n{flagged} flagged regressions "
          "(latest >=1.5x best round and >=0.3s absolute)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
