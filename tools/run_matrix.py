"""Single-command verification matrix (VERDICT r9 item 5 / r10 item 3).

Runs every leg of the repo's verification matrix sequentially — the
exact set the round-end discipline requires — and writes a committed
``MATRIX_r{N}.json`` artifact with per-leg pass/fail, duration, and
output tail, so any leg failure is visible without log archaeology:

    pytest        python -m pytest tests/ -q
    walker        tools/window_plan.py (freshness audit — fails when a
                  churn-stale green or never-graded oracle sits OUT of
                  the rotation window, i.e. needs a FORCE_WINDOW pin)
    oracle_sf0001 tools/check_oracle.py sf0.001
    oracle_sf001  tools/check_oracle.py sf0.01   (the driver's t2 scale)
    oracle_sf01   tools/check_oracle.py sf0.1    (boundary-precision bugs)
    oracle_tz     tools/check_oracle.py --tz=America/New_York sf0.01
    dtypes        tools/check_dtypes.py sf0.01
    degenerate    tools/degenerate_sweep.py both (empty + single-row)
    nulls         tools/degenerate_sweep.py nulls (full NULL-parity gate)
    hostile       tools/degenerate_sweep.py hostile (NaN/±Inf, boundary
                  timestamps, adversarial vectors — full parity gate)
    bench         python bench.py (solo — never concurrent with other
                  Spark work; the compact JSON line is recorded)

Legs run one at a time (the bench leg REQUIRES that; oracle checks
tolerate concurrency but sequential keeps timings attributable).

Usage: python tools/run_matrix.py <round> [--skip LEG[,LEG...]] [--only LEG[,LEG...]]
Exit 1 if any executed leg fails. Skipped legs are recorded as
``"skipped"`` — an artifact with skips documents a PARTIAL matrix.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PY = sys.executable

LEGS: list[tuple[str, list[str]]] = [
    ("pytest", [PY, "-m", "pytest", "tests/", "-q"]),
    ("walker", [PY, "tools/window_plan.py"]),
    ("oracle_sf0001", [PY, "tools/check_oracle.py", "/root/testdata/sf0.001"]),
    ("oracle_sf001", [PY, "tools/check_oracle.py", "/root/testdata/sf0.01"]),
    ("oracle_sf01", [PY, "tools/check_oracle.py", "/root/testdata/sf0.1"]),
    (
        "oracle_tz",
        [PY, "tools/check_oracle.py", "--tz=America/New_York",
         "/root/testdata/sf0.01"],
    ),
    ("dtypes", [PY, "tools/check_dtypes.py", "/root/testdata/sf0.01"]),
    ("degenerate", [PY, "tools/degenerate_sweep.py", "both"]),
    ("nulls", [PY, "tools/degenerate_sweep.py", "nulls"]),
    ("hostile", [PY, "tools/degenerate_sweep.py", "hostile"]),
    ("bench", [PY, "bench.py"]),
]


def git_head() -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        )
        return out.stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        return None


def main() -> int:
    args = sys.argv[1:]
    if not args or not args[0].isdigit():
        print(__doc__)
        return 2
    rnd = int(args[0])
    skip: set[str] = set()
    only: set[str] | None = None
    for a in args[1:]:
        if a.startswith("--skip"):
            skip |= set(a.split("=", 1)[1].split(","))
        elif a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    known = {n for n, _ in LEGS}
    bad = (skip | (only or set())) - known
    if bad:
        print(f"unknown legs: {sorted(bad)}; known: {sorted(known)}")
        return 2

    result: dict = {
        "round": rnd,
        "git_head": git_head(),
        "started_unix": int(time.time()),
        "legs": {},
    }
    any_fail = False
    for name, cmd in LEGS:
        if name in skip or (only is not None and name not in only):
            result["legs"][name] = {"status": "skipped"}
            print(f"SKIP  {name}")
            continue
        if name == "bench" and len([l for l in result["legs"].values() if l.get("seconds")]) > 0:
            # The bench leg runs last, right after eight Spark-heavy
            # legs: without a settle the capture starts with the
            # previous leg's 1-min loadavg residue and reads "not
            # provably idle" even on an otherwise quiet machine. 90 s
            # lets load1 decay below the contamination threshold.
            print("SETTLE 90s before bench (loadavg decay)", flush=True)
            time.sleep(90)
        print(f"RUN   {name}: {' '.join(cmd)}", flush=True)
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
            )
            rc, out = proc.returncode, proc.stdout + proc.stderr
        except subprocess.TimeoutExpired:
            rc, out = -1, "TIMEOUT after 3600s"
        dur = round(time.monotonic() - t0, 1)
        # tail: the verdict lines every leg prints last (ALL OK /
        # failure list / pytest summary / bench JSON). Spark progress
        # bars arrive as \r-terminated segments and Spark/parquet log
        # chatter interleaves — filter from the FULL output, then keep
        # the last meaningful lines.
        noise = (
            "WARN", "INFO", "log4j", "Using Spark", "[Stage",
            "Scaling row group", "SLF4J", "NativeCodeLoader",
        )
        tail = [
            s for ln in out.splitlines() for s in (x.strip() for x in ln.split("\r"))
            if s and not any(t in s for t in noise)
        ][-6:]
        status = "pass" if rc == 0 else "FAIL"
        if rc != 0:
            any_fail = True
        result["legs"][name] = {
            "status": status,
            "rc": rc,
            "seconds": dur,
            "tail": tail,
        }
        print(f"{status:5} {name} in {dur}s")
    result["total_seconds"] = round(
        sum(
            leg.get("seconds", 0) for leg in result["legs"].values()
        ), 1,
    )
    result["all_pass"] = not any_fail and not any(
        leg["status"] == "skipped" for leg in result["legs"].values()
    )
    path = os.path.join(REPO, f"MATRIX_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"\nwrote {path}  all_pass={result['all_pass']}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
