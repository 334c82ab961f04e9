"""Unicode parity probe (r11: report-only; r12: a GATE).

A 100 TB training corpus is overwhelmingly multilingual, so unicode
parity between Spark and DuckDB is a correctness surface, not a
curiosity: regex word classes (Java regex vs DuckDB's RE2), length
semantics (code points vs bytes), case folding, collation of ORDER BY
on non-ASCII keys, JSON serde escaping of astral-plane characters.

This tool builds a unicode-bearing twin of the sf0.001 fixtures
(documents text in accented Latin / CJK / emoji / RTL Arabic /
combining marks; unicode event_type group keys; unicode JSON string
values in props) and runs the full check_oracle parity gate on it.

History: in r11 the multimodal fake-codec oracles were derived from an
ASCII ``n_bytes == n_chars`` contract, so the five multimodal queries
failed this probe BY CONSTRUCTION and the tool was report-only. In r12
the fake codec's oracles were rewritten to recompute from the UTF-8
payload BYTES (DuckDB ``strlen``/hex-nibble histogram — see
``oracle_sql()`` in ``__spark_entry__.py``), retiring that contract:
every declared query must now hold full value-level parity on
multilingual input, and the probe exits nonzero on ANY failure.
Unicode shapes also run inside the gated hostile sweep
(``tools/degenerate_sweep.py hostile``); this probe is kept as the
denser, documents-focused fixture and writes its per-query outcome to
``UNICODE_PROBE_r{N}.json``.

Usage: python tools/unicode_probe.py <round>
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/iotstream-degenerate/unicode"

#: documents.text rows; n_chars is set to the CODE-POINT count (python
#: len == Spark length() == DuckDB length()), which differs from the
#: UTF-8 byte count for every non-ASCII row — exactly the split the
#: byte-based fake-codec oracles must keep straight.
UNICODE_DOCS = [
    "café résumé naïve déjà vu über straße",          # accented Latin
    "这是 一个 测试 文本 分析 的 例子 你好 世界",          # CJK (spaced)
    "hello \U0001f44b world \U0001f30d emoji test",     # astral emoji
    "مرحبا بالعالم",  # RTL Arabic
    "élégant combining marks café",   # NFD combining
    "ΑΛΦΑ βήτα ΓΆΜΜΑ mixed ΚΕΦΑΛΑΙΑ greek case",       # case folding
]


def build() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = f"{OUT}/.complete"
    if os.path.exists(marker):
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(SRC):
        if not f.endswith(".parquet"):
            continue
        if f not in ("documents.parquet", "events.parquet"):
            shutil.copy(os.path.join(SRC, f), os.path.join(OUT, f))

    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    head = t.slice(0, len(UNICODE_DOCS)).to_pydict()
    mx = pa.compute.max(t.column("doc_id")).as_py()
    rows = {c: list(head[c]) for c in t.column_names}
    for i, text in enumerate(UNICODE_DOCS):
        rows["doc_id"][i] = mx + 1 + i
        rows["text"][i] = text
        rows["n_chars"][i] = len(text)
    pq.write_table(
        pa.concat_tables([t, pa.Table.from_pydict(rows, schema=t.schema)]),
        os.path.join(OUT, "documents.parquet"),
    )

    e = pq.read_table(os.path.join(SRC, "events.parquet"))
    ehead = e.slice(0, 3).to_pydict()
    emx = pa.compute.max(e.column("event_id")).as_py()
    erows = {c: list(ehead[c]) for c in e.column_names}
    muts = [
        {"event_type": "café_click"},                       # unicode group key
        {"event_type": "购买"},                      # CJK group key
        {"props": '{"k": 1, "s": "emoji \U0001f680 café"}'},  # unicode JSON value
    ]
    for i, m in enumerate(muts):
        erows["event_id"][i] = emx + 1 + i
        for c, v in m.items():
            erows[c][i] = v
    pq.write_table(
        pa.concat_tables([e, pa.Table.from_pydict(erows, schema=e.schema)]),
        os.path.join(OUT, "events.parquet"),
    )
    open(marker, "w").close()
    return OUT


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    fixture = build()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracle.py"), fixture],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    out = proc.stdout + proc.stderr
    results: dict[str, dict] = {}
    for raw in out.splitlines():
        for seg in raw.split("\r"):
            m = re.match(r"\s*(OK|FAIL)\s+(\w+):\s*(.*)", seg.strip())
            if not m:
                continue
            status, name, detail = m.groups()
            rec: dict = {"status": status.lower()}
            if status == "FAIL":
                rec["detail"] = detail.strip()[:200]
            results[name] = rec
    failures = sorted(
        n for n, r in results.items() if r["status"] == "fail"
    )
    artifact = {
        "round": rnd,
        "purpose": (
            "GATED unicode parity probe: every declared query must hold "
            "value-level Spark≡DuckDB parity on non-ASCII document "
            "text, unicode group keys, and unicode JSON values. The "
            "r11 n_bytes == n_chars ASCII fake-codec contract is "
            "retired — the multimodal oracles recompute from UTF-8 "
            "bytes, so the multimodal family is graded here like "
            "everything else."
        ),
        "started_unix": int(time.time()),
        "fixture": fixture,
        "n_queries": len(results),
        "n_pass": sum(1 for r in results.values() if r["status"] == "ok"),
        "failures": failures,
        "queries": results,
    }
    path = os.path.join(REPO, f"UNICODE_PROBE_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(
        f"wrote {path}: {artifact['n_pass']}/{len(results)} pass, "
        f"{len(failures)} failures {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
