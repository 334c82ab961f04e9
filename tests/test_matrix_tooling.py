"""Matrix/sweep tooling contracts (r13, ADVICE r12 + VERDICT r12 item 1).

No Spark session — these pin the pure-Python plumbing: the bench
leg's contamination parsing and shared threshold, the per-round leg
list (unicode + reach gates actually wired in), and the digest-keyed
fixture markers that stop edited mutation specs from silently serving
stale cached fixtures.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

import degenerate_sweep as ds  # noqa: E402
import run_matrix as rm  # noqa: E402


def test_bench_contaminated_parses_flag_states():
    line = json.dumps({"metric": "x", "loadavg": {"contaminated": True}})
    assert rm._bench_contaminated(f"noise\n{line}\n") is True
    line = json.dumps({"metric": "x", "loadavg": {"contaminated": False}})
    assert rm._bench_contaminated(line) is False
    # no parsable line / no flag → None (treated as "unavailable")
    assert rm._bench_contaminated("no json here") is None
    assert rm._bench_contaminated(json.dumps({"metric": "x"})) is None


def test_bench_threshold_shared_with_bench_py():
    """ADVICE r12: the settle gate must read bench.py's own threshold,
    not a re-derived copy that silently diverges."""
    import bench

    assert rm._bench_threshold() == bench.load_at_start_threshold()


def test_build_legs_wires_round_stamped_gates():
    legs = dict(rm.build_legs(13))
    assert "unicode" in legs and legs["unicode"][-1] == "13"
    assert "reach" in legs and legs["reach"][-1] == "13"
    assert list(dict(rm.build_legs(13)))[-1] == "bench"  # bench runs last


def test_spec_digest_keys_fixture_markers(tmp_path):
    """Editing a mutation spec must invalidate the cached fixture —
    the r12-era empty `.complete` markers served stale fixtures until
    someone remembered to rm -rf them."""
    out = str(tmp_path / "fixture")
    os.makedirs(out)
    d1 = ds._spec_digest("v1", {"a": 1})
    assert not ds._fresh_marker(out, d1)  # no marker yet
    with open(f"{out}/.complete", "w") as f:
        f.write(d1)
    assert ds._fresh_marker(out, d1)
    d2 = ds._spec_digest("v1", {"a": 2})  # spec changed
    assert d2 != d1
    assert not ds._fresh_marker(out, d2)


def test_reach_exempt_names_are_declared_queries():
    """An exemption for a renamed/deleted query would silently rot."""
    import __spark_entry__ as em

    declared = set(em.queries().keys())
    for name in ds.REACH_EXEMPT:
        assert name in declared, name


def test_hostile_doc_twins_shape():
    """The near-dup twin placement only works if the twins keep equal
    length (same edit-distance block, zero length-delta) and share a
    source (the blocking key) — pin the construction."""
    twins = [r for r in ds.HOSTILE_DOC_ROWS if r["text"].startswith("tok000")]
    assert len(twins) == 2
    a, b = (t["text"] for t in twins)
    assert len(a) == len(b) and a != b
    assert a[:64] == b[:64]  # identical edit-distance prefix
    assert twins[0]["source"] == twins[1]["source"]
    diff = sum(1 for x, y in zip(a, b) if x != y)
    assert diff == 1  # single-character edit
