"""Invariants of the self-rotating driver grading window.

VERDICT r8 item 1: the window rotation was manual discipline and it
slipped — r8 graded the same 50 keys as r7 while code churned under
out-of-window grades. queries() now computes the window from the
committed CORRECTNESS_r*.json grade ages (stalest-green-first,
FORCE_WINDOW pins for acute churn, pins self-expiring once the
re-grade they asked for lands), so the discipline is code. These
tests pin the mechanism's contract: selection, ordering, pin expiry,
loud fallback, and the live-repo invariant that no out-of-window
grade is older than an unpinned in-window one.
"""

from __future__ import annotations

import sys
import warnings

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def _fake_declared(names):
    # values never called — rotation only reorders the mapping
    return {n: object() for n in names}


class TestRotateWindowUnit:
    NAMES = [f"q{i:02d}" for i in range(8)]

    def rotate(self, ages, forced=(), window=4):
        old = entrymod.DRIVER_WINDOW
        entrymod.DRIVER_WINDOW = window
        try:
            out = entrymod._rotate_window(
                _fake_declared(self.NAMES), ages, forced
            )
        finally:
            entrymod.DRIVER_WINDOW = old
        return list(out)

    def test_oldest_green_first_ties_by_declared_position(self):
        ages = {"q00": 8, "q01": 5, "q02": 8, "q03": 5, "q04": 6,
                "q05": 8, "q06": 5, "q07": 8}
        order = self.rotate(ages)
        # window = the three r5 grades + the one r6, declared order kept
        assert order[:4] == ["q01", "q03", "q04", "q06"]
        # out-of-window side also keeps declared relative order
        assert order[4:] == ["q00", "q02", "q05", "q07"]

    def test_never_graded_entries_lead(self):
        ages = {n: 5 for n in self.NAMES}
        del ages["q07"]  # never green
        order = self.rotate(ages)
        assert "q07" in order[:4]

    def test_active_pin_always_in_window(self):
        # q07 has the FRESHEST grade (r9) but code churned in r10:
        # a (q07, 10) pin must still include it
        ages = {n: 5 for n in self.NAMES}
        ages["q07"] = 9
        order = self.rotate(ages, forced=(("q07", 10),))
        assert "q07" in order[:4]
        # and it displaces exactly one stale slot
        assert sum(1 for n in order[:4] if ages[n] == 5) == 3

    def test_pin_self_expires_once_regrade_lands(self):
        # same pin, but q07's green grade is now >= the pinned round:
        # the pin has done its job and must stop burning a slot
        ages = {n: 5 for n in self.NAMES}
        ages["q07"] = 10
        order = self.rotate(ages, forced=(("q07", 10),))
        assert "q07" not in order[:4]
        assert sum(1 for n in order[:4] if ages[n] == 5) == 4

    def test_never_graded_pin_stays_active(self):
        order = self.rotate({}, forced=(("q07", 9),))
        assert "q07" in order[:4]

    def test_forced_unknown_names_ignored(self):
        order = self.rotate({}, forced=(("nope", 9),))
        assert set(order) == set(self.NAMES)

    def test_pin_overflow_warns(self):
        # More active pins than window slots silently displaces all
        # age-based rotation and leaves some pins ungraded — must warn
        # (ADVICE r9).
        forced = tuple((n, 99) for n in self.NAMES[:6])
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            self.rotate({}, forced=forced, window=4)
        assert any("FORCE_WINDOW pins exceed" in str(w.message) for w in caught)

    def test_no_warning_when_pins_fit(self):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            self.rotate({}, forced=(("q00", 99),), window=4)
        assert not [w for w in caught if "FORCE_WINDOW" in str(w.message)]

    def test_mapping_preserved(self):
        declared = _fake_declared(self.NAMES)
        out = entrymod._rotate_window(declared, {"q00": 5}, ())
        assert set(out) == set(declared)
        assert all(out[n] is declared[n] for n in self.NAMES)

    def test_next_round_rotation_simulated(self):
        # After this round grades its window green, re-running rotation
        # with those ages bumped must swap the window to the other
        # cohort — the property the manual process failed to deliver
        # in r8.
        ages = {n: 5 for n in self.NAMES[:4]}
        ages.update({n: 8 for n in self.NAMES[4:]})
        first = self.rotate(ages)
        ages2 = dict(ages, **{n: 9 for n in first[:4]})
        second = self.rotate(ages2)
        assert set(second[:4]) == set(self.NAMES[4:])


class TestQueriesFallback:
    def test_rotation_failure_warns_and_falls_back(self, monkeypatch):
        # A broken _grade_ages must not break grading (declared order
        # still served) but must NOT be silent either — silence is how
        # the r8 stale-window slip went unnoticed.
        def boom():
            raise ValueError("artifact schema changed")

        monkeypatch.setattr(entrymod, "_grade_ages", boom)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = entrymod.queries()
        assert list(out) == list(entrymod._declared_queries())
        assert any(
            "rotation failed" in str(w.message) for w in caught
        ), [str(w.message) for w in caught]


class TestLiveWindow:
    def test_declared_and_rotated_same_surface(self):
        declared = entrymod._declared_queries()
        rotated = entrymod.queries()
        assert set(declared) == set(rotated)
        assert len(rotated) == len(declared)

    def test_no_out_of_window_grade_older_than_unpinned_in_window(self):
        ages = entrymod._grade_ages()
        order = list(entrymod.queries())
        window = order[: entrymod.DRIVER_WINDOW]
        rest = order[entrymod.DRIVER_WINDOW :]
        active_pins = {
            n for n, rnd in entrymod.FORCE_WINDOW
            if n in set(order) and ages.get(n, -1) < rnd
        }
        assert active_pins <= set(window)
        unpinned = [ages.get(n, -1) for n in window if n not in active_pins]
        if unpinned and rest:
            assert max(unpinned) <= min(ages.get(n, -1) for n in rest)

    def test_grade_ages_reads_committed_artifacts(self):
        # Environment-dependent by design (ADVICE r9): on a fresh clone
        # without grade artifacts this is vacuous, not a code bug.
        if not entrymod._grade_ages():
            pytest.skip("no committed CORRECTNESS_r*.json artifacts")
        ages = entrymod._grade_ages()
        # every declared query has at least one committed green grade
        # (128/128 cumulative since r8) EXCEPT capability-gated entries
        # that were declared only where their optional dep exists and so
        # were never driver-gradable here. The exception is DERIVED from
        # the same capability flag the declaration uses, not hard-pinned
        # to this sandbox's dep set; a larger gap means parsing broke.
        gated = (
            {"streaming_status_change"} if entrymod._HAS_PROTOBUF else set()
        )
        missing = set(entrymod._declared_queries()) - set(ages)
        assert missing <= gated
        assert all(r >= 1 for r in ages.values())
