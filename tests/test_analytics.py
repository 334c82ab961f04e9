"""Funnel and cohort-retention semantics on hand-built timelines."""

import datetime as dt

from iotstream.ext.analytics import cohort_retention, funnel

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # a Monday


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(hours=h), u, t, 0.0)
            for i, (h, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_funnel_requires_stage_order(spark):
    ev = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (0, 1, "view"), (1, 1, "click"), (2, 1, "purchase"),
            # user 2: click BEFORE the first view only → stalls at view
            (0, 2, "click"), (1, 2, "view"), (2, 2, "purchase"),
            # user 3: purchase before click-after-view → stalls at click
            (0, 3, "view"), (1, 3, "purchase"), (2, 3, "click"),
            # user 4: never views → counted nowhere
            (0, 4, "click"), (1, 4, "purchase"),
        ],
    )
    out = {r.stage: r.users for r in funnel(ev).collect()}
    assert out == {
        "view": 3,              # users 1, 2, 3
        "click_after_view": 2,  # users 1, 3
        "purchase_after_click": 1,  # user 1 only
    }


def test_funnel_same_timestamp_counts_inclusive(spark):
    # view and click in the same hour-0 event pair at identical ts:
    # conversion uses ts >= (inclusive), matching the SQL twin
    ev = _ev(spark, [(0, 1, "view"), (0, 1, "click")])
    out = {r.stage: r.users for r in funnel(ev).collect()}
    assert out["click_after_view"] == 1


def test_cohort_retention_offsets(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view"),            # user 1 week 0
            (24 * 7, 1, "view"),       # user 1 active again week 1
            (24 * 7, 2, "view"),       # user 2 first seen week 1
            (24 * 21, 2, "view"),      # user 2 active week 3 (offset 2)
        ],
    )
    rows = cohort_retention(ev).collect()
    key = {
        (r.cohort_week.isoformat()[:10], r.week_offset): r.active_users
        for r in rows
    }
    assert key == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }
