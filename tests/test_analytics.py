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


def test_mad_outliers_flags_only_far_readings(spark):
    from pyspark.sql import functions as F

    from iotstream.ext.analytics import mad_outliers

    # sensor A: temps 10,10,10,10,100 → median 10, absdevs {0,0,0,0,90},
    # MAD 0 → every nonzero deviation is an outlier (strict >).
    # sensor B: 10,20,30,40,50 → median 30, MAD 10 → |dev|>30 never hits.
    rows = [("A", i, t) for i, t in enumerate([10, 10, 10, 10, 100])] + [
        ("B", i, t) for i, t in enumerate([10, 20, 30, 40, 50])
    ]
    sensor = spark.createDataFrame(
        rows, "id string, seq long, temperature long"
    ).select(
        "id",
        F.concat_ws("-", "id", "seq").alias("messageId"),
        F.struct(
            F.col("temperature"), F.lit(0).alias("humidity")
        ).alias("metrics"),
    )
    out = mad_outliers(sensor, k=3.0).collect()
    assert [(r["id"], r["temperature"]) for r in out] == [("A", 100)]
    assert out[0]["med_t"] == 10.0 and out[0]["mad_t"] == 0.0


def test_rolling_range_frame_is_tie_stable(spark):
    """Equal timestamps are frame PEERS in a RANGE frame: both rows at
    t=0 count each other regardless of shuffle order."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        (1, T0, 7),
        (2, T0, 7),                               # same instant as 1
        (3, T0 + dt.timedelta(minutes=4), 7),     # inside 5-min lookback
        (4, T0 + dt.timedelta(minutes=20), 7),    # outside
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-300, 0)
    )
    got = {
        r["event_id"]: r["n"]
        for r in ev.select("event_id", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}


def test_scd2_opens_interval_only_on_change(spark):
    from iotstream.ext.analytics import scd2_history

    ev = _ev(
        spark,
        [(0, 1, "view"), (1, 1, "view"), (2, 1, "click"), (3, 1, "view")],
    )
    rows = sorted(scd2_history(ev).collect(), key=lambda r: r.valid_from)
    assert [r.status for r in rows] == ["view", "click", "view"]
    # Each interval closes exactly where the next opens.
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert [r.is_current for r in rows] == [False, False, True]


def test_rfm_extremes_get_best_and_worst_segments(spark):
    from iotstream.ext.analytics import rfm_segments

    # 8 users; user 7 is most recent + most frequent + highest spend,
    # user 0 oldest/least/lowest → segments 444 and 111.
    rows = []
    eid = 0
    for u in range(8):
        for k in range(u + 1):
            rows.append((eid, T0 + dt.timedelta(hours=u * 10 + k), u,
                         "purchase", float(10 * (u + 1))))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = {r.user_id: r for r in rfm_segments(ev).collect()}
    assert out[7].segment == "444" and out[0].segment == "111"
    assert out[7].frequency == 8 and out[7].monetary == 8 * 80.0
