"""EXT — temporal joins the reference cannot express at all.

Two operators a training-data / IoT analytics pipeline needs constantly:

- **as-of join** (``asof_last_purchase``): attach to each left row the
  most recent right row at-or-before its timestamp, per key. Spark has
  no ASOF JOIN; the scalable formulation is NOT a join at all but a
  union + ordered window: tag both sides, sort within key by time, and
  carry the last-seen right row forward with ``last(..., ignorenulls)``.
  ONE shuffle on the key, zero join explosion, no range probing —
  survives any corpus size because each key's timeline is processed
  linearly.

- **interval join** (``interval_follow``): pair each anchor row with
  every row of the same key inside a following time window. A naive
  range join is O(n²) per key; the scale path buckets time into
  window-sized bins, equi-joins on (key, bin) with the anchor exploded
  to the two bins its window can reach, then applies the exact range
  predicate. Candidate count scales with true temporal density, not
  row-count² — the same blocking idea as LSH banding in ``dedup``.

- **gap-fill + LOCF** (``gapfill_locf``): densify a per-sensor time
  series to one row per bucket, carrying the last observation forward
  into empty buckets (TimescaleDB ``time_bucket_gapfill`` + ``locf``;
  the hypertable-rollup op the reference's KSQL layer cannot express).
  Missing buckets are generated with ``sequence()`` + ``explode`` from
  each sensor's own [first, last] span — distributed, no driver-side
  calendar, output bounded by span/width per key rather than by any
  global range. Every shuffle (bucket agg, span agg, skeleton join,
  LOCF window) is keyed on the sensor id, so AQE coalesces them and no
  stage ever sees more than one sensor's timeline at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_last_purchase(events: DataFrame) -> DataFrame:
    """For every click, the most recent purchase by the same user
    at-or-before the click (inclusive, like DuckDB ``ASOF JOIN ...
    ON c.ts >= p.ts``). Clicks with no prior purchase keep NULLs
    (left-outer semantics)."""
    ev = events.select("event_id", "ts", "user_id", "event_type", "value")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "is_left", (F.col("event_type") == "click").cast("int")
    )
    # At equal ts the purchase sorts first (is_left asc) → inclusive >=.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_left"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase = F.when(
        F.col("is_left") == 0,
        F.struct(
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        ),
    )
    return (
        both.withColumn("p", F.last(purchase, ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "ts",
            "user_id",
            "value",
            F.col("p.purchase_event_id").alias("purchase_event_id"),
            F.col("p.purchase_ts").alias("purchase_ts"),
            F.col("p.purchase_value").alias("purchase_value"),
        )
    )


def interval_follow(
    events: DataFrame, anchor_type: str = "error", window_seconds: int = 1800
) -> DataFrame:
    """Per anchor event: count + exact sum of the same user's events in
    the (anchor.ts, anchor.ts + window] interval. Bucketed equi-join —
    the anchor side explodes to the two window-sized time bins its
    interval can touch, so the shuffle key is (user_id, bin) and no
    per-key cross product ever forms. Anchors with no followers are
    dropped (inner-join semantics, matching the SQL twin)."""
    ws = F.lit(window_seconds)
    ep = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731  (second precision)
    follow = events.select(
        "user_id",
        F.col("ts").alias("f_ts"),
        F.col("value").alias("f_value"),
    ).withColumn("bin", F.floor(ep("f_ts") / ws))
    anchors = (
        events.filter(F.col("event_type") == anchor_type)
        .select("event_id", "user_id", F.col("ts").alias("a_ts"))
        .withColumn(
            "bin",
            F.explode(
                F.array(F.floor(ep("a_ts") / ws), F.floor(ep("a_ts") / ws) + 1)
            ),
        )
    )
    pairs = anchors.join(follow, ["user_id", "bin"]).filter(
        (F.col("f_ts") > F.col("a_ts"))
        & (F.col("f_ts") <= F.col("a_ts") + F.make_dt_interval(secs=ws))
    )
    # finite-measures contract on the SUM only (r13 reach audit): a
    # follower with a NaN/±Inf value is still an event — it counts in
    # n_follow — but the exact-DECIMAL sum is only defined over finite
    # inputs. Spark's CAST silently NULLs NaN (the row would vanish
    # from the sum with no declared rule) while DuckDB raises; the
    # explicit CASE gives both engines the same clause. NULL values
    # are skipped by SUM identically on both engines already.
    fv = F.col("f_value")
    finite_fv = ~F.isnan(fv) & (F.abs(fv) != F.lit(float("inf")))
    return pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        F.sum(F.when(finite_fv, fv).cast("decimal(12,4)"))
        .cast("double")
        .alias("follow_value"),
    )


def gapfill_locf(
    sensor: DataFrame,
    value: str = "metrics.temperature",
    bucket_width: str = "1 minute",
) -> DataFrame:
    """Dense per-sensor series: one row per ``bucket_width`` bucket in
    each sensor's [first, last] observed span, value = bucket AVG where
    observed, else last observation carried forward. ``filled`` marks
    the synthesized rows. Matches TimescaleDB
    ``time_bucket_gapfill(...) + locf(avg(...))`` semantics; unit
    hard-wired to minute buckets for the 1-minute flagship granularity
    (callers pass e.g. "5 minutes" for coarser rollups).
    """
    n_min = int(bucket_width.split()[0]) if bucket_width[0].isdigit() else 1
    step = F.expr(f"interval {n_min} minute")
    bucket = F.date_trunc("minute", F.col("ts"))
    if n_min != 1:
        epoch_min = (F.unix_timestamp(bucket) / 60).cast("long")
        # pmod, not %: Spark's % takes the DIVIDEND's sign, so for a
        # pre-epoch timestamp (negative epoch) `e - e % n` rounds UP
        # into the NEXT bucket while DuckDB's time_bucket floors — the
        # r11 hostile-values sweep caught a 1969-12-31 observation
        # landing in the 1970-01-01 bucket. pmod is always >= 0, so
        # the subtraction floors on both sides of the epoch.
        bucket = F.timestamp_seconds(
            (epoch_min - F.pmod(epoch_min, F.lit(n_min))) * 60
        )
    # event_time_only contract: a NULL timestamp has no bucket; without
    # the filter it forms a NULL observed bucket that poisons the lead()
    # segment chain (and the engines' null-ordering defaults differ).
    sensor = sensor.filter(F.col("ts").isNotNull())
    obs = sensor.groupBy(F.col("id"), bucket.alias("bucket")).agg(
        F.round(F.avg(value), 6).alias("obs_v")
    )
    # Segment formulation (same shape as interpolate_linear): each
    # observed bucket owns [bucket, next observed bucket) and the
    # carried value is constant across the segment, so the dense series
    # is PRODUCED by a narrow explode over observed rows — one lead()
    # window over the (small) observed set, no skeleton join and no
    # IGNORE-NULLS window over the (large) densified output.
    w = Window.partitionBy("id").orderBy("bucket")
    seg = obs.select(
        "id",
        F.col("bucket").alias("seg_start"),
        "obs_v",
        F.lead("bucket").over(w).alias("nxt_bucket"),
    )
    seg_end = F.coalesce(
        F.timestamp_seconds(
            F.unix_timestamp("nxt_bucket") - F.lit(60 * n_min)
        ),
        F.col("seg_start"),
    )
    dense = seg.select(
        "id",
        "obs_v",
        F.col("seg_start"),
        F.explode(F.sequence(F.col("seg_start"), seg_end, step)).alias(
            "bucket"
        ),
    )
    return dense.select(
        "id",
        "bucket",
        F.col("obs_v").alias("temperature"),
        (F.col("bucket") != F.col("seg_start")).alias("filled"),
    )


def continuous_rollup(sensor: DataFrame) -> DataFrame:
    """Hierarchical (continuous-aggregate-style) rollup: hour-level
    stats derived FROM the minute-level materialization, not from raw
    rows — TimescaleDB's continuous aggregate / hypertable rollup
    pattern, which the reference's KSQL layer cannot chain.

    The hour pass re-aggregates decomposable partials (max of maxes,
    min of mins, sum of sums / sum of counts for the average), so at
    production scale it reads the minute table — orders of magnitude
    smaller than raw — and stays exact: the partial sums are BIGINT,
    so re-aggregation is order-independent with no float drift. Both
    shuffles key on (id, bucket) and the second input is already tiny.
    """
    t = F.col("metrics.temperature")
    minute = sensor.groupBy(
        "id", F.window("ts", "1 minute").alias("w")
    ).agg(
        F.max(t).alias("max_t"),
        F.min(t).alias("min_t"),
        F.sum(t).alias("sum_t"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        minute.groupBy(
            "id", F.date_trunc("hour", F.col("w.start")).alias("hour_start")
        )
        .agg(
            F.max("max_t").alias("max_temp"),
            F.min("min_t").alias("min_temp"),
            F.round(F.sum("sum_t") / F.sum("cnt"), 6).alias("avg_temp"),
            F.sum("cnt").alias("n_readings"),
        )
    )


def ewma_smooth(sensor: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Per-sensor exponentially weighted moving average — the
    recursive smoother (s_i = α·x_i + (1−α)·s_{i−1}) that SQL window
    frames cannot express.

    Shape: ONE shuffle (repartition by id + sortWithinPartitions), then
    ``mapInPandas`` streams each partition's Arrow batches through
    pandas' C *grouped* ewm kernel — one kernel call per batch covering
    every sensor in it, instead of one Python round-trip per sensor
    (IoT cardinalities mean thousands of tiny groups; per-group
    ``applyInPandas`` pays frame-construction overhead 1000×). A sensor
    whose timeline spans batch boundaries continues exactly via a
    carried seed row: ewm(adjust=False) starts at its first value, so
    prepending the previous batch's (unrounded) smoothed value replays
    the recursion bit-for-bit. State is O(sensors-per-partition)
    floats — no group ever needs to fit in memory whole, which is
    strictly weaker than the usual per-key-history contract."""
    import numpy as np
    import pandas as pd

    # event_time_only contract: a recursive smoother is order-defined;
    # rows with NULL event time have no position in the recursion.
    flat = sensor.filter(F.col("ts").isNotNull()).select(
        "id", "messageId", "ts", F.col("metrics.temperature").alias("temperature")
    )
    spark = sensor.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rep = flat.repartition(n, "id").sortWithinPartitions("id", "ts", "messageId")

    def smooth(batches):
        carry: dict = {}  # id (None for the NULL group) -> last smoothed value
        # Missing-key normalizer: pandas labels the dropna=False NULL
        # group NaN (a float) while Arrow delivers NULL string ids as
        # None — without one canonical key the NULL group's carried
        # state is stored under NaN and looked up under None, silently
        # restarting its recursion at every Arrow batch boundary.
        norm = lambda k: None if pd.isna(k) else k  # noqa: E731
        for pdf in batches:
            if pdf.empty:
                continue
            seeds = [s for s in pdf["id"].unique() if norm(s) in carry]
            if seeds:
                seed_df = pd.DataFrame(
                    {
                        "id": seeds,
                        "messageId": "",
                        "ts": pd.NaT,
                        "temperature": 0,
                        "_x": [carry[norm(s)] for s in seeds],
                        "_seed": True,
                    }
                )
                work = pd.concat(
                    [seed_df, pdf.assign(_x=pdf["temperature"].astype("float64"), _seed=False)],
                    ignore_index=True,
                )
            else:
                work = pdf.assign(_x=pdf["temperature"].astype("float64"), _seed=False)
            # Grouped C kernel: seed rows sort first within their group
            # (concat order), so each group's recursion resumes from the
            # carried state; row order within groups is already (ts,
            # messageId) from sortWithinPartitions. dropna=False: a NULL
            # sensor id is a legitimate SQL group (pandas' default
            # silently drops it — and crashes outright on a batch whose
            # ids are ALL null: zero groups to concatenate).
            s = (
                work.groupby("id", sort=False, dropna=False)["_x"]
                .ewm(alpha=alpha, adjust=False)
                .mean()
                .reset_index(level=0, drop=True)
            )
            work["_s"] = s
            carry.update(
                (norm(k), v)
                for k, v in work.groupby("id", sort=False, dropna=False)["_s"]
                .last()
                .items()
            )
            out = work[~work["_seed"]]
            yield pd.DataFrame(
                {
                    "id": out["id"],
                    "messageId": out["messageId"],
                    "ts": out["ts"],
                    "temperature": out["temperature"],
                    # half-AWAY at 6 decimals (not .round's banker's):
                    # SQL engines round half away from zero, and the
                    # recursive-CTE oracle must land on the identical
                    # value when s*1e6 sits exactly on a half-integer.
                    # copysign makes it sign-aware — plain floor(x+.5)
                    # rounds negative ties toward +inf, diverging from
                    # the oracle for below-zero temperatures.
                    "ewma_t": np.copysign(
                        np.floor(np.abs(out["_s"]) * 1e6 + 0.5), out["_s"]
                    )
                    / 1e6,
                }
            )

    return rep.mapInPandas(
        smooth,
        "id string, messageId string, ts timestamp, "
        "temperature bigint, ewma_t double",
    )

def time_weighted_avg(
    sensor: DataFrame,
    value: str = "metrics.temperature",
    bucket_width: str = "1 day",
) -> DataFrame:
    """Time-weighted average per sensor per bucket — TimescaleDB's
    ``time_weight('locf') → average()`` over irregular samples, which
    plain AVG gets wrong when readings are unevenly spaced (a value
    held for 9 h must count 9× more than one replaced after 1 h).

    Bucket-local LOCF integral: each reading holds its value until the
    sensor's NEXT reading inside the same bucket; the integral runs
    from the first to the last sample of the bucket and is divided by
    that observed span (carry-in from the previous bucket is not
    counted — documented deviation that keeps the op one ordered pass).
    Single-sample buckets (and zero-width spans) degenerate to the
    plain value, like TimescaleDB's ``average`` of a one-point weight.

    Scale: the lead() window and the groupBy share the (id, bucket)
    partitioning — ONE shuffle; weights are exact integer microseconds
    and the numerator Σ(value·Δt) is a BIGINT sum (order-independent,
    < 2⁵³ for any realistic bucket), so the single final division is
    the only float op.
    """
    bucket = F.date_trunc(bucket_width.split()[-1].rstrip("s"), F.col("ts"))
    flat = sensor.select(
        "id",
        "messageId",
        "ts",
        bucket.alias("bucket"),
        F.col(value).alias("v"),
    )
    w = Window.partitionBy("id", "bucket").orderBy("ts", "messageId")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    weighted = flat.withColumn("dur_us", dur)
    return (
        weighted.groupBy("id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.sum(F.col("v") * F.col("dur_us")).alias("_num"),
            F.sum("dur_us").alias("_den"),
            F.min("v").alias("_fallback"),
        )
        .select(
            "id",
            "bucket",
            "n_readings",
            F.when(
                F.col("_den") > 0,
                F.round(
                    F.col("_num").cast("double") / F.col("_den").cast("double"), 6
                ),
            )
            .otherwise(F.col("_fallback").cast("double"))
            .alias("twa_temperature"),
        )
    )


def interpolate_linear(
    sensor: DataFrame,
    value: str = "metrics.temperature",
    bucket_width: str = "60 minutes",
) -> DataFrame:
    """Gap-fill with LINEAR interpolation — TimescaleDB
    ``time_bucket_gapfill + interpolate``: dense per-sensor series over
    each sensor's [first, last] span, missing buckets filled by the
    straight line between the surrounding observed buckets (LOCF's
    smoother sibling; every interior gap has both neighbors because the
    span is anchored at observed endpoints).

    Scale shape: the heavy lifting happens on the OBSERVED rows, never
    the densified output. One (id, bucket) aggregate, one lead() window
    over observed buckets (orders of magnitude fewer rows than the
    dense skeleton), then each consecutive-observation segment explodes
    its own gap with the slope already attached — a narrow map. The
    dense series is produced, not sorted: no window ever scans the
    skeleton, and the old spans/skeleton/join subtree (which recomputed
    the aggregate and ran two opposite unbounded frames over the 1M-row
    dense set) is gone. Interpolation arithmetic is exact-integer in x
    (epoch seconds), one float expression in y, rounded to 6 on both
    engines.
    """
    n_min = int(bucket_width.split()[0]) if bucket_width[0].isdigit() else 1
    step = F.expr(f"interval {n_min} minute")
    bucket = F.date_trunc("minute", F.col("ts"))
    if n_min != 1:
        epoch_min = (F.unix_timestamp(bucket) / 60).cast("long")
        # pmod, not %: Spark's % takes the DIVIDEND's sign, so for a
        # pre-epoch timestamp (negative epoch) `e - e % n` rounds UP
        # into the NEXT bucket while DuckDB's time_bucket floors — the
        # r11 hostile-values sweep caught a 1969-12-31 observation
        # landing in the 1970-01-01 bucket. pmod is always >= 0, so
        # the subtraction floors on both sides of the epoch.
        bucket = F.timestamp_seconds(
            (epoch_min - F.pmod(epoch_min, F.lit(n_min))) * 60
        )
    sensor = sensor.filter(F.col("ts").isNotNull())  # event_time_only contract
    obs = sensor.groupBy(F.col("id"), bucket.alias("bucket")).agg(
        F.round(F.avg(value), 6).alias("obs_v")
    )
    # Each observed bucket pairs with the sensor's NEXT observed bucket;
    # the segment [bucket, nxt_bucket) owns every dense output row in it
    # (the final observation owns just itself), so segments partition the
    # output and the explode below cannot duplicate or drop a bucket.
    w = Window.partitionBy("id").orderBy("bucket")
    seg = obs.select(
        "id",
        F.col("bucket").alias("seg_start"),
        "obs_v",
        F.lead("bucket").over(w).alias("nxt_bucket"),
        F.lead("obs_v").over(w).alias("nxt_v"),
    )
    seg_end = F.coalesce(
        F.timestamp_seconds(
            F.unix_timestamp("nxt_bucket") - F.lit(60 * n_min)
        ),
        F.col("seg_start"),
    )
    dense = seg.select(
        "id",
        "obs_v",
        "nxt_v",
        F.unix_timestamp("seg_start").alias("x0"),
        F.unix_timestamp("nxt_bucket").alias("x1"),
        F.explode(F.sequence(F.col("seg_start"), seg_end, step)).alias(
            "bucket"
        ),
    )
    x = F.unix_timestamp("bucket")
    is_obs = x == F.col("x0")
    # sign(x)·floor(|x|·1e6 + 0.5)/1e6 instead of round(x, 6): engines
    # disagree on round() when the interpolated double sits exactly on a
    # 7th-decimal tie (Java rounds the shortest decimal repr, DuckDB the
    # scaled float); this explicit IEEE chain is bit-identical
    # everywhere, and the sign factor keeps it HALF_AWAY (matching SQL)
    # for negative temperatures too.
    raw = F.col("obs_v") + (F.col("nxt_v") - F.col("obs_v")) * (
        (x - F.col("x0")).cast("double")
        / (F.col("x1") - F.col("x0")).cast("double")
    )
    interp = (
        F.signum(raw) * F.floor(F.abs(raw) * 1000000.0 + F.lit(0.5)) / 1000000.0
    )
    return dense.select(
        "id",
        "bucket",
        F.when(is_obs, F.col("obs_v")).otherwise(interp).alias("temperature"),
        (~is_obs).alias("filled"),
    )


def rate_of_change(
    sensor: DataFrame,
    value: str = "metrics.temperature",
) -> DataFrame:
    """Per-sensor per-day rate of change — the PromQL ``rate()`` /
    TimescaleDB ``delta/duration`` idiom over irregular samples:
    (last − first) / observed span, scaled to per-hour units.

    min_by/max_by over the (ts, messageId) event-order struct — ONE
    partial-aggregating HashAggregate, no window sort (same plan shape
    as ``latest_reading``/``candlestick``); the division is the only
    float op, guarded against zero-width spans (single-sample days →
    NULL rate, count still reported).
    """
    order = F.struct("ts", "messageId")
    v = F.col(value)
    span_us = F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
    return (
        sensor.groupBy(
            "id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            F.min_by(v, order).alias("first_v"),
            F.max_by(v, order).alias("last_v"),
            span_us.alias("_span_us"),
        )
        .select(
            "id",
            "day",
            "n_readings",
            F.when(
                F.col("_span_us") > 0,
                F.round(
                    (F.col("last_v") - F.col("first_v")).cast("double")
                    * 3600000000.0
                    / F.col("_span_us").cast("double"),
                    6,
                ),
            ).alias("temp_rate_per_hour"),
        )
    )
