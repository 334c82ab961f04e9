"""Degenerate-input sweep: every declared query against EMPTY and
SINGLE-ROW fixtures.

At 100 TB scale, empty partitions, empty filter results, and
single-row groups are routine — a date-range filter that matches
nothing, a brand-new tenant with one event, an empty replica after
partition pruning. The oracle gate only exercises the populated
fixtures, so division-by-zero, head()-on-empty, `.first()[0]`
unwraps, variance-of-one, and empty-codebook edge cases hide from it
entirely. This sweep derives schema-identical fixture dirs with
``limit 0`` and ``limit 1`` from sf0.001 and requires every declared
query to EXECUTE (collect) without raising; row counts are free to be
zero.

Streaming queries run too — their sources read the same parquet dirs
through FileStreamSource, so an empty dir exercises the
no-files/no-batches path that a real deployment hits on a quiet
topic.

A third mode, ``nulls``, builds a NULL-bearing fixture dir (documents
extended with NULL-text "failed fetch" rows — n_chars NULL too, since
a failed fetch has no known length — and zero-length rows with
n_chars 0) and runs the FULL
check_oracle gate on it: not just "doesn't crash" but value-level
Spark≡DuckDB parity on a corpus with NULL and empty documents. This
is the sweep that found (r9): the descending-sequence shingle crash
on <n-word docs, the NOT IN vs left_anti NULL divergence in
decontaminate, gopher_quality's ANSI divide-by-zero on empty docs,
doc_chunks' phantom negative chunk ids, and the multimodal NULL
payload crashes.

A fourth mode, ``hostile`` (r11), injects hostile VALUES rather than
NULLs — IEEE NaN/±Inf measures, pre-epoch and far-future event times,
empty-string group keys, quote/newline/control characters through the
JSON serde, extreme-but-valid JSON, whitespace-only / punctuation-only
/ one-enormous-token documents, and adversarial embedding vectors
(NaN component, +Inf component, all-zero = no direction, exact
duplicate of a real vector) — and runs the FULL parity gate on the
result. Since r12 the hostile corpus also injects UNICODE shapes
(multilingual document text, unicode group keys, unicode JSON values):
the fake-codec contract is byte-based (the oracles recompute from
UTF-8 bytes via strlen/hex-nibble), so multilingual text is a gated
parity surface, no longer a report-only probe. The r11 single-NaN-row
shapes are also broadened here: NaN at BOTH extremes of a group, an
ALL-NaN group, and NaN ties — the placements percentile/min_by/
rank-order paths are sensitive to that one row per table cannot
exercise.

A fifth mode, ``reach`` (r13, VERDICT r12 item 1), is the
injection-reachability audit: the hostile gate is only as strong as
the rows that actually SURVIVE each query's filter lineage — r12
proved three lineitem consumers' NaN guards had passed grading purely
because the injected rows dodged their filters. The audit runs every
declared query twice, on the clean sf0.001 fixture and on the hostile
fixture, canonicalizes both outputs (same sort/normalize as the
oracle gate), and FAILS for any query whose hostile output is
value-identical to its clean output while reading at least one
hostile-mutated table — "the gate reached nothing". Queries reading
only unmutated tables are auto-exempt (attributed via
``DataFrame.inputFiles``); anything else identical must either get a
placement-engineered hostile row or a documented ``REACH_EXEMPT``
entry.

Usage: python tools/degenerate_sweep.py [empty|one|both|nulls|hostile|all]
       python tools/degenerate_sweep.py reach [round]
Exit 1 on any raising query (empty/one), any parity failure
(nulls/hostile), or any unreached query (reach).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
ROOT = "/tmp/iotstream-degenerate"


def _spec_digest(*objs) -> str:
    """Digest of a fixture's mutation spec. The ``.complete`` markers
    used to be empty files, so editing HOSTILE_MUTS/NULL_MUTS silently
    kept serving the STALE cached fixture until someone remembered to
    rm -rf it — since r13 the marker stores this digest and a mismatch
    rebuilds. repr() is deterministic here: the specs are literals
    (dicts/lists/floats incl. nan/inf, datetimes, strings)."""
    import hashlib

    return hashlib.sha256(repr(objs).encode()).hexdigest()


def _fresh_marker(out: str, digest: str) -> bool:
    marker = f"{out}/.complete"
    try:
        return open(marker).read() == digest
    except OSError:
        return False


def build(spark, n: int) -> str:
    """Schema-identical fixture dir with the first n rows per table."""
    from iotstream.schemas import FIXTURE_TABLES, table_path

    out = f"{ROOT}/n{n}"
    marker = f"{out}/.complete"
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t in FIXTURE_TABLES:
        df = spark.read.parquet(table_path(SRC, t)).limit(n)
        # single-file write keeps the FileStreamSource listing cheap
        df.coalesce(1).write.mode("overwrite").parquet(table_path(out, t))
    open(marker, "w").close()
    return out


#: Per-table NULL-bearing extra rows (col -> override; None = SQL NULL).
#: Every row is a copy of an existing head row with the listed overrides,
#: and — where ``pk`` is set — a fresh beyond-max primary key so the
#: appended rows never collide with real entities. The shapes mirror what
#: a 100 TB corpus guarantees: NULL event times (late/raw ingest), NULL
#: entity/join keys (orphaned references), NULL measures (failed
#:_enrichment), NULL group keys (uncategorized rows), NULL/malformed JSON
#: payloads (lenient-parse contract, SURVEY §1.4 / reference
#: StreamProcessor.java:66 NPE case), and NULL dimension attributes.
NULL_MUTS: dict[str, tuple[str | None, list[dict]]] = {
    "events": (
        "event_id",
        [
            {"ts": None},  # NULL event-time → every window/asof oracle
            {"user_id": None},  # NULL entity key → NULL sensor id
            {"value": None, "event_type": None},  # NULL measure + group key
            {"props": None},  # NULL JSON payload
            {"props": "{not json"},  # malformed JSON → lenient parse
            {  # fully degenerate row: only the pk survives
                "ts": None,
                "user_id": None,
                "event_type": None,
                "value": None,
                "props": None,
            },
        ],
    ),
    # composite pk: keep the copied row's l_orderkey (so the row still
    # joins to a real order and its NULL measures reach the aggregates)
    # and bump l_linenumber far beyond the 1..7 the generator emits.
    "lineitem": (
        None,
        [
            {"l_linenumber": 901, "l_shipdate": None},
            {"l_linenumber": 902, "l_partkey": None, "l_suppkey": None},
            {
                "l_linenumber": 903,
                "l_quantity": None,
                "l_extendedprice": None,
                "l_discount": None,
                "l_tax": None,
            },
            {"l_linenumber": 904, "l_returnflag": None, "l_linestatus": None},
        ],
    ),
    "orders": (
        "o_orderkey",
        [
            {"o_custkey": None},  # NULL FK → joins, NOT IN / anti-join
            {"o_orderdate": None},  # NULL date → range filters, date_trunc
            {"o_orderpriority": None, "o_totalprice": None,
             "o_orderstatus": None},
        ],
    ),
    "customer": (
        "c_custkey",
        [
            {"c_nationkey": None},
            {"c_acctbal": None, "c_mktsegment": None},
            {"c_name": None},
        ],
    ),
    "supplier": (
        "s_suppkey",
        [
            {"s_nationkey": None},
            {"s_acctbal": None, "s_name": None},
        ],
    ),
    "part": (
        "p_partkey",
        [
            {"p_type": None, "p_brand": None},
            {"p_size": None, "p_retailprice": None},
            {"p_name": None},
        ],
    ),
    "nation": (
        "n_nationkey",
        [
            {"n_regionkey": None},
            {"n_name": None},
        ],
    ),
    "region": (
        "r_regionkey",
        [
            {"r_name": None},
        ],
    ),
}


def _extend(src: str, out: str, table: str, pk: str | None, muts: list[dict]):
    """Append len(muts) copies of head rows with the given overrides,
    auto-bumping ``pk`` beyond the table max when provided."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fname = f"{table}.parquet"
    t = pq.read_table(os.path.join(src, fname))
    head = t.slice(0, len(muts)).to_pydict()
    rows = {c: list(head[c]) for c in t.column_names}
    if pk is not None:
        mx = pa.compute.max(t.column(pk)).as_py()
    for i, m in enumerate(muts):
        if pk is not None:
            rows[pk][i] = mx + 1 + i
        for c, v in m.items():
            rows[c][i] = v
    extra = pa.Table.from_pydict(rows, schema=t.schema)
    pq.write_table(pa.concat_tables([t, extra]), os.path.join(out, fname))


def build_nulls() -> str:
    """NULL-bearing fixture: sf0.001 plus consistent degenerate rows in
    EVERY table (r10 verdict item 1 — the r9 sweep covered only
    documents/embeddings and found 9 real defects on that one table).
    documents — NULL text ⇒ NULL n_chars (a failed fetch has no known
    length), empty text ⇒ n_chars 0.
    embeddings — NULL vectors (a failed embedding job) and one NULL
    label: content-less vectors must be EXCLUDED from every pair/top-k
    output (DuckDB's NULL list arithmetic drops them naturally; the
    engine must match), never reshape-corrupted or np.stack-crashed.
    All other tables — NULL_MUTS above."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"{ROOT}/nulls"
    digest = _spec_digest("nulls-v2", NULL_MUTS, SRC)
    if _fresh_marker(out, digest):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    special = {"documents.parquet", "embeddings.parquet"}
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in special:
            table = f[: -len(".parquet")]
            if table in NULL_MUTS:
                pk, muts = NULL_MUTS[table]
                _extend(SRC, out, table, pk, muts)
            else:
                shutil.copy(os.path.join(SRC, f), os.path.join(out, f))

    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    head = t.slice(0, 6).to_pydict()
    mx = pa.compute.max(t.column("doc_id")).as_py()
    rows = {c: list(head[c]) for c in t.column_names}
    for i in range(6):
        rows["doc_id"][i] = mx + 1 + i
        if i % 3 == 0:
            rows["text"][i] = None
            rows["n_chars"][i] = None
        if i % 3 == 1:
            rows["text"][i] = ""
            rows["n_chars"][i] = 0
        if i % 3 == 2:
            rows["text"][i] = None
            rows["lang"][i] = None
            rows["n_chars"][i] = None
    extra = pa.Table.from_pydict(rows, schema=t.schema)
    pq.write_table(
        pa.concat_tables([t, extra]), os.path.join(out, "documents.parquet")
    )

    e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ehead = e.slice(0, 3).to_pydict()
    emx = pa.compute.max(e.column("vec_id")).as_py()
    erows = {c: list(ehead[c]) for c in e.column_names}
    for i in range(3):
        erows["vec_id"][i] = emx + 1 + i
        if i < 2:
            erows["embedding"][i] = None  # failed embedding job
    # a REAL vector with a NULL label: exercises the NULL GROUP BY path
    # in label profiling without being excluded by drop_null_vectors
    erows["label"][2] = None
    eextra = pa.Table.from_pydict(erows, schema=e.schema)
    pq.write_table(
        pa.concat_tables([e, eextra]), os.path.join(out, "embeddings.parquet")
    )
    with open(f"{out}/.complete", "w") as f:
        f.write(digest)
    return out


#: Hostile-VALUES mutations (r11, the step after NULLs): rows whose
#: values are legal for the schema but adversarial for the semantics —
#: what a 100 TB corpus guarantees somewhere. IEEE specials (NaN/±Inf
#: from failed enrichments and overflow), boundary event times
#: (pre-epoch backfills, far-future clock bugs), empty-string group
#: keys (distinct from NULL), quote/newline/control characters through
#: the JSON serde paths, and extreme-but-valid JSON payloads. Same
#: copy-a-head-row-with-overrides mechanics as NULL_MUTS.
import datetime as _dt

_NAN, _INF = float("nan"), float("inf")
HOSTILE_MUTS: dict[str, tuple[str | None, list[dict]]] = {
    "events": (
        "event_id",
        [
            {"value": _NAN},  # NaN measure → aggs, percentiles, sorts
            {"value": _INF},
            {"value": -_INF},
            # pre-epoch event time (negative epoch micros): integer
            # div/floor semantics and window bucketing below zero
            {"ts": _dt.datetime(1969, 12, 31, 23, 59, 59)},
            # far-future event time: watermark/window arithmetic headroom
            {"ts": _dt.datetime(2199, 1, 1, 0, 0, 0)},
            {"event_type": ""},  # empty-string group key (NOT NULL)
            # quotes/newline/tab must survive the JSON serde round-trip
            {"event_type": 'he said "hi"\n\ttab'},
            # extreme-but-valid JSON: deep nesting, 1e308, escapes
            {"props": '{"deep":{"a":{"b":{"c":1e308}}},'
                      '"s":"back\\\\slash \\"quote\\""}'},
            # unicode group keys + unicode JSON values (r12: gated, not
            # probe-only — collation of ORDER BY, group-key hashing, and
            # JSON serde escaping must agree on multilingual input)
            {"event_type": "café_click"},
            {"event_type": "购买"},
            {"props": '{"k": 1, "s": "emoji \U0001f680 café"}'},
        ],
    ),
    "lineitem": (
        None,
        [
            {"l_linenumber": 911, "l_quantity": -5.0},  # returns
            {"l_linenumber": 912, "l_discount": 1.0, "l_tax": 0.0},
            {"l_linenumber": 913, "l_extendedprice": _NAN},
            {"l_linenumber": 914, "l_shipdate": _dt.datetime(1970, 1, 1)},
        ],
    ),
    "orders": (
        "o_orderkey",
        [
            {"o_totalprice": _NAN},
            {"o_orderdate": _dt.datetime(1970, 1, 1)},
        ],
    ),
    "customer": (
        "c_custkey",
        [
            {"c_acctbal": -_INF},
            # unicode dimension attribute (r12): flows through joins and
            # into projected output columns — value-level parity must
            # hold on multilingual names, not just ASCII
            {"c_name": "Müller 客户 \U0001f3ec"},
        ],
    ),
    "supplier": (
        "s_suppkey",
        [
            # unicode name reaches ORDER BY s_name tie-breaks
            # (waiting_supplier_blame) — Spark and DuckDB must agree on
            # the collation of non-ASCII keys (both binary UTF-8)
            {"s_name": "Lieferant 供应商 é"},
        ],
    ),
    "part": (
        "p_partkey",
        [
            {"p_size": -1, "p_retailprice": 0.0},
            # unicode name CONTAINING the 'widget' needle: LIKE
            # '%widget%' must match through surrounding multilingual
            # text identically on both engines, pulling the row into
            # product_profit / excess_supply_suppliers
            {"p_name": "naïve widget 小部件"},
        ],
    ),
}

#: r12 NaN-shape broadening (r11 verdict item 3): a single NaN row per
#: table cannot exercise NaN TIES, an ALL-NaN group, or NaN landing on
#: both sides of a group's real extremes — exactly the placements
#: percentile / min_by / max_by / rank-order paths are sensitive to.
#: Density is a parameter so future rounds can raise it without
#: re-deriving the shapes.
NAN_DENSITY = 4
HOSTILE_MUTS["events"][1].extend(
    # NaN ties inside a REAL group ('view'): several rows with the
    # identical non-value, spread across the head-copied users, so
    # ordering/percentile ties among NaNs and against real values both
    # occur within one group and one user's timeline
    [{"value": _NAN, "event_type": "view"} for _ in range(NAN_DENSITY)]
    # an ALL-NaN group: no finite value at all → finite-measures
    # contracts must yield an empty/NULL aggregate identically on both
    # engines, never a fabricated 0
    + [{"value": _NAN, "event_type": "all_nan"} for _ in range(3)]
    # NaN inside the empty-string group (composes two hostile shapes)
    + [{"value": _NAN, "event_type": ""}]
)
HOSTILE_MUTS["lineitem"][1].extend(
    # NaN price/quantity ties across several lines of real orders —
    # pricing_summary-style DECIMAL aggs and min_by/max_by paths see
    # NaN next to real extremes within the same returnflag groups
    {"l_linenumber": 915 + k, "l_quantity": _NAN, "l_extendedprice": _NAN}
    for k in range(3)
)
HOSTILE_MUTS["lineitem"][1].extend(
    [
        # PLACEMENT rows (r12): NaN engineered INTO the common query
        # filters (1996 shipdate windows, returnflag 'R', the Q6
        # discount/quantity band) so the uniform finite_lineitem
        # contract is exercised by the gate rather than dodged — the
        # r11 single NaN row survived three contract-less queries
        # purely because it fell outside their filters.
        {"l_linenumber": 918, "l_quantity": _NAN, "l_returnflag": "R",
         "l_shipdate": _dt.datetime(1996, 2, 15)},
        {"l_linenumber": 919, "l_extendedprice": _NAN, "l_discount": 0.04,
         "l_quantity": 5.0, "l_shipdate": _dt.datetime(1996, 6, 1)},
        # NaN in a measure the query never casts (l_tax) still drops
        # the row under the TABLE-LEVEL rule — both engines must agree
        {"l_linenumber": 920, "l_tax": _NAN,
         "l_shipdate": _dt.datetime(1996, 9, 15)},
    ]
)

#: Hostile documents. Since r12 this includes MULTILINGUAL text as a
#: gated shape: the fake-codec contract is byte-based (oracles
#: recompute from UTF-8 bytes via strlen/hex-nibble, engine from
#: len(payload)), so unicode text must hold full value-level parity —
#: regex word classes, length semantics, collation, JSON escaping and
#: the byte-histogram kernel all run on it. n_chars stays consistent
#: with the text (code points, as the generator writes it).
HOSTILE_DOCS: list[str] = [
    "   \n\t   ",          # whitespace-only
    "a" * 20000,            # one enormous token
    "!!! ??? ;;; ***",      # punctuation-only
    "x",                    # single character
    "ctrl\x01char one two three four five",  # C0 control byte
    "café résumé naïve déjà vu über straße",   # accented Latin (2-byte)
    "这是 一个 测试 文本 分析 的 例子 你好 世界",  # CJK (3-byte)
    "hello \U0001f44b world \U0001f30d emoji test",  # astral plane (4-byte)
    "مرحبا بالعالم",       # RTL Arabic
    "élégant combining marks café",  # NFD combining sequences
]


def build_hostile() -> str:
    """Hostile-VALUES fixture: sf0.001 plus HOSTILE_MUTS rows (IEEE
    specials with r12 NaN-density/all-NaN-group shapes, boundary times,
    empty and unicode group keys, hostile JSON) in the relational
    tables, HOSTILE_DOCS (degenerate ASCII + multilingual unicode) in
    documents, and three adversarial embeddings — a vector with a NaN
    component, one with +Inf, the all-zero vector (no direction: cosine
    divides by ‖v‖ = 0), plus an exact duplicate of a real vector
    (top-k tie-breaking must be deterministic). The full check_oracle
    parity gate runs on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"{ROOT}/hostile"
    digest = _spec_digest("hostile-v2", HOSTILE_MUTS, HOSTILE_DOCS, SRC)
    if _fresh_marker(out, digest):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # ALL-NaN USER group (r12): the `all_nan` event_type covers type-
    # grouped paths, but user-grouped decile/RFM/segment paths never
    # see a user whose EVERY measure is NaN unless one is built. Pick
    # the smallest REAL customer key with no events (so the group is
    # all-NaN by construction yet still joins the customer dim) and
    # give it three NaN-value events — deterministic per fixture.
    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    cust = pq.read_table(os.path.join(SRC, "customer.parquet"))
    ev_users = set(ev.column("user_id").to_pylist())
    eventless = sorted(
        k for k in cust.column("c_custkey").to_pylist() if k not in ev_users
    )
    events_extra = list(HOSTILE_MUTS["events"][1])
    if eventless:
        events_extra += [
            {"user_id": eventless[0], "value": _NAN, "event_type": "view"}
            for _ in range(3)
        ]
    hostile_muts = dict(HOSTILE_MUTS)
    hostile_muts["events"] = (HOSTILE_MUTS["events"][0], events_extra)

    special = {"documents.parquet", "embeddings.parquet"}
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in special:
            table = f[: -len(".parquet")]
            if table in hostile_muts:
                pk, muts = hostile_muts[table]
                _extend(SRC, out, table, pk, muts)
            else:
                shutil.copy(os.path.join(SRC, f), os.path.join(out, f))

    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    head = t.slice(0, len(HOSTILE_DOCS)).to_pydict()
    mx = pa.compute.max(t.column("doc_id")).as_py()
    rows = {c: list(head[c]) for c in t.column_names}
    for i, text in enumerate(HOSTILE_DOCS):
        rows["doc_id"][i] = mx + 1 + i
        rows["text"][i] = text
        rows["n_chars"][i] = len(text)
    pq.write_table(
        pa.concat_tables(
            [t, pa.Table.from_pydict(rows, schema=t.schema)]
        ),
        os.path.join(out, "documents.parquet"),
    )

    e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ehead = e.slice(0, 4).to_pydict()
    emx = pa.compute.max(e.column("vec_id")).as_py()
    erows = {c: list(ehead[c]) for c in e.column_names}
    dim = len(erows["embedding"][0])
    for i in range(4):
        erows["vec_id"][i] = emx + 1 + i
    erows["embedding"][0] = [_NAN] + [0.25] * (dim - 1)
    erows["embedding"][1] = [_INF] + [0.25] * (dim - 1)
    erows["embedding"][2] = [0.0] * dim
    # row 3 keeps its copied REAL embedding verbatim → exact duplicate
    pq.write_table(
        pa.concat_tables(
            [e, pa.Table.from_pydict(erows, schema=e.schema)]
        ),
        os.path.join(out, "embeddings.parquet"),
    )
    with open(f"{out}/.complete", "w") as f:
        f.write(digest)
    return out


#: Queries the reach audit accepts as identical-under-hostile, each
#: with the reason a hostile row cannot (or must not) move its output.
#: Keep this SHORT — every entry is a hole in the hostile gate and
#: needs the stated justification to survive judge review.
REACH_EXEMPT: dict[str, str] = {}


def _tables_read(df) -> set[str]:
    """Fixture tables a DataFrame's plan scans, via inputFiles().
    Handles both layouts in play: single ``table.parquet`` files (the
    testdata/hostile fixtures) and ``table.parquet/part-*.parquet``
    directories (the sweep's own derived fixtures). Empty set = not
    attributable (streaming-derived results, createDataFrame echoes) —
    callers treat that as "assume mutated", conservative."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — streaming plans raise here
        return set()
    out: set[str] = set()
    for f in files:
        base = os.path.basename(f.rstrip("/"))
        if base.endswith(".parquet") and not base.startswith("part-"):
            out.add(base[: -len(".parquet")])
        else:
            parent = os.path.basename(os.path.dirname(f))
            if parent.endswith(".parquet"):
                out.add(parent[: -len(".parquet")])
    return out


def run_reach(rnd: int | None) -> int:
    """Injection-reachability audit (VERDICT r12 item 1). For every
    declared query: run on clean sf0.001 and on the hostile fixture,
    canonicalize both result frames exactly like the oracle gate
    (sorted columns, sorted normalized rows), and compare. A query
    whose two outputs are value-identical while its plan scans at
    least one hostile-mutated table is UNREACHED — every injected
    shape died in its filter lineage, so the hostile parity gate was
    vacuous for it. Writes REACH_AUDIT_r{rnd}.json when a round is
    given; exits 1 on any unreached or raising query."""
    import hashlib
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    from check_oracle import frame_key

    hostile_dir = build_hostile()
    mutated = set(HOSTILE_MUTS) | {"documents", "embeddings"}

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("reach-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    def fingerprint(df) -> str:
        cols, rows = frame_key(df.columns, df.collect())
        return hashlib.sha256(repr((cols, rows)).encode()).hexdigest()

    report: dict[str, dict] = {}
    unreached: list[str] = []
    raising: list[str] = []
    for name, fn in entrymod.queries().items():
        try:
            df_clean = fn(spark, SRC)
            tables = sorted(_tables_read(df_clean))
            key_clean = fingerprint(df_clean)
            key_host = fingerprint(fn(spark, hostile_dir))
        except Exception as e:  # noqa: BLE001
            raising.append(name)
            report[name] = {"status": "RAISE",
                            "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"RAISE {name}: {type(e).__name__}: {e}"[:200])
            continue
        touched = key_clean != key_host
        reads_mutated = not tables or any(t in mutated for t in tables)
        if touched:
            status = "touched"
        elif not reads_mutated:
            status = "exempt-unmutated-tables"
        elif name in REACH_EXEMPT:
            status = f"exempt: {REACH_EXEMPT[name]}"
        else:
            status = "UNREACHED"
            unreached.append(name)
        report[name] = {"status": status, "tables": tables}
        print(f"{'ok   ' if status != 'UNREACHED' else 'FAIL '}{name}: "
              f"{status} (tables: {', '.join(tables) or '<unattributed>'})")

    summary = {
        "n_queries": len(report),
        "touched": sum(1 for r in report.values() if r["status"] == "touched"),
        "exempt": sum(
            1 for r in report.values() if r["status"].startswith("exempt")
        ),
        "unreached": unreached,
        "raising": raising,
        "mutated_tables": sorted(mutated),
    }
    if rnd is not None:
        path = os.path.join(
            os.path.dirname(here), f"REACH_AUDIT_r{rnd}.json"
        )
        with open(path, "w") as f:
            json.dump({"summary": summary, "queries": report}, f, indent=1)
            f.write("\n")
        print(f"wrote {path}")
    print(
        f"\nreach audit: {summary['touched']} touched, "
        f"{summary['exempt']} exempt, {len(unreached)} UNREACHED, "
        f"{len(raising)} raising"
        + (f"\nUNREACHED: {unreached}" if unreached else "")
    )
    return 1 if unreached or raising else 0


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "reach":
        rnd = (
            int(sys.argv[2])
            if len(sys.argv) > 2 and sys.argv[2].isdigit()
            else None
        )
        return run_reach(rnd)
    if mode in ("hostile", "all"):
        import subprocess

        hostile_dir = build_hostile()
        here = os.path.dirname(os.path.abspath(__file__))
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), hostile_dir]
        )
        if mode == "hostile" or rc != 0:
            return rc
    if mode in ("nulls", "all"):
        import subprocess

        nulls_dir = build_nulls()
        here = os.path.dirname(os.path.abspath(__file__))
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), nulls_dir]
        )
        if mode == "nulls" or rc != 0:
            return rc
        mode = "both"
    sizes = {"empty": [0], "one": [1], "both": [0, 1]}[mode]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    failures: list[str] = []
    for n in sizes:
        sf_dir = build(spark, n)
        print(f"--- n={n} rows/table ({sf_dir}) ---")
        for name, fn in entrymod.queries().items():
            try:
                rows = fn(spark, sf_dir).collect()
                print(f"ok    n={n} {name}: {len(rows)} rows")
            except Exception as e:  # noqa: BLE001
                failures.append(f"n={n} {name}")
                print(f"RAISE n={n} {name}: {type(e).__name__}: {e}"[:300])
    print(f"\n{len(failures)} raising queries: {failures}" if failures
          else "\nALL EXECUTE CLEAN")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
