"""Cleaning operators: DF-filter edge cases and decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.ext.text import decontaminate, doc_fingerprint, remove_high_df_tokens

DOCS = [
    (1, "alpha beta unique1"),
    (2, "alpha beta unique2"),
    (3, "alpha beta"),        # fully boilerplate → must survive as ''
    (4, "alpha beta unique3"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_df_filter_preserves_order_and_empty_docs(spark):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_high_df_tokens(_df(spark), min_doc_frac=0.5).collect()
    }
    # alpha/beta appear in 4/4 docs → removed everywhere
    assert out == {1: "unique1", 2: "unique2", 3: "", 4: "unique3"}


def test_df_filter_keeps_below_threshold_tokens_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "c b a c"), (2, "z y x")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_high_df_tokens(docs, min_doc_frac=0.9).collect()
    }
    # nothing reaches 90% DF (each token is in exactly one of two docs)
    assert out == {1: "c b a c", 2: "z y x"}  # original order, duplicates kept


def test_decontaminate_drops_exact_content_matches_only(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS] + [(5, "alpha beta")],  # dup of doc 3
        "doc_id bigint, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text").cast("long"))
    block = doc_fingerprint(docs.filter(F.col("doc_id") == 3))
    kept = decontaminate(docs, block)
    ids = {r["doc_id"] for r in kept.collect()}
    # doc 3 AND its content-identical twin doc 5 are both removed
    assert ids == {1, 2, 4}


def test_scrub_repetition_collapses_runs_only(spark):
    from iotstream.ext.text import scrub_repetition

    docs = spark.createDataFrame(
        [
            (1, "the the the cat sat sat here"),
            (2, "a b a b"),          # alternation is NOT a run → untouched
            (3, "solo"),
            (4, "x x"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in scrub_repetition(docs).collect()}
    assert (out[1].text, out[1].n_removed) == ("the cat sat here", 3)
    assert (out[2].text, out[2].n_removed) == ("a b a b", 0)
    assert (out[3].text, out[3].n_removed) == ("solo", 0)
    assert (out[4].text, out[4].n_removed) == ("x", 1)


def test_tokenize_encode_order_and_oov(spark):
    from iotstream.ext.text import tokenize_encode

    # "w" appears 6x (vocab), "rare" once (OOV with min_count=5)
    docs = spark.createDataFrame(
        [(1, "w w w rare w"), (2, "w w rare")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in tokenize_encode(docs, min_count=5).collect()}
    assert out[1].token_ids == [1, 1, 1, 0, 1]  # order preserved, OOV→0
    assert (out[1].n_tokens, out[1].n_oov) == (5, 1)
    assert out[2].token_ids == [1, 1, 0]
    assert (out[2].n_tokens, out[2].n_oov) == (3, 1)


def test_decontaminate_ngram_drops_partial_overlap(spark):
    from iotstream.ext.text import decontaminate_ngram

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),      # eval doc
            (2, "a quick brown fox appears here"), # shares 3-gram → dropped
            (3, "quick brown wolf runs away"),     # no shared 3-gram → kept
            (4, "totally unrelated text body"),    # kept
            (5, "xy"),                             # < 3 tokens → kept
        ],
        "doc_id bigint, text string",
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS bigint) AS n_chars",
    )
    kept = decontaminate_ngram(docs, docs.filter(F.col("doc_id") == 1), n=3)
    assert {r["doc_id"] for r in kept.collect()} == {3, 4, 5}


def test_decontaminate_ngram_short_eval_docs_block_nothing(spark):
    from iotstream.ext.text import decontaminate_ngram

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")],
        "doc_id bigint, text string",
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS bigint) AS n_chars",
    )
    # eval doc has only 2 tokens → produces no 3-grams → nothing dropped
    kept = decontaminate_ngram(docs, docs.filter(F.col("doc_id") == 1), n=3)
    assert kept.count() == 2


def test_gopher_quality_rules_fire_individually(spark):
    from iotstream.ext.text import gopher_quality

    mk = lambda words: " ".join(words)  # noqa: E731
    docs = [
        (1, mk(["word"] * 60)),                         # dup_frac ~0.983 → drop
        (2, mk([f"w{i:03d}" for i in range(60)])),      # healthy → keep
        (3, mk(["ok"] * 10)),                           # too few words → drop
        (4, mk([f"w{i}!!!" for i in range(60)])),       # symbols → drop
        (5, mk(["extraordinarily" + str(i) for i in range(60)])),  # long words → drop
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string").selectExpr(
        "doc_id", "text", "CAST(length(text) AS bigint) AS n_chars"
    )
    out = {r["doc_id"]: r["keep"] for r in gopher_quality(df).collect()}
    assert out == {1: False, 2: True, 3: False, 4: False, 5: False}


def test_tfidf_rare_terms_outrank_ubiquitous_ones(spark):
    from iotstream.ext.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare common"),
            (2, "common other"),
            (3, "common zebra"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in tfidf_top_terms(docs, k=1).collect()}
    # 'common' is in every doc (idf=1); each doc's unique word wins.
    assert out[1].word == "rare" and out[2].word == "other"
    assert out[3].word == "zebra"
    # Exact-rational score: tf * N / df = 1 * 3 / 1.
    assert out[1].tfidf == 3.0 and out[1].df == 1


def test_tfidf_ties_break_lexicographically_and_k_caps(spark):
    from iotstream.ext.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "bb aa cc dd"), (2, "x")], "doc_id bigint, text string"
    )
    words = [r.word for r in tfidf_top_terms(docs, k=3).collect()
             if r.doc_id == 1]
    assert words == ["aa", "bb", "cc"]  # all score 2.0; lexicographic


def test_lm_bigram_xent_hand_computed(spark):
    """Add-one bigram model on a 3-doc corpus, hand-verified:
    V=5 (a,b,x,y,solo — the <2-token doc still contributes vocabulary);
    doc 1 bigrams {a b ×3, b a ×2}, doc 2 {x y ×1};
    p(a b)=4/8, p(b a)=3/7, p(x y)=2/6."""
    import math

    from iotstream.ext.text import lm_bigram_xent

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y"), (3, "solo")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in lm_bigram_xent(docs).collect()}
    assert set(out) == {1, 2}  # <2-token doc excluded
    assert out[1].n_bigrams == 5 and out[2].n_bigrams == 1
    want1 = round(-(3 * math.log(4 / 8) + 2 * math.log(3 / 7)) / 5, 6)
    want2 = round(-math.log(2 / 6), 6)
    assert out[1].xent == want1
    assert out[2].xent == want2
    # the repetitive doc is more predictable → lower cross-entropy
    assert out[1].xent < out[2].xent
