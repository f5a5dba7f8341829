"""TF-IDF top-terms on a corpus with hand-computable scores."""

import math

from tikv_data_compare_spark.operators.text import tfidf_top_terms


def _docs(spark):
    return spark.createDataFrame(
        [(1, "apple banana banana"), (2, "apple cherry"), (3, "apple")],
        "doc_id long, text string",
    )


def test_tfidf_scores_and_ranks(spark):
    out = {(r["doc_id"], r["rnk"]): r for r in tfidf_top_terms(_docs(spark)).collect()}
    idf_rare = round(math.log(3.0 / 1.0) * 1_000_000)  # df=1, N=3
    # doc 1: banana tf=2 rare beats apple (idf 0)
    assert out[(1, 1)]["term"] == "banana" and out[(1, 1)]["score_c"] == 2 * idf_rare
    assert out[(1, 2)]["term"] == "apple" and out[(1, 2)]["score_c"] == 0
    # doc 2: cherry first, apple second
    assert out[(2, 1)]["term"] == "cherry" and out[(2, 1)]["score_c"] == idf_rare
    # doc 3: only apple
    assert out[(3, 1)]["term"] == "apple"
    assert (3, 2) not in out


def test_tfidf_tie_breaks_on_term(spark):
    docs = spark.createDataFrame([(1, "zebra alpha"), (2, "other words")], "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=2).filter("doc_id = 1").orderBy("rnk").collect()
    # equal tf and df -> equal score; alpha wins rank 1 alphabetically
    assert [r["term"] for r in rows] == ["alpha", "zebra"]


def test_tfidf_respects_k(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    assert tfidf_top_terms(docs, k=3).count() == 3


# ---------------------------------------------------------------- bm25


def _bm25(spark, docs, queries, **kw):
    from tikv_data_compare_spark.operators.text import bm25_topk

    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query_id long, qtext string")
    return bm25_topk(d, q, **kw).collect()


def test_bm25_ranks_matching_docs_first(spark):
    rows = _bm25(
        spark,
        [(1, "spark spark spark filler"), (2, "spark filler other words"), (3, "no match here at all")],
        [(0, "spark")],
    )
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    # doc 3 has no query term: absent entirely; doc 1 (higher tf) outranks doc 2
    assert [r["doc_id"] for r in by_rank] == [1, 2]
    assert by_rank[0]["bm25_c"] > by_rank[1]["bm25_c"] > 0


def test_bm25_length_normalization(spark):
    """Same tf, longer doc -> lower score (the b·dl/avgdl penalty)."""
    rows = _bm25(
        spark,
        [(1, "term pad"), (2, "term pad pad pad pad pad pad pad")],
        [(0, "term")],
    )
    s = {r["doc_id"]: r["bm25_c"] for r in rows}
    assert s[1] > s[2]


def test_bm25_query_terms_count_once(spark):
    """Repeated query terms collapse: 'x x' scores identically to 'x'."""
    rows = _bm25(
        spark,
        [(1, "x y z"), (2, "y z w")],
        [(0, "x x"), (1, "x")],
    )
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = (r["bm25_c"], r["n_terms"])
    assert by_q[0] == by_q[1]


def test_bm25_oov_terms_contribute_nothing(spark):
    """A query mixing real + out-of-vocabulary terms scores exactly like the
    real terms alone (unmatched terms never reach the scorer)."""
    rows = _bm25(
        spark,
        [(1, "alpha beta"), (2, "beta gamma")],
        [(0, "alpha zzz_not_in_corpus"), (1, "alpha")],
    )
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["bm25_c"]
    assert by_q[0] == by_q[1]


def test_bm25_topk_and_tiebreak(spark):
    """k truncates per query; equal scores break ties by doc_id ascending."""
    docs = [(i, "term filler") for i in range(1, 7)]
    rows = _bm25(spark, docs, [(0, "term")], k=3)
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rnk"])] == [1, 2, 3]
