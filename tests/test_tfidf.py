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
