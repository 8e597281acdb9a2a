"""Fuzzy name search + tf-idf keywords."""

import pyspark.sql.functions as F

from itext2kg_spark.functions.text import tfidf_keywords
from itext2kg_spark.similarity.search import fuzzy_name_search

NAMES = ["barack obama", "michelle obama", "angela merkel",
         "emmanuel macron", "boris johnson"]


def test_fuzzy_search_finds_misspellings(spark):
    names = spark.createDataFrame([(x,) for x in NAMES], "name string")
    queries = spark.createDataFrame(
        [(1, "barak obama"), (2, "merkel angela"), (3, "zzzzqqq")],
        "query_id long, query string",
    )
    out = {}
    for r in fuzzy_name_search(queries, names, k=2).collect():
        out.setdefault(r["query_id"], []).append(r)
    assert out[1][0]["name"] == "barack obama"
    assert out[1][0]["jaccard"] > out[1][1]["jaccard"]
    # token reordering still shares most grams
    assert out[2][0]["name"] == "angela merkel"
    # nothing shares a gram: query absent from output
    assert 3 not in out
    for rows in out.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_fuzzy_search_exact_match_is_rank_one_with_jaccard_one(spark):
    names = spark.createDataFrame([(x,) for x in NAMES], "name string")
    queries = spark.createDataFrame(
        [(7, "angela merkel")], "query_id long, query string"
    )
    top = fuzzy_name_search(queries, names, k=1).collect()[0]
    assert top["name"] == "angela merkel" and top["jaccard"] == 1.0


def test_fuzzy_search_min_jaccard_prunes(spark):
    names = spark.createDataFrame([(x,) for x in NAMES], "name string")
    queries = spark.createDataFrame(
        [(1, "obama")], "query_id long, query string"
    )
    all_hits = fuzzy_name_search(queries, names, k=10).collect()
    assert len(all_hits) == 2  # both obamas share grams
    pruned = fuzzy_name_search(queries, names, k=10, min_jaccard=0.27).collect()
    assert len(pruned) == 1


def test_fuzzy_search_sub_n_strings_yield_nothing(spark):
    """Regression: F.sequence(1, 0) counts DOWN, which without the length
    guard fabricates one gram for strings shorter than n."""
    names = spark.createDataFrame([("ab",), ("abcd",)], "name string")
    queries = spark.createDataFrame(
        [(1, "ab"), (2, "abcd")], "query_id long, query string"
    )
    out = fuzzy_name_search(queries, names, k=5).collect()
    assert all(r["query_id"] == 2 for r in out)  # 'ab' matches nothing
    assert {r["name"] for r in out} == {"abcd"}


def test_tfidf_keywords(spark):
    docs = spark.createDataFrame(
        [
            (0, "the spark engine shuffles data and the engine scales"),
            (1, "the cat chased the dog and the dog barked"),
            (2, "spark streaming handles late data with watermarks"),
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in tfidf_keywords(docs, k=3, min_token_len=4).collect():
        out.setdefault(r["doc_id"], []).append(r)
    # 'engine' (tf=2, df=1) is doc 0's top term; 'the' filtered at len 4
    assert out[0][0]["term"] == "engine"
    assert all(r["term"] != "the" for rows in out.values() for r in rows)
    # 'spark' appears in 2 of 3 docs: positive but below a df=1 term at same tf
    d2 = {r["term"]: r["score"] for r in out[2]}
    assert all(s > 0 for s in d2.values())
    # ranks dense, scores non-increasing
    for rows in out.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_everywhere_term_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "alpha common"), (1, "beta common"), (2, "gamma common")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=5).collect()
    scores = {(r["doc_id"], r["term"]): r["score"] for r in out}
    assert all(scores[(i, "common")] == 0.0 for i in range(3))
    assert scores[(0, "alpha")] > 0
