"""BM25 retrieval: ranking semantics, determinism contract, plan shape."""

import pyspark.sql.functions as F

from itext2kg_spark.similarity.bm25 import bm25_topk

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog chased the cat around the yard"),
    (2, "quantum entanglement of photon pairs"),
    (3, "the mat was red and the cat was black"),
    (4, "a photon walks into a bar"),
    (5, "the the the the the the"),
]


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "photon entanglement"), (200, "cat mat")],
        "query_id long, text string",
    )
    return queries, docs


def test_bm25_ranks_relevant_docs_first(spark):
    queries, docs = _dfs(spark)
    out = bm25_topk(queries, docs, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # both query terms hit doc 2; only one hits doc 4
    assert [r["doc_id"] for r in by_q[100]] == [2, 4]
    # docs sharing no token with the query never appear
    assert all(r["doc_id"] in (2, 4) for r in by_q[100])
    # "cat mat": docs 0 and 3 have both terms, doc 1 only "cat"
    assert set(r["doc_id"] for r in by_q[200]) == {0, 3, 1}
    assert by_q[200][-1]["doc_id"] == 1
    # ranks are 1..n and scores non-increasing
    for rows in by_q.values():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_bm25_self_retrieval(spark):
    _, docs = _dfs(spark)
    queries = docs.select(
        F.col("doc_id").alias("query_id"), "text"
    ).where(F.col("doc_id").isin(0, 2, 3))
    out = bm25_topk(queries, docs, k=1).collect()
    # querying with a document's own text retrieves that document first
    assert {r["query_id"]: r["doc_id"] for r in out} == {0: 0, 2: 2, 3: 3}


def test_bm25_k_and_tie_break(spark):
    spark_docs = spark.createDataFrame(
        [(i, "same exact text here") for i in range(7)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "exact text")], "query_id long, text string"
    )
    out = bm25_topk(queries, spark_docs, k=4).collect()
    # identical docs -> identical scores -> deterministic id tie-break
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    assert len({r["score"] for r in out}) == 1


def test_bm25_max_token_df_drops_stopword_postings(spark):
    queries, docs = _dfs(spark)
    q_the = spark.createDataFrame(
        [(1, "the photon")], "query_id long, text string"
    )
    full = bm25_topk(q_the, docs, k=10).collect()
    cut = bm25_topk(q_the, docs, k=10, max_token_df=3).collect()
    # "the" appears in 4 docs; with the cutoff only "photon" postings score
    assert set(r["doc_id"] for r in full) >= {5, 2, 4}
    assert set(r["doc_id"] for r in cut) == {2, 4}


def test_bm25_plan_shape(spark):
    """No Python in the plan; query-side joins broadcast; the pruned
    postings aggregation is computed once and reused for the df table."""
    queries, docs = _dfs(spark)
    out = bm25_topk(queries, docs, k=3)
    out.collect()  # run it: exchange reuse is decided by AQE at execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "ReusedExchange" in plan
