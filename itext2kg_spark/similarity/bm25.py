"""BM25 full-text retrieval over a documents table — pure Catalyst, no UDFs.

The classic inverted-index ranking function (Robertson/Sparck Jones BM25,
Lucene's idf variant ln(1 + (N - df + 0.5)/(df + 0.5))) expressed as
DataFrame algebra. There is no materialized index structure: the posting
list IS a (doc_id, token, tf) DataFrame and every lookup is an equi-join,
which is the shape that distributes — at 10^12 documents the "index probe"
becomes a broadcast-semi-join of the (tiny) query vocabulary against the
exploded token table, so only postings for queried tokens are ever
aggregated or shuffled.

Plan, in scan order:
 1. query terms: explode + groupBy (query_id, token) -> qtf. Queries are
    assumed small (an analyst's query batch, a decontamination probe set);
    the distinct token set is broadcast.
 2. postings: explode docs -> inner join broadcast(query tokens) BEFORE the
    tf groupBy — the corpus-sized token stream is pruned to the query
    vocabulary pre-shuffle, so the aggregation state is proportional to
    matching postings, not the corpus.
 3. df per token: groupBy over the pruned postings (correct corpus df —
    the restriction is by token, never by document).
 4. doc lengths: token_count() per document (a scalar projection on the
    docs scan — no second explode), corpus stats (N, avgdl) as a one-row
    broadcast.
 5. score: sum over matched terms of qtf * idf * tf*(k1+1) /
    (tf + k1*(1-b + b*dl/avgdl)); top-k per query by row_number.

Ordering contract (cross-engine determinism): ranking sorts on
round(score, 9) DESC, doc_id ASC, and the emitted score is the same
rounded value — double arithmetic agrees between Spark and the SQL oracle
far beyond 9 decimals, and exact-tie groups (identical tf/dl profiles)
break deterministically by id.

`max_token_df` drops tokens whose document frequency exceeds the cutoff
(stopword-class tokens): at web scale these posting lists are the skew —
one token appearing in half the corpus turns the score aggregation into a
single hot reduce key — and their idf is ~0, so dropping them changes
scores negligibly while bounding every posting list. Applied AFTER df is
computed (df stays a true corpus statistic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itext2kg_spark.functions.text import token_count, tokens_col


def _terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows, lowercased whitespace tokens, empties dropped."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("token"),
        )
        .where(F.col("token") != "")
    )


def bm25_topk(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    max_token_df: int | None = None,
) -> DataFrame:
    """Top-k documents per query under BM25.

    Returns (query_id, doc_id, rank, score) with score = round(bm25, 9)
    and rank 1..k ordered by (score DESC, doc_id ASC). Documents sharing
    no token with the query never appear (score would be 0).
    """
    qterms = (
        _terms(queries, query_id_col, query_text_col)
        .groupBy(query_id_col, "token")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qvocab = qterms.select("token").distinct()

    # corpus-side stats on the docs scan: per-doc length + one-row corpus agg
    dl = docs.select(
        F.col(doc_id_col), token_count(F.col(doc_text_col)).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    postings = (
        _terms(docs, doc_id_col, doc_text_col)
        .join(F.broadcast(qvocab), "token")  # prune to query vocab pre-shuffle
        .groupBy(doc_id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # postings is already distinct on (doc, token), so df is a plain count;
    # the postings aggregation feeds both this and the score join through a
    # ReusedExchange (plan-shape-tested), not a recompute
    df_tab = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_token_df is not None:
        df_tab = df_tab.where(F.col("df") <= F.lit(max_token_df))

    scored = (
        postings.join(df_tab, "token")
        .join(F.broadcast(qterms), "token")
        .join(dl, doc_id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col,
            doc_id_col,
            (
                F.col("qtf")
                * F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
        .groupBy(query_id_col, doc_id_col)
        .agg(F.round(F.sum("term_score"), 9).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(doc_id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, doc_id_col, "rank", "score")
    )
