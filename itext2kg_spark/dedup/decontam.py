"""Benchmark decontamination: flag corpus documents sharing token n-grams
with an evaluation set.

The standard pretraining-hygiene pass (GPT-3 appendix C; The Pile; most
open corpus pipelines): any training document that shares a long token
n-gram (13 by convention) with a benchmark document is dropped or flagged
before training, so downstream eval numbers aren't contaminated by
memorization.

Spark-first shape: the eval side collapses to its DISTINCT gram set —
benchmarks are tiny relative to a crawl, so that set broadcasts and the
whole pass is one broadcast hash semi-join over the corpus gram stream
plus a per-document count aggregation. Nothing is corpus-global: no
shuffle of the corpus side ever carries more than (doc_id, gram) pairs,
and the gram stream itself is the same codegen construction as the
repetition stats (functions/repetition.py ngram_rows). For an eval set
too large to broadcast, pass broadcast_eval=False and the join degrades
gracefully to a shuffled semi-join on gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.functions.repetition import ngram_rows


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """doc_id, n_hit_grams, contaminated.

    n_hit_grams counts the DISTINCT n-grams of the document that appear
    anywhere in the eval set (distinct-per-doc, so a gram repeated inside
    one document counts once — the decision signal is overlap breadth,
    not within-doc frequency). contaminated = n_hit_grams > 0. Every
    input document gets a row (zeros when clean).
    """
    doc_grams = ngram_rows(docs, n, text_col=text_col, id_col=id_col).distinct()
    eval_grams = (
        ngram_rows(eval_docs, n, text_col=text_col, id_col=id_col)
        .select("gram")
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)

    hits = (
        doc_grams.join(eval_grams, on="gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hit_grams"), F.lit(0))
            .cast("long")
            .alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
