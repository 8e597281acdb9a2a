"""Approximate-nearest-neighbor search over an embedding column.

* `ann_topk_bruteforce` — exact top-k by cosine: broadcast the (small) query
  set against the corpus, score with a codegen'd zip_with dot product, rank
  with a per-query window. The correctness baseline; linear scan of the
  corpus, embarrassingly parallel, no shuffle except the final top-k.
* `ann_topk_lsh` — the scale path: both sides get random-hyperplane band
  signatures (shared operator with entity resolution), candidates come from
  bucket equi-joins, exact cosine re-ranks within candidates. Sub-linear
  candidate volume; recall is tunable via (rows, bands).

All cosine math is done in float64 after an explicit cast so results are
bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itext2kg_spark.functions.vectors import dot, unit
from itext2kg_spark.merge.candidates import lsh_signatures_udf


def _prep(df: DataFrame, id_col: str, emb_col: str, alias: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{alias}_id"),
        unit(F.col(emb_col).cast("array<double>")).alias(f"{alias}_emb"),
    )


def ann_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim_10k); self-matches excluded,
    deterministic tie-break on neighbor id."""
    q = _prep(queries, id_col, emb_col, "query")
    c = _prep(corpus, id_col, emb_col, "neighbor")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", dot(F.col("query_emb"), F.col("neighbor_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("sim") * 10000).cast("long").alias("sim_10k"),
        )
    )


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rows: int = 4,
    bands: int = 16,
    seed: int = 1729,
) -> DataFrame:
    """Approximate top-k: LSH-bucketed candidates, exact re-rank."""
    q = _prep(queries, id_col, emb_col, "query")
    c = _prep(corpus, id_col, emb_col, "neighbor")
    dim_row = c.select(F.size("neighbor_emb").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 2
    sig = lsh_signatures_udf(dim, rows, bands, seed)

    qs = q.select("query_id", "query_emb", F.explode(sig("query_emb")).alias("sig"))
    cs = c.select(
        "neighbor_id", "neighbor_emb", F.explode(sig("neighbor_emb")).alias("sig")
    )
    cand = (
        qs.join(cs, "sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", dot(F.col("query_emb"), F.col("neighbor_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("sim") * 10000).cast("long").alias("sim_10k"),
        )
    )
