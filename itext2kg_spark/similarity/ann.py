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


def ann_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 7,
    kmeans_iters: int = 5,
    sample_size: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer -> cell-bucketed
    equi-join -> exact re-rank within probed cells.

    Training is a driver-side mini k-means over a bounded sample (spherical:
    centroids re-normalized each iteration, assignment by max dot product —
    correct for cosine on unit vectors). Assignment of the full corpus and of
    queries is one BLAS matmul per Arrow batch; queries probe their `n_probe`
    nearest cells, so the scored candidate set is ~n_probe/n_cells of the
    corpus. Deterministic: fixed seed, sample = first `sample_size` rows by
    id order.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    c = _prep(corpus, id_col, emb_col, "neighbor")
    q = _prep(queries, id_col, emb_col, "query")

    sample = (
        c.orderBy("neighbor_id").limit(sample_size).select("neighbor_emb").collect()
    )
    mat = np.asarray([np.asarray(r["neighbor_emb"]) for r in sample])
    if len(mat) == 0:
        return ann_topk_bruteforce(queries, corpus, k, id_col, emb_col)
    rng = np.random.Generator(np.random.PCG64(seed))
    n_cells_eff = min(n_cells, len(mat))
    cent = mat[rng.choice(len(mat), n_cells_eff, replace=False)]
    for _ in range(kmeans_iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for j in range(n_cells_eff):
            members = mat[assign == j]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[j] = v / n
    bc = c.sparkSession.sparkContext.broadcast(cent)

    def assign_cells(col_emb: str, col_id: str, probes: int):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ct = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.asarray([np.asarray(e) for e in pdf[col_emb]])
                sims = m @ ct.T
                top = np.argsort(-sims, axis=1)[:, :probes]
                rows = {
                    col_id: np.repeat(pdf[col_id].to_numpy(), probes),
                    "cell": top.reshape(-1).astype(np.int64),
                    col_emb: [e for e in pdf[col_emb] for _ in range(probes)],
                }
                yield pd.DataFrame(rows)

        return run

    c_cells = c.mapInPandas(
        assign_cells("neighbor_emb", "neighbor_id", 1),
        schema="neighbor_id long, cell long, neighbor_emb array<double>",
    )
    q_cells = q.mapInPandas(
        assign_cells("query_emb", "query_id", n_probe),
        schema="query_id long, cell long, query_emb array<double>",
    )
    cand = (
        q_cells.join(c_cells, "cell")
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
