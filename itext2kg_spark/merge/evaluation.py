"""Merge-quality evaluation (J8/A9): the reference's residual-duplicate
metric re-expressed set-based.

`evaluate_itext2kg_merge.py:122-183` computes the all-pairs cosine matrix
over merged entity/relation embeddings and counts upper-triangle pairs above
θ — surviving near-duplicates after canonicalization (lower is better); plus
the count aggregates at :185-210 (entity/relation totals, case-insensitive
uniques). Here the pair count reuses the engine's candidate operator (exact
BLAS under the broadcast limit, LSH above), so the metric itself scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.config import MatchConfig
from itext2kg_spark.functions.vectors import unit
from itext2kg_spark.merge.candidates import candidate_pairs


def residual_duplicate_pairs(
    entities: DataFrame,
    threshold: float = 0.8,
    emb_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id_a, id_b, sim) for canonical-entity pairs still >= θ after merge."""
    cfg = MatchConfig(candidate_method=method)
    items = entities.select(
        F.xxhash64("name", "label").alias("id"),
        unit(F.col(emb_col).cast("array<double>")).alias("emb"),
    )
    return candidate_pairs(items, cfg, threshold, emb_col="emb", id_col="id")


def kg_count_metrics(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """One-row eval counts (A9): totals + case-insensitive uniques."""
    n_ent = entities.count()
    n_uniq = entities.select(F.lower("name")).distinct().count()
    n_edges = edges.count()
    n_preds = edges.select("pred").distinct().count()
    spark = entities.sparkSession
    return spark.createDataFrame(
        [(n_ent, n_uniq, n_edges, n_preds)],
        "n_entities long, n_unique_names long, n_edges long, n_preds long",
    )


def distill_field_merge(
    df: DataFrame,
    group_col: str,
    list_cols: list[str] = (),
    str_cols: list[str] = (),
    scalar_cols: list[str] = (),
) -> DataFrame:
    """A8: the DocumentsDistiller cross-document combine
    (documents_distiller.py:96-139) — lists extend, strings space-concat,
    scalars last-non-null — as one aggregation."""
    aggs = (
        [F.flatten(F.collect_list(c)).alias(c) for c in list_cols]
        + [F.concat_ws(" ", F.collect_list(c)).alias(c) for c in str_cols]
        + [F.last(c, ignorenulls=True).alias(c) for c in scalar_cols]
    )
    return df.groupBy(group_col).agg(*aggs)
