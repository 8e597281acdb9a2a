"""Fused training-corpus preparation — the end-to-end pass a web-text
pipeline runs before KG extraction or LLM training:

    language filter -> quality/length filter -> exact dedup (normalized
    fingerprint, keep min id) -> near-dup keep-one (LSH clusters) ->
    enriched survivor corpus.

Composition shape at 100 TB:
- Enrichment (lang_pred, n_tokens, quality_10k, fp) is ONE whole-stage-
  codegen'd projection over the scan — all four are pure Catalyst
  expressions (functions/text.py), no UDFs, no extra pass; the language/
  quality filters sit directly above the same scan so Parquet reads only
  the text column and drops rows before anything shuffles.
- Exact dedup is a groupBy on the md5 fingerprint (map-side partial agg —
  combiner shrinks each partition to its distinct fingerprints) followed by
  a left_semi join on (fp, id); skew-safe because md5 keys are uniform.
- Near-dup keep-one runs ONLY on the exact-dedup survivors (every stage
  shrinks the set the next stage pays for) via dedup/clusters.py: banded
  MinHash-LSH candidates, exact-Jaccard verification on candidates only,
  connected components, min-id representative.

Every stage is 1:1 expressible in ANSI SQL, so the whole fused pass is
hash-oracle-checkable (driver query `corpus_prepare`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.dedup.clusters import near_dup_clusters
from itext2kg_spark.functions.text import (
    fingerprint_col,
    lang_pred_col,
    quality_10k_col,
    token_count,
)


def prepare_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 1,
    min_quality_10k: int = 0,
    near_dup_threshold: float | None = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """The surviving corpus after lang/quality filtering + exact + near-dup
    dedup, enriched with (lang_pred, n_tokens, quality_10k, fp, rep_id).

    `near_dup_threshold=None` skips the near-dup stage (exact-only mode).
    Extra kwargs (k, bands, n, ...) feed `near_dup_clusters`'s LSH. Column
    `rep_id` equals `id_col` for every surviving row by construction (the
    representative IS the survivor); it is kept so downstream audits can
    join survivors back to the full cluster map if they re-derive it.
    """
    t = F.col(text_col)
    enriched = docs.select(
        F.col(id_col),
        t,
        lang_pred_col(t).alias("lang_pred"),
        token_count(t).cast("long").alias("n_tokens"),
        quality_10k_col(t).alias("quality_10k"),
        fingerprint_col(t).alias("fp"),
    )
    kept = enriched.where(
        F.col("lang_pred").isin(*langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_10k") >= min_quality_10k)
    )

    # exact dedup: keep the min id per normalized fingerprint
    keeper = kept.groupBy("fp").agg(F.min(id_col).alias(id_col))
    kept = kept.join(keeper, ["fp", id_col], "left_semi")

    if near_dup_threshold is None:
        return kept.withColumn("rep_id", F.col(id_col))

    clusters = near_dup_clusters(
        kept, threshold=near_dup_threshold,
        id_col=id_col, text_col=text_col, **lsh_kwargs,
    )
    reps = clusters.where(F.col(id_col) == F.col("rep_id"))
    return kept.join(reps, id_col, "left_semi").withColumn(
        "rep_id", F.col(id_col)
    )
