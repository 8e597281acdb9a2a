"""Exact deduplication: hash-groupBy on content fingerprint.

Scale shape: one shuffle on md5(text) — the canonical first pass of any
training-data pipeline. Map-side partial aggregation applies; no skew issue
unless the corpus contains one megadup, which AQE splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """fingerprint groups: (fp, n_dups, keeper_id = min id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def dedup_keep_first(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row per exact-content group (all original columns)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
