"""Name search: fuzzy entity lookup by character-n-gram Jaccard.

The KG-consumer query "find the entity I mean" — user strings are
misspelled/reordered/partial, so lookup is a similarity top-k over the
canonical entity names, not an equi-join. Same bucketed shape as the
document dedup family: names and queries explode to positional-free char
n-grams, candidates come from a gram equi-join (only names SHARING a gram
with some query are ever scored — never all-pairs), and Jaccard =
|shared| / (|A| + |B| - |shared|) over distinct grams. The query side is
broadcast (a lookup batch is dimension-sized); the name-side gram table is
linear in total name length and shuffles once on gram.

Cross-engine contract: grams are substrings of the lowercased,
whitespace-collapsed name (no padding), distinct per string; ranking
sorts on (round(jaccard, 9) DESC, name ASC) — all replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        # strings shorter than n yield NO grams; the filter is load-bearing
        # because F.sequence(1, 0) counts DOWN ([1, 0]) rather than being
        # empty, which would fabricate a gram for sub-n strings
        df.where(F.length(norm) >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length(norm) - (n - 1)),
                        lambda i: F.substring(norm, i, n),
                    )
                )
            ).alias("gram"),
        )
    )


def fuzzy_name_search(
    queries: DataFrame,
    names: DataFrame,
    k: int = 5,
    n: int = 3,
    min_jaccard: float = 0.0,
    query_id_col: str = "query_id",
    query_col: str = "query",
    name_col: str = "name",
) -> DataFrame:
    """Top-k names per query by char-n-gram Jaccard.

    Returns (query_id, name, rank, jaccard). Names shorter than n grams
    match nothing (no padding — callers wanting prefix matching should pad
    upstream). `min_jaccard` prunes the tail before ranking."""
    qg = _grams(queries, query_id_col, query_col, n)
    qsize = qg.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("qn"))
    ng = _grams(names.select(name_col).distinct(), name_col, name_col, n)
    nsize = ng.groupBy(name_col).agg(F.count(F.lit(1)).alias("nn"))

    shared = (
        ng.join(F.broadcast(qg), "gram")
        .groupBy(query_id_col, name_col)
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    scored = (
        shared.join(F.broadcast(qsize), query_id_col)
        .join(nsize, name_col)
        .select(
            query_id_col,
            name_col,
            F.round(
                F.col("shared")
                / (F.col("qn") + F.col("nn") - F.col("shared")),
                9,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("jaccard").desc(), F.col(name_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, name_col, "rank", "jaccard")
    )
