"""N-gram Jaccard near-dup detection — exact, set-based, no UDFs.

Formulation that scales: explode each document into its distinct word
n-grams, self-join on the gram (an equi-join, not a cross join), count shared
grams per pair, and compute |A∩B| / (|A|+|B|-|A∩B|). Pair candidates only
materialize for documents that actually share a gram, so the cost tracks true
near-duplicate density, not n^2. Hot grams (boilerplate) can explode pair
counts at web scale — callers should drop grams with document frequency above
a cutoff (`max_gram_df`) exactly like stopword removal in MinHash pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) — distinct word n-grams per document."""
    d = docs.withColumn("__toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    grams = F.expr(
        f"CASE WHEN size(__toks) >= {n} THEN"
        f" transform(sequence(0, size(__toks) - {n}),"
        f"  i -> concat_ws(' ', slice(__toks, i + 1, {n})))"
        f" ELSE array() END"
    )
    return (
        d.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = 1000,
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard_10k) for pairs with n-gram Jaccard >= threshold.

    `max_gram_df` is ON by default: a gram shared by d documents expands to
    d*(d-1)/2 candidate pairs, so one boilerplate gram across 1M pages is
    ~5e11 rows — the one way this equi-join formulation goes quadratic at web
    scale. Grams above the document-frequency cutoff are dropped BEFORE the
    self-join (and excluded from |A|/|B| so Jaccard stays consistent); pass
    None to disable for exact-parity runs."""
    g = grams if grams is not None else word_ngrams(docs, n, text_col, id_col)
    if max_gram_df is not None:
        df_counts = g.groupBy("gram").agg(F.count("*").alias("__df"))
        g = g.join(df_counts.where(F.col("__df") <= max_gram_df), "gram").drop("__df")
    # the gram table feeds THREE plan branches (per-doc sizes + both sides of
    # the self-join); without a checkpoint the split+explode+distinct (+ df
    # cutoff) lineage re-executes per branch — measured 2.8s -> 1.9s at sf0.1
    g = g.localCheckpoint()
    sizes = g.groupBy("id").agg(F.count("*").alias("n_grams"))

    a = g.select(F.col("id").alias("id_a"), "gram")
    b = g.select(F.col("id").alias("id_b"), "gram")
    shared = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    j = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard") * 10000).cast("long").alias("jaccard_10k"),
    )
