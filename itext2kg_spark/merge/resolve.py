"""Threshold-based resolution of items (entities or predicate names) into
canonical representatives: candidates -> connected components -> deterministic
representative per cluster.

Semantic core reproduced (SURVEY.md §2.7; matcher.py:176-232):
  (i)  exact key equality unifies items — free here, items are already
       distinct on their key so equal items share one row;
  (ii) cosine >= θ unifies an item with its match (the reference takes
       argmax-per-left-row; CC takes the transitive closure — equivalent
       within the P/R budget at the default thresholds, and order-free);
  (iii) on a match the *existing/global* object wins (matcher.py:81-87 keeps
       the entities2 object; matcher.py:152 renames rels1 to rels2's name) —
       so representatives prefer `is_existing`, then lexicographic min for
       determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itext2kg_spark.config import MatchConfig
from itext2kg_spark.merge.candidates import candidate_pairs
from itext2kg_spark.merge.components import connected_components


def resolve_items(
    items: DataFrame,
    cfg: MatchConfig,
    threshold: float,
    key_cols: list[str],
    emb_col: str = "emb",
    n_items: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """items(key_cols..., emb [, is_existing]) -> items + (comp, is_rep) +
    canonical key columns `canon_<key>` for every key col.

    `emb` must be unit-normalized. Rows form one cluster iff connected by
    cosine >= threshold (ATOM) / > threshold (star).
    """
    has_existing = "is_existing" in items.columns
    # Materialize the (small) distinct-item table once: it feeds the candidate
    # join twice, the CC vertex set, and the final representative pass —
    # without this every action re-runs the upstream embed UDF lineage.
    with_id = items.withColumn("id", F.xxhash64(*key_cols)).localCheckpoint()
    if n_items is None and cfg.candidate_method == "auto":
        n_items = with_id.count()

    pairs = candidate_pairs(
        with_id, cfg, threshold, emb_col=emb_col, id_col="id", n_items=n_items
    )
    if cfg.link_mode == "best":
        # Keep only each node's single best-scoring link (the reference
        # matches every item to its argmax counterpart, matcher.py:73-94;
        # weak non-best pairs above θ never form links there, so including
        # them would transitively over-merge distinct clusters that share a
        # borderline bridge pair).
        directed = pairs.select(
            F.col("id_a").alias("v"), F.col("id_b").alias("w"), "sim"
        ).union(
            pairs.select(
                F.col("id_b").alias("v"), F.col("id_a").alias("w"), "sim"
            )
        )
        wbest = Window.partitionBy("v").orderBy(
            F.col("sim").desc(), F.col("w").asc()
        )
        pairs = (
            directed.withColumn("__rn", F.row_number().over(wbest))
            .where(F.col("__rn") == 1)
            .select(F.col("v").alias("id_a"), F.col("w").alias("id_b"), "sim")
        )
    comp = connected_components(
        with_id.select("id"), pairs, max_iter=cfg.cc_max_iter
    )
    labeled = with_id.join(comp, "id", "left").withColumn(
        "comp", F.coalesce(F.col("comp"), F.col("id"))
    )

    # Representative priority mirrors the reference's "global side wins":
    # store rows first (matcher.py:81-87), then earliest-seen surface form —
    # in the reference's binary merge tree the accumulated LEFT kg keeps its
    # object when the RIGHT side matches onto it (atom/atom.py:40-53 argument
    # order), so the first-observed form propagates as the canonical one.
    order = []
    if has_existing:
        order.append(F.col("is_existing").desc())
    if order_col is not None:
        order.append(F.col(order_col).asc_nulls_last())
    order += [F.col(c).asc() for c in key_cols]
    w = Window.partitionBy("comp").orderBy(*order)
    ranked = labeled.withColumn("__rn", F.row_number().over(w))

    reps = ranked.where(F.col("__rn") == 1).select(
        F.col("comp"),
        *[F.col(c).alias(f"canon_{c}") for c in key_cols],
    )
    return (
        ranked.withColumn("is_rep", F.col("__rn") == 1)
        .drop("__rn")
        .join(reps, "comp")
    )
