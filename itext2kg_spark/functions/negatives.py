"""Deterministic negative sampling over the canonical KG — the training
bridge between the graph store and a KG-embedding job (TransE/DistMult
style), where each true (src, pred, dst) edge needs k corrupted
negatives that are (a) uniform over the entity vocabulary, (b)
replayable, and (c) guaranteed not to be accidental positives.

Construction, all Catalyst:
1. entity index: row_number over the (deterministically ordered) entity
   table — one small shuffle over |V| rows, reused by every epoch.
2. candidate generation: for each edge and j in 1..k, the corrupted
   tail index is the 60-bit md5 of (src, pred, dst, j, salt) mod |V| —
   the same digest idiom as every sampler in this repo, so the SQL
   oracle replays it bit-for-bit. explode(sequence) per edge, a single
   broadcast-or-shuffle equi join on the index to resolve the name.
3. false-negative filter: one left_anti join against the true edge set
   on (src, pred, cand_dst) — corrupted tails that happen to form a
   real edge are dropped (the standard filtered-negative-sampling
   contract; expected loss is |E|/|V| per candidate, so the output is
   within a whisker of k negatives per edge on sparse graphs).

Scale shape: the only corpus-sized structures are the k-exploded edge
stream (k is small) and the anti join on the true edge set — both
shuffle on the corruption key; the entity-index join broadcasts when
|V| fits (the common case: vocabularies are entity tables, not corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_index(edges: DataFrame) -> DataFrame:
    """(name, idx) — dense 0-based index over every entity appearing in
    the edge set, ordered by name (deterministic)."""
    names = (
        edges.select(F.col("src_name").alias("name"))
        .unionByName(edges.select(F.col("dst_name").alias("name")))
        .distinct()
    )
    w = Window.orderBy("name")
    return names.select(
        "name", (F.row_number().over(w) - 1).cast("long").alias("idx")
    )


def kg_negative_samples(
    edges: DataFrame, k: int = 2, salt: str = "kgneg-v1"
) -> DataFrame:
    """src_name, pred, dst_name, neg_j, neg_dst — up to k corrupted-tail
    negatives per true edge, deterministic in (edge, j, salt), never an
    accidental positive. Input needs (src_name, pred, dst_name)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.select("src_name", "pred", "dst_name").distinct()
    idx = entity_index(e)
    n = idx.count()
    j = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_j")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(salt),
                    F.col("src_name"),
                    F.col("pred"),
                    F.col("dst_name"),
                    F.col("neg_j").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    cand = e.select("*", j).withColumn("__cidx", h % F.lit(n))
    resolved = cand.join(
        F.broadcast(idx.withColumnRenamed("idx", "__cidx")), "__cidx"
    ).withColumnRenamed("name", "neg_dst")
    # drop accidental positives: (src, pred, neg_dst) must not be a true edge
    true_e = e.select(
        F.col("src_name").alias("t_src"),
        F.col("pred").alias("t_pred"),
        F.col("dst_name").alias("t_dst"),
    )
    out = resolved.join(
        true_e,
        (F.col("src_name") == F.col("t_src"))
        & (F.col("pred") == F.col("t_pred"))
        & (F.col("neg_dst") == F.col("t_dst")),
        "left_anti",
    )
    return out.select(
        "src_name", "pred", "dst_name",
        F.col("neg_j").cast("long").alias("neg_j"),
        "neg_dst",
    )
