"""Fixed-iteration PageRank over the canonical edge table.

The centrality query a KG consumer runs to find load-bearing entities.
Iterative DataFrame algebra, one bounded loop on the driver building a
declarative plan per round — no graph runtime, no driver-side adjacency:

  contribs(r) = ranks(r-1) ⋈ out_degree  -> rank/deg per edge, grouped by dst
  ranks(r)    = (1-d)/N + d * (contribs + dangling_mass/N)

Each round is ONE equi-join on src plus ONE groupBy(dst) with map-side
combine — the join key distribution is the graph's out-degree skew, which
AQE's skew-join splitting handles (hot entities are exactly the case the
north rule's salting exists for). Ranks/degree tables are
entity-cardinality-sized. Every round localCheckpoints, so round r+1's
plan does not re-run rounds 1..r and lineage stays O(1).

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard strongly-preserving formulation, so sum(rank) == 1 every round
(asserted in tests).

Fixed `iters` rather than convergence-delta because the oracle unrolls the
same rounds as SQL CTEs: determinism beats adaptivity for a verification
surface, and consumers wanting convergence can loop on the returned
DataFrame themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src_name",
    dst_col: str = "dst_name",
) -> DataFrame:
    """(name, rank) after `iters` rounds from a uniform start, on the
    DISTINCT (src, dst) edge set. rank is rounded to 9 decimals at the end
    (cross-engine determinism; intermediate rounds stay full-precision)."""
    adj = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).distinct()
    adj = adj.localCheckpoint(eager=True)

    nodes = (
        adj.select(F.col("u").alias("name"))
        .unionByName(adj.select(F.col("v").alias("name")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = adj.groupBy(F.col("u").alias("name")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # static per-node table: out-degree (null -> dangling)
    base = nodes.join(outdeg, "name", "left").localCheckpoint(eager=True)

    ranks = base.select("name", "deg", (F.lit(1.0) / n).alias("rank"))
    for _ in range(iters):
        dangling = ranks.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        contribs = (
            adj.join(
                ranks.select(
                    F.col("name").alias("u"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias("name"))
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            base.join(contribs, "name", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "name",
                "deg",
                (
                    (1.0 - damping) / n
                    + damping
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("name", F.round("rank", 9).alias("rank"))
