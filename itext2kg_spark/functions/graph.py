"""Graph queries over the canonical edge table — degrees and k-hop BFS.

The KG build (merge/kg.py) materializes edges as (src, pred, dst) rows;
these are the read-side queries a KG consumer runs against that table.
Both are pure DataFrame algebra over the edge list — no graph runtime, no
driver-side adjacency structure, so they hold at any edge count:

- `degrees`: one union-all projection of the edge list (each edge emits a
  src-side and a dst-side row) + one groupBy(name) with map-side combine.
  Distinct-neighbor counts ride the same aggregation (Spark expands the
  two count-distincts; the expansion factor is a constant 3x on a
  two-column projection, not a second shuffle of the full table).

- `k_hop`: frontier BFS as k rounds of (frontier ⋈ edges) with an
  anti-join against the visited set — each round shuffles only the
  frontier and its out-edges, and the visited/frontier tables are entity-
  cardinality-sized (no path enumeration, min-distance by construction:
  a node joins the visited set the first round it is reached). k is a
  small constant (neighborhood queries); for unbounded reachability use
  the connected-components machinery in merge/components.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(
    edges: DataFrame,
    src_col: str = "src_name",
    dst_col: str = "dst_name",
) -> DataFrame:
    """(name, out_edges, in_edges, out_neighbors, in_neighbors) per entity
    appearing in the edge table. Edge rows are counted as given — pass a
    canonical (deduplicated) edge table for structural degrees."""
    src = F.col(src_col)
    dst = F.col(dst_col)
    sides = edges.select(
        src.alias("name"),
        F.lit(1).alias("o"),
        F.lit(0).alias("i"),
        dst.alias("nbr_o"),
        F.lit(None).cast("string").alias("nbr_i"),
    ).unionByName(
        edges.select(
            dst.alias("name"),
            F.lit(0).alias("o"),
            F.lit(1).alias("i"),
            F.lit(None).cast("string").alias("nbr_o"),
            src.alias("nbr_i"),
        )
    )
    return sides.groupBy("name").agg(
        F.sum("o").alias("out_edges"),
        F.sum("i").alias("in_edges"),
        F.countDistinct("nbr_o").alias("out_neighbors"),
        F.countDistinct("nbr_i").alias("in_neighbors"),
    )


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    src_col: str = "src_name",
    dst_col: str = "dst_name",
    directed: bool = True,
) -> DataFrame:
    """(name, dist) — minimum hop count (0..k) from the seed set along
    out-edges (or either direction when directed=False). `seeds` is a
    single-column DataFrame of entity names."""
    adj = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    )
    if not directed:
        adj = adj.unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
    adj = adj.distinct()

    visited = seeds.toDF("name").distinct().withColumn(
        "dist", F.lit(0).cast("int")
    )
    frontier = visited.select("name")
    for depth in range(1, k + 1):
        nxt = (
            adj.join(frontier.withColumnRenamed("name", "u"), "u")
            .select(F.col("v").alias("name"))
            .distinct()
            .join(visited.select("name"), "name", "left_anti")
        )
        # bound lineage growth across rounds: each frontier is small
        # (entity-cardinality), and checkpointing keeps round r+1's plan
        # from re-running rounds 1..r
        nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(
            nxt.withColumn("dist", F.lit(depth).cast("int"))
        )
        frontier = nxt
    return visited
