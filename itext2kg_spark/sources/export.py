"""Graph-store export (S3 parity) and the embedding cache (S6).

`cypher_export` renders the canonical tables as the same MERGE statements
`Neo4jStorage` emits (graph_integration/neo4j_storage.py:155-246): one
`MERGE (n:Label {name}) SET n.embeddings` per entity, one
`MATCH..MATCH..MERGE (a)-[r:TYPE]->(b) ON CREATE/ON MATCH SET` per edge —
but built with Catalyst string expressions and written as distributed text,
not a driver loop issuing one bolt query per element. Labels/types pass
through the storage sanitizer (P5); embeddings serialize with the
comma-joined codec (P6, neo4j_storage.py:55-82).

`EmbeddingCache` is the S6 pickle cache re-expressed as a parquet/Iceberg
table (text -> embedding): `lookup` left-joins the corpus against the cache
and only misses reach the (expensive) embedder; `update` appends the newly
embedded strings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from itext2kg_spark.functions.normalize import (
    sanitize_storage_label,
    sanitize_storage_reltype,
)


def embedding_to_string(col):
    """P6 codec: array<float> -> comma-joined string (neo4j_storage.py:55-66)."""
    return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")


def string_to_embedding(col):
    return F.transform(F.split(col, ","), lambda s: s.cast("float"))


def cypher_export(entities: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Write node and relationship MERGE statements as text files."""
    esc = lambda c: F.regexp_replace(c, "'", "\\\\'")  # noqa: E731
    nodes = entities.select(
        F.concat(
            F.lit("MERGE (n:"),
            sanitize_storage_label(F.col("label")),
            F.lit(" {name: '"),
            esc(F.col("name")),
            F.lit("'}) SET n.embeddings = '"),
            embedding_to_string(F.col("embedding")),
            F.lit("';"),
        ).alias("value")
    )
    rels = edges.select(
        F.concat(
            F.lit("MATCH (a {name: '"),
            esc(F.col("src_name")),
            F.lit("'}) MATCH (b {name: '"),
            esc(F.col("dst_name")),
            F.lit("'}) MERGE (a)-[r:"),
            sanitize_storage_reltype(F.col("pred")),
            F.lit("]->(b) ON CREATE SET r.t_obs = ["),
            F.array_join(F.transform("t_obs", lambda x: x.cast("string")), ","),
            F.lit("] ON MATCH SET r.t_obs = ["),
            F.array_join(F.transform("t_obs", lambda x: x.cast("string")), ","),
            F.lit("];"),
        ).alias("value")
    )
    nodes.write.mode("overwrite").text(os.path.join(out_dir, "nodes"))
    rels.write.mode("overwrite").text(os.path.join(out_dir, "relationships"))


class EmbeddingCache:
    """Persistent text->embedding table; embed only cache misses (S6)."""

    def __init__(self, path: str):
        self.path = path

    def _load(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.path)
        except Exception:
            return None

    def lookup_and_update(
        self, texts: DataFrame, embedder, text_col: str = "text"
    ) -> DataFrame:
        """texts(text) -> (text, embedding); misses embedded + appended."""
        spark = texts.sparkSession
        distinct = texts.select(F.col(text_col).alias("text")).distinct()
        cached = self._load(spark)
        if cached is not None:
            hits = distinct.join(cached, "text", "inner")
            misses = distinct.join(cached.select("text"), "text", "left_anti")
        else:
            hits = None
            misses = distinct
        # materialize the misses once: isEmpty + write + the returned union
        # all read the checkpointed rows instead of re-running the embedder /
        # re-reading the whole cache (round-1 version did 2 extra actions and
        # a full cache re-read per call)
        new = misses.withColumn(
            "embedding", embedder.udf()(F.col("text"))
        ).localCheckpoint()
        if not new.isEmpty():
            new.write.mode("append").parquet(self.path)
        return new if hits is None else hits.unionByName(new)
