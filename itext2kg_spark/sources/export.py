"""Graph-store export (S3 parity) and the embedding cache (S6).

`cypher_export` renders the canonical tables as BYTE-IDENTICAL strings to the
queries `Neo4jStorage` builds (graph_integration/neo4j_storage.py):
  * nodes — `create_nodes` (:155-191): MERGE on sanitized label + escaped
    name, one `SET n.<prop> = ...` per EntityProperties field (embeddings via
    the comma-joined numpy codec, :54-67);
  * relationships — `create_relationships` (:193-246): MATCH both endpoints
    by sanitized label + name, MERGE the sanitized type, and ON CREATE /
    ON MATCH SET of EVERY RelationshipProperties field — embeddings,
    atomic_facts, t_obs, t_start, t_end — through `format_property_value`
    (:98-136: quoted codec string for embeddings, Neo4j list literals with
    per-item type rules for lists, bare numbers, quoted escaped scalars).

The reference issues these as one bolt query per element from a driver loop;
here the same strings are BUILT distributed (one vectorized pandas UDF per
table — the formatting is Python-string semantics like numpy's float repr,
so Python is the correct tool, Arrow-batched) and written as text files a
loader can stream to neo4j-admin or a bolt pipe. Sanitization uses the
reference's own character rules (str.isalnum — unicode-aware, unlike a
regex [A-Za-z0-9] class), verified by string-equality tests against the live
`Neo4jStorage.create_nodes` / `create_relationships` on the same KG.

`EmbeddingCache` is the S6 pickle cache re-expressed as a parquet/Iceberg
table (text -> embedding): `lookup` left-joins the corpus against the cache
and only misses reach the (expensive) embedder; `update` appends the newly
embedded strings.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# P6 embedding string codec (neo4j_storage.py:54-82)
# ---------------------------------------------------------------------------


def embedding_to_string(col):
    """P6 codec: array<float> -> comma-joined string (neo4j_storage.py:55-66)."""
    return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")


def string_to_embedding(col):
    return F.transform(F.split(col, ","), lambda s: s.cast("float"))


# ---------------------------------------------------------------------------
# Python formatting primitives — the exact counterparts of the reference's
# static methods; the parity tests compare whole emitted queries against the
# live reference class, so any drift here fails string equality.
# ---------------------------------------------------------------------------


def _escape_str(s: str) -> str:
    """escape_str (neo4j_storage.py:84-89)."""
    return s.replace('"', '\\"')


def _format_value(value) -> str:
    """format_value (neo4j_storage.py:91-96)."""
    return _escape_str(str(value))


def _sanitize_label(label) -> str:
    """sanitize_label (neo4j_storage.py:268-293): keep unicode alphanumerics
    and underscores, 'L' prefix when digit-leading, 'Entity' fallback."""
    if not label:
        return "Entity"
    sanitized = "".join(c for c in str(label) if c.isalnum() or c == "_")
    if sanitized and sanitized[0].isdigit():
        sanitized = "L" + sanitized
    return sanitized or "Entity"


def _sanitize_reltype(rel_type) -> str:
    """sanitize_relationship_type (neo4j_storage.py:295-320)."""
    if not rel_type:
        return "RELATES_TO"
    sanitized = "".join(c for c in str(rel_type) if c.isalnum() or c == "_")
    if sanitized and sanitized[0].isdigit():
        sanitized = "R" + sanitized
    return sanitized or "RELATES_TO"


def _embeddings_str(value) -> str:
    """transform_embeddings_to_str_list (neo4j_storage.py:54-67): numpy
    astype('str') join — dtype-faithful, so float32 engine vectors print as
    float32 (compare against a reference KG built with the same dtype)."""
    if value is None:
        return ""
    return ",".join(list(np.asarray(value).astype("str")))


def _format_property_value(key: str, value) -> str:
    """format_property_value (neo4j_storage.py:98-136)."""
    if key == "embeddings":
        return f'"{_embeddings_str(value)}"'
    if isinstance(value, (list, np.ndarray)):
        items = list(value)
        if not items:
            return "[]"
        formatted = []
        for item in items:
            if isinstance(item, str):
                formatted.append(f'"{_escape_str(item)}"')
            elif isinstance(item, (int, float)):  # np.float64 IS a float
                formatted.append(str(item))
            else:
                formatted.append(f'"{_escape_str(str(item))}"')
        return f"[{', '.join(formatted)}]"
    if isinstance(value, (int, float)):
        return str(value)
    return f'"{_format_value(value)}"'


def node_query(label, name, embeddings) -> str:
    """One create_nodes query string (neo4j_storage.py:166-190).
    EntityProperties has a single field (embeddings, atom/models/entity.py:
    19-20), always rendered through the codec branch."""
    emb = _embeddings_str(
        None if embeddings is None else np.asarray(embeddings)
    )
    return (
        f'MERGE (n:{_sanitize_label(label)} {{name: "{_format_value(name)}"}}) '
        f'SET n.embeddings = "{emb}"'
    )


_REL_PROPS = ["embeddings", "atomic_facts", "t_obs", "t_start", "t_end"]


def relationship_query(
    src_label,
    src_name,
    dst_label,
    dst_name,
    pred,
    embeddings,
    atomic_facts,
    t_obs,
    t_start,
    t_end,
) -> str:
    """One create_relationships query string (neo4j_storage.py:204-244):
    every RelationshipProperties field SET on both MERGE branches, in model
    declaration order (relationship.py:18-23)."""
    values = {
        "embeddings": None if embeddings is None else np.asarray(embeddings),
        "atomic_facts": [] if atomic_facts is None else list(atomic_facts),
        "t_obs": [] if t_obs is None else [float(t) for t in t_obs],
        "t_start": [] if t_start is None else [float(t) for t in t_start],
        "t_end": [] if t_end is None else [float(t) for t in t_end],
    }
    stmts = [
        f"r.{key} = {_format_property_value(key, values[key])}"
        for key in _REL_PROPS
    ]
    set_clause = f'SET {", ".join(stmts)}'
    return (
        f'MATCH (n:{_sanitize_label(src_label)} {{name: "{_format_value(src_name)}"}}), '
        f'(m:{_sanitize_label(dst_label)} {{name: "{_format_value(dst_name)}"}}) '
        f"MERGE (n)-[r:{_sanitize_reltype(pred)}]->(m) "
        f"ON CREATE {set_clause} "
        f"ON MATCH {set_clause}"
    )


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _node_query_udf(
    label: pd.Series, name: pd.Series, emb: pd.Series
) -> pd.Series:
    return pd.Series(
        [node_query(lb, nm, e) for lb, nm, e in zip(label, name, emb)]
    )


@F.pandas_udf(StringType())
def _rel_query_udf(
    src_label: pd.Series,
    src_name: pd.Series,
    dst_label: pd.Series,
    dst_name: pd.Series,
    pred: pd.Series,
    emb: pd.Series,
    facts: pd.Series,
    t_obs: pd.Series,
    t_start: pd.Series,
    t_end: pd.Series,
) -> pd.Series:
    return pd.Series(
        [
            relationship_query(*args)
            for args in zip(
                src_label, src_name, dst_label, dst_name, pred,
                emb, facts, t_obs, t_start, t_end,
            )
        ]
    )


def _opt(df: DataFrame, col: str, typ: str = "array<float>"):
    """Optional column: absent -> typed null (rendered as the reference's
    default — '' for embeddings, [] for the list properties)."""
    return F.col(col) if col in df.columns else F.lit(None).cast(typ)


def cypher_node_queries(entities: DataFrame) -> DataFrame:
    """entities(name, label[, embedding]) -> one MERGE query string per node."""
    return entities.select(
        _node_query_udf(
            F.col("label"), F.col("name"), _opt(entities, "embedding")
        ).alias("value")
    )


def cypher_relationship_queries(edges: DataFrame) -> DataFrame:
    """edges(src_*, pred, dst_*, t_obs, t_start, t_end, atomic_facts
    [, embedding]) -> one MATCH-MATCH-MERGE query string per relationship."""
    return edges.select(
        _rel_query_udf(
            F.col("src_label"),
            F.col("src_name"),
            F.col("dst_label"),
            F.col("dst_name"),
            F.col("pred"),
            _opt(edges, "embedding"),
            _opt(edges, "atomic_facts", "array<string>"),
            _opt(edges, "t_obs", "array<double>"),
            _opt(edges, "t_start", "array<double>"),
            _opt(edges, "t_end", "array<double>"),
        ).alias("value")
    )


def cypher_export(entities: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Write node and relationship MERGE statements as distributed text."""
    cypher_node_queries(entities).write.mode("overwrite").text(
        os.path.join(out_dir, "nodes")
    )
    cypher_relationship_queries(edges).write.mode("overwrite").text(
        os.path.join(out_dir, "relationships")
    )


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
