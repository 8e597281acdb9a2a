"""Embedding stage (P7-P9).

The reference embeds entity names/labels and relation names through an API
embeddings model batched by LangChain (`calculate_embeddings`,
itext2kg/llm_output_parsing/langchain_output_parser.py:223-233), then forms a
weighted entity vector `w_name*emb(name) + w_label*emb(label)`
(atom/models/knowledge_graph.py:29-43).

Here the embedder is pluggable. The default `HashEmbedder` is a deterministic
token-hash random-projection embedding (no network, identical in tests, in the
differential harness against the reference matcher, and in benchmarks):

    vec(text) = unit( sum_{token} N(0,1)^dim seeded by blake2b(token||seed) )

Shared-token strings get high cosine ("quantum computing" vs "quantum
computing systems" ≈ 0.8+), disjoint-token strings are near-orthogonal — the
same geometry the merge thresholds (0.7/0.8) were designed against.

Scale notes:
  * Embeddings are computed over **distinct strings only** then joined back
    (the reference also dedups before embedding, knowledge_graph.py:33-41);
    at web scale the distinct-string table is orders of magnitude smaller
    than the mention table and the join-back is a broadcast in most batches.
  * The pandas UDF is Arrow-batched; an API-backed embedder's HTTP batch is
    exactly one Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch),
    mirroring the reference's provider batch limits
    (langchain_output_parser.py:38-71).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def _token_vec(token: str, dim: int, seed: int) -> np.ndarray:
    h = hashlib.blake2b(f"{seed}\x00{token}".encode("utf-8"), digest_size=8).digest()
    rng = np.random.Generator(np.random.PCG64(int.from_bytes(h, "little")))
    return rng.standard_normal(dim)


def hash_embed_texts(texts, dim: int = 256, seed: int = 42) -> np.ndarray:
    """Deterministic embedding for a list of strings -> (n, dim) float32.

    Pure numpy — the same function is handed to the reference matcher in the
    differential tests so both systems score in an identical vector space.
    """
    cache: dict[str, np.ndarray] = {}
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        t = "" if t is None else str(t)
        tokens = t.split() or [""]
        acc = np.zeros(dim)
        for tok in tokens:
            v = cache.get(tok)
            if v is None:
                v = _token_vec(tok, dim, seed)
                cache[tok] = v
            acc += v
        n = np.linalg.norm(acc)
        if n > 0:
            acc /= n
        out[i] = acc
    return out.astype(np.float32)


class HashEmbedder:
    """Pluggable embedder: `udf()` returns a pandas UDF text -> array<float>."""

    def __init__(self, dim: int = 256, seed: int = 42):
        self.dim = dim
        self.seed = seed

    def __call__(self, texts) -> np.ndarray:
        return hash_embed_texts(list(texts), self.dim, self.seed)

    def udf(self):
        dim, seed = self.dim, self.seed

        @F.pandas_udf(ArrayType(FloatType()))
        def embed(s: pd.Series) -> pd.Series:
            mat = hash_embed_texts(s.tolist(), dim, seed)
            return pd.Series(list(mat))

        return embed


def with_embedding(
    df: DataFrame,
    text_col: str | Column,
    out_col: str,
    embedder,
) -> DataFrame:
    """Embed `text_col`, computing each distinct string once then joining back.

    The distinct side is typically tiny relative to the mention table; Spark's
    AQE converts the join-back to a broadcast when it fits. This is the P9
    "embed-once" optimization as a reusable operator.
    """
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    tagged = df.withColumn("__embed_text", text)
    distinct = tagged.select("__embed_text").distinct()
    embedded = distinct.withColumn(out_col, embedder.udf()(F.col("__embed_text")))
    return tagged.join(embedded, "__embed_text", "left").drop("__embed_text")
