"""Token-window document chunking — the pre-pass every extraction and
RAG pipeline runs before per-chunk LLM/NER work.

The reference feeds its ATOM atomic-fact module "<400-token chunks"
(reference README.md:79, 'optimal chunk size of <400 tokens'); its
example notebooks chunk with LangChain splitters before
build_graph. This is the distributed equivalent: deterministic
whitespace-token windows with a configurable stride (stride < size gives
overlapping chunks, the usual RAG setting), each chunk carrying its
(doc_id, chunk_id, start_tok) lineage so downstream extraction keeps
provenance — the same lineage shape extract/facts.py uses.

All Catalyst: tokens once per document, a `sequence` of window starts,
one `transform` building (start, slice) structs, one posexplode. No
shuffle, no Python worker; a 100 TB corpus chunks at scan speed and the
output inherits the input's partitioning.

Token boundaries come from the shared tokens_col splitter, so chunk
counts agree with token_count and the SQL oracle replays the windows
with the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.functions.text import tokens_col


def chunk_documents(
    docs: DataFrame,
    size: int = 400,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id, chunk_id, start_tok, n_tokens, chunk — token windows of
    `size`, starting every `stride` tokens (default: stride = size,
    disjoint cover). The final window may be short; documents with no
    tokens emit no rows. Deterministic and replayable."""
    if stride is None:
        stride = size
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    # same emptiness contract as token_count: an all-whitespace document
    # has zero tokens (split(trim('')) would report one empty token)
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(tokens_col(F.col(text_col)))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.slice(toks, s + 1, size).alias("win"),
        ),
    )
    out = docs.where(n > 0).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "c"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.start_tok").cast("long").alias("start_tok"),
        F.size("c.win").cast("long").alias("n_tokens"),
        F.array_join("c.win", " ").alias("chunk"),
    )
