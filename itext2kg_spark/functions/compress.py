"""Compression-ratio quality signal — the Gopher/RefinedWeb filter that
catches what token statistics miss.

Highly repetitive or templated pages compress far below normal prose;
random-looking spam compresses worse. `compression_ratio` scores every
document as deflate(text).bytes / text.bytes (utf-8), the signal the
Gopher filters pair with the repetition stats already in
functions/repetition.py.

This is a DECLARED Python-UDF family (like extract/multimodal.py): zlib
is bytes-in/float-out with no Catalyst equivalent, so the operator is an
Arrow-batched mapInPandas over the minimal (id, text) projection —
column pruning keeps the scan narrow, the stage is one pass with no
shuffle, and determinism comes from pinning the zlib level (zlib output
is stable for a given level and input across CPython builds; the tests
pin exact byte counts). No DuckDB oracle exists for deflate, so this op
is pytest-verified (exact values + monotonicity) rather than
hash-oracled — the same verification tier as the multimodal decoders.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "doc_id long, n_bytes long, n_compressed long, ratio double"


def compression_ratio(
    docs: DataFrame,
    level: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id, n_bytes, n_compressed, ratio — deflate ratio per document
    (ratio = compressed/raw; empty documents report ratio 1.0)."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf[text_col]]
            comp = [len(zlib.compress(b, level)) for b in raw]
            n = [len(b) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "n_compressed": comp,
                    "ratio": [
                        (c / b) if b else 1.0 for c, b in zip(comp, n)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(score, schema=OUT_SCHEMA)
