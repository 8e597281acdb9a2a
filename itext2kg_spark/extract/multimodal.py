"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side plumbing is real and tested — schema, partitioning, UDF
signature, bounded batch shape. The actual media decode is STUBBED: this
container ships no image/audio libraries, so `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
hash-derived feature vector stands in (stable across runs, suitable for
pipeline/integration tests). Swapping in PIL/libav is a one-function change;
nothing upstream or downstream moves.

Schema convention:
    media(url string, kind string, content binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
    features(url string, kind string, n_bytes long, sha string,
             feature array<float>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, kind string, content binary,"
    " meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "url string, kind string, n_bytes long, sha string, feature array<float>"
)

FEATURE_DIM = 16


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode + feature-extract one image. STUB: no media libs in sandbox."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image library not present in this "
            "container; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.blake2b(content or b"", digest_size=FEATURE_DIM * 4).digest()
    return (
        np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
    )


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> features via mapInPandas (the one place bytes are touched).

    Columns are pruned to exactly what the stage needs; the binary column
    never survives past this operator, so downstream scans stay narrow.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(c, fake=fake) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.select("url", "kind", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.Generator(np.random.PCG64([seed, int(i)]))
                kind = ["image", "audio", "video"][int(i) % 3]
                content = rng.bytes(64 + int(i) % 128)
                rows.append(
                    {
                        "url": f"https://media.example.com/{kind}/{int(i)}",
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "mime": f"{kind}/x-fake",
                            "width": int(rng.integers(100, 2000)),
                            "height": int(rng.integers(100, 2000)),
                            "duration_ms": int(rng.integers(0, 60000)),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
