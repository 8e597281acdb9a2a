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


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize plumbing: image rows -> same schema with meta.width/height set
    to the target and `content` replaced by the resized payload. The resize
    itself is STUBBED like decode (no media libs): fake=True produces a
    deterministic content-derived payload of size width*height//256 bytes,
    so batch shapes and byte-volume behavior are realistic for planning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            out_meta = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                if not fake:
                    raise NotImplementedError(
                        "image resize requires an image library not present"
                        " in this container; pass fake=True for the"
                        " deterministic stand-in"
                    )
                n_bytes = max(16, (width * height) // 256)
                seed_h = hashlib.blake2b(c or b"", digest_size=16).digest()
                reps = -(-n_bytes // len(seed_h))
                out_content.append((seed_h * reps)[:n_bytes])
                meta = dict(m) if m is not None else {}
                meta.update({"width": width, "height": height})
                meta.setdefault("mime", None)
                meta.setdefault("duration_ms", None)
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "meta": out_meta,
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


FRAME_SCHEMA = "url string, frame_idx int, t_ms int, frame binary"


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing: video rows -> one row per sampled frame
    (url, frame_idx, t_ms, frame binary), sampled every `every_ms` over
    meta.duration_ms, capped at `max_frames` per video (no silent cap: rows
    carry frame_idx so the drop is visible). Frame extraction is STUBBED
    (fake frame = hash(content, t_ms)); the row-expansion shape, batch
    amplification and schema are the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "t_ms": [], "frame": []}
            for url, c, m in zip(pdf["url"], pdf["content"], pdf["meta"]):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a media library not present"
                        " in this container; pass fake=True for the"
                        " deterministic stand-in"
                    )
                duration = int((m or {}).get("duration_ms") or 0)
                n = min(max_frames, duration // every_ms + 1)
                for k in range(n):
                    t = k * every_ms
                    rows["url"].append(url)
                    rows["frame_idx"].append(k)
                    rows["t_ms"].append(t)
                    rows["frame"].append(
                        hashlib.blake2b(
                            (c or b"") + t.to_bytes(8, "little"),
                            digest_size=32,
                        ).digest()
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
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
