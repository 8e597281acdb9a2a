"""Similarity-candidate generation (J2/J3): pairs with cosine >= threshold.

The reference computes a dense (N, M) cosine matrix on the driver
(atom/graph_matching/matcher.py:68-74) — O(N·M·d) memory-bound and
single-node. Here candidates come from one of two shuffle-parallel plans:

  * "broadcast": exact all-pairs via a broadcast nested-loop self-join with
    the cosine filter pushed into the join condition (whole-stage codegen'd
    zip_with dot product — no Python). Exact, O(n^2) compute; right only for
    small sides (a batch's distinct entity set, typically << 10^5).
  * "lsh": random-hyperplane (SimHash) banding. Unit vectors get B band
    signatures of r sign-bits each; rows sharing any (band, signature) bucket
    become candidates; exact cosine then filters. Collision prob for a pair
    at cosine θ is 1-(1-p^r)^B, p = 1-arccos(θ)/π — (r=6, B=24) ≥ 0.997
    recall at θ=0.7. Near-linear in rows for non-adversarial data; the
    bucket join shuffles on (band, sig) so hot buckets are split by AQE.

Both return (id_a, id_b, sim) with id_a < id_b, deduped across buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from itext2kg_spark.config import MatchConfig
from itext2kg_spark.functions.vectors import dot


def lsh_signatures_udf(dim: int, rows: int, bands: int, seed: int):
    """pandas UDF: unit embedding -> array<long> of `bands` band signatures.

    Each signature packs `rows` hyperplane sign bits plus the band index so a
    single explode+equi-join covers all bands.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((bands * rows, dim)).astype(np.float32)
    weights = (2 ** np.arange(rows, dtype=np.int64))[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def _sigs(emb: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=np.float32) for e in emb])
        if mat.ndim != 2:  # empty batch
            return pd.Series([[] for _ in range(len(emb))])
        bits = (mat @ planes.T) > 0  # (n, bands*rows)
        bits = bits.reshape(len(mat), bands, rows)
        sig = (bits * weights).sum(axis=2).astype(np.int64)  # (n, bands)
        sig = sig + (np.arange(bands, dtype=np.int64) << rows)[None, :]
        return pd.Series(list(sig))

    return _sigs


def candidate_pairs(
    items: DataFrame,
    cfg: MatchConfig,
    threshold: float,
    emb_col: str = "emb",
    id_col: str = "id",
    n_items: int | None = None,
) -> DataFrame:
    """items(id, emb[, is_existing]) -> (id_a, id_b, sim), id_a < id_b.

    `emb` must be unit-normalized (cosine == dot). Pairs where both sides come
    from the existing canonical store are excluded — the reference only ever
    matches the incoming batch against the store, never store-internal pairs
    (matcher.py:41-94), so the store stays stable across increments.
    """
    method = cfg.candidate_method
    if method == "auto":
        n = n_items if n_items is not None else items.count()
        method = "broadcast" if n <= cfg.broadcast_limit else "lsh"

    has_existing = "is_existing" in items.columns
    sel = [id_col, emb_col] + (["is_existing"] if has_existing else [])
    a = items.select(*[F.col(c).alias(f"{c}_a") for c in sel])
    b = items.select(*[F.col(c).alias(f"{c}_b") for c in sel])

    gate = F.lit(True)
    if has_existing:
        gate = ~(F.col("is_existing_a") & F.col("is_existing_b"))

    sim = dot(F.col(f"{emb_col}_a"), F.col(f"{emb_col}_b"))
    cmp = sim >= threshold if cfg.inclusive else sim > threshold

    if method == "broadcast":
        pairs = a.join(
            F.broadcast(b),
            (F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & gate & cmp,
            "inner",
        )
        return pairs.select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            sim.alias("sim"),
        )

    # LSH path — embedding dim read from one row (schema doesn't carry it)
    first = items.select(F.size(emb_col).alias("d")).first()
    dim = int(first["d"]) if first else 2
    sigs = lsh_signatures_udf(dim, cfg.lsh_rows, cfg.lsh_bands, cfg.lsh_seed)
    sig_items = items.select(*sel, F.explode(sigs(F.col(emb_col))).alias("sig"))
    a = sig_items.select(
        *[F.col(c).alias(f"{c}_a") for c in sel], F.col("sig")
    )
    b = sig_items.select(
        *[F.col(c).alias(f"{c}_b") for c in sel], F.col("sig")
    )
    bucketed = a.join(b, "sig").where(
        (F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & gate
    )
    pairs = bucketed.dropDuplicates([f"{id_col}_a", f"{id_col}_b"]).where(cmp)
    return pairs.select(
        F.col(f"{id_col}_a").alias("id_a"),
        F.col(f"{id_col}_b").alias("id_b"),
        sim.alias("sim"),
    )
