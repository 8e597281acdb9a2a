"""Similarity-candidate generation (J2/J3): pairs with cosine >= threshold.

The reference computes a dense (N, M) cosine matrix on the driver
(atom/graph_matching/matcher.py:68-74) — single-node and memory-bound. Here
candidates come from one of two shuffle-parallel plans:

  * "broadcast": exact all-pairs. The small side (bounded by
    `broadcast_limit`) is shipped to every partition as a numpy matrix and
    each Arrow batch of the big side scores against it with one BLAS matmul
    (`mapInPandas`) — the same vectorized-batch-cosine optimization the
    reference uses, but distributed over partitions. This beats expressing
    the dot product as Catalyst `zip_with`/`aggregate` by ~100x: higher-order
    array functions are interpreted per element, a (batch x dim) @ (dim x M)
    matmul is BLAS.
  * "lsh": random-hyperplane (SimHash) banding. Unit vectors get B band
    signatures of r sign-bits each; rows sharing any (band, signature) bucket
    become candidates; an Arrow-vectorized exact cosine then filters.
    Collision prob for a pair at cosine θ is 1-(1-p^r)^B, p = 1-arccos(θ)/π —
    (r=6, B=24) ≥ 0.997 recall at θ=0.7. Near-linear in rows; the bucket
    join shuffles on (band, sig), hot buckets split by AQE.

Both return (id_a, id_b, sim) with id_a < id_b, deduped across buckets.
Pairs where both sides are existing-store rows are excluded — the reference
only matches batch-against-store, never store-internal pairs
(matcher.py:41-94), so the canonical store stays stable across increments.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from itext2kg_spark.config import MatchConfig


def md5_rademacher(seed: int, n_rows: int, dim: int) -> "np.ndarray":
    """(n_rows, dim) Rademacher (+-1) float64 matrix whose entry (p, d) is
    2*(md5("{seed}:{p}:{d}") first-8-bytes-little-endian & 1) - 1 — exactly
    DuckDB's `md5_number_upper('{seed}:{p}:{d}') & 1`, so any operator built
    on these rows (LSH hyperplanes, IVF coarse centroids) is bit-for-bit
    replicable in the SQL oracle."""
    import hashlib

    bits01 = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8], "little"
            )
            & 1
            for p in range(n_rows)
            for d in range(dim)
        ),
        dtype=np.int64,
        count=n_rows * dim,
    )
    return (2 * bits01 - 1).reshape(n_rows, dim).astype(np.float64)


def lsh_signatures_udf(dim: int, rows: int, bands: int, seed: int,
                       plane_source: str = "gauss"):
    """pandas UDF: unit embedding -> array<long> of `bands` band signatures.

    Each signature packs `rows` hyperplane sign bits plus the band index so a
    single explode+equi-join covers all bands.

    plane_source="gauss" (default) draws Gaussian hyperplanes from a seeded
    PCG64 — the standard random-hyperplane construction, used by entity
    resolution. plane_source="md5" uses Rademacher (+-1) hyperplanes whose
    entries come from md5("{seed}:{plane}:{dim}") bit 0 — an equally valid
    sign-LSH family (Achlioptas-style +-1 projections) whose signatures a
    SQL engine can recompute EXACTLY (DuckDB md5_number_upper), making the
    whole LSH path oracle-checkable; this mode computes dots in float64 so
    the sign decisions match a SQL engine's double arithmetic."""
    if plane_source == "md5":
        planes = md5_rademacher(seed, bands * rows, dim)
        dtype = np.float64
    else:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((bands * rows, dim)).astype(np.float32)
        dtype = np.float32
    weights = (2 ** np.arange(rows, dtype=np.int64))[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def _sigs(emb: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=dtype) for e in emb])
        if mat.ndim != 2:  # empty batch
            return pd.Series([[] for _ in range(len(emb))])
        bits = (mat @ planes.T) > 0  # (n, bands*rows)
        bits = bits.reshape(len(mat), bands, rows)
        sig = (bits * weights).sum(axis=2).astype(np.int64)  # (n, bands)
        sig = sig + (np.arange(bands, dtype=np.int64) << rows)[None, :]
        return pd.Series(list(sig))

    return _sigs


@F.pandas_udf(DoubleType())
def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized exact cosine for candidate pairs (unit vectors -> dot)."""
    ma = np.asarray([np.asarray(x, dtype=np.float64) for x in a])
    mb = np.asarray([np.asarray(x, dtype=np.float64) for x in b])
    if len(ma) == 0:
        return pd.Series([], dtype=float)
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


def _broadcast_pairs(
    items: DataFrame,
    threshold: float,
    inclusive: bool,
    emb_col: str,
    id_col: str,
    gate_existing: bool,
) -> DataFrame:
    """Exact all-pairs via per-partition BLAS matmul against the collected
    small side (<= broadcast_limit rows)."""
    sel = [id_col, emb_col] + (["is_existing"] if gate_existing else [])
    rows = items.select(*sel).collect()
    if not rows:
        return items.sparkSession.createDataFrame(
            [], "id_a long, id_b long, sim double"
        )
    ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
    mat = np.asarray([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    exist = (
        np.asarray([bool(r["is_existing"]) for r in rows])
        if gate_existing
        else np.zeros(len(rows), dtype=bool)
    )
    spark = items.sparkSession
    b = spark.sparkContext.broadcast((ids, mat, exist))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b, exist_b = b.value
        m = len(ids_b)
        # Row-block the arrow batch so each (rows x M) sims block stays
        # ~32 MB: one giant block (2k-row partition x 64k items = 1 GB of
        # float64 PER TASK, x32 concurrent tasks) thrashes the allocator —
        # measured 3.5s @32k -> 102s-254s @64k before blocking. Small blocks
        # keep the BLAS + mask sweep in cache and the worker RSS flat.
        blk = max(1, (32 << 20) // (m * 8))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf[emb_col]]
            )
            a_exist = (
                pdf["is_existing"].to_numpy(dtype=bool)
                if gate_existing
                else np.zeros(len(pdf), dtype=bool)
            )
            for s in range(0, len(pdf), blk):
                r_ids = a_ids[s:s + blk]
                sims = a_mat[s:s + blk] @ mat_b.T  # (blk, M) — BLAS
                cond = sims >= threshold if inclusive else sims > threshold
                cond &= r_ids[:, None] < ids_b[None, :]
                if gate_existing:
                    cond &= ~(a_exist[s:s + blk][:, None] & exist_b[None, :])
                ai, bj = np.nonzero(cond)
                yield pd.DataFrame(
                    {
                        "id_a": r_ids[ai],
                        "id_b": ids_b[bj],
                        "sim": sims[ai, bj],
                    }
                )

    return items.select(*sel).mapInPandas(
        score, schema="id_a long, id_b long, sim double"
    )


def candidate_pairs(
    items: DataFrame,
    cfg: MatchConfig,
    threshold: float,
    emb_col: str = "emb",
    id_col: str = "id",
    n_items: int | None = None,
    emb_dim: int | None = None,
) -> DataFrame:
    """items(id, emb[, is_existing]) -> (id_a, id_b, sim), id_a < id_b.

    `emb` must be unit-normalized (cosine == dot). `emb_dim` byte-bounds the
    broadcast path and saves the LSH path a dim-probing job.
    """
    method = cfg.candidate_method
    if method == "auto":
        n = n_items if n_items is not None else items.count()
        method = "broadcast" if n <= cfg.candidate_broadcast_limit(emb_dim) else "lsh"

    has_existing = "is_existing" in items.columns

    if method == "broadcast":
        return _broadcast_pairs(
            items,
            threshold,
            cfg.inclusive,
            emb_col,
            id_col,
            gate_existing=has_existing,
        )

    # ---- LSH path -----------------------------------------------------------
    # The band join is ids-only: candidate volume is O(sum bucket_size^2)
    # rows pre-dedup (measured 82M rows for 20k clustered vectors at 24
    # bands), and carrying the two embedding arrays through the join + the
    # pair-dedup shuffle multiplies its bytes ~60x (64-dim float64 pairs =
    # ~1KB/row vs 16B of ids — ~80GB vs ~1.3GB at that scale). The deduped
    # pair set joins back to `items` for exact scoring, so the wide arrays
    # touch only distinct candidate pairs.
    sel = [id_col] + (["is_existing"] if has_existing else [])
    gate = F.lit(True)
    if has_existing:
        gate = ~(F.col("is_existing_a") & F.col("is_existing_b"))
    if emb_dim:
        dim = emb_dim
    else:  # embedding dim read from one row (the schema doesn't carry it)
        first = items.select(F.size(emb_col).alias("d")).first()
        dim = int(first["d"]) if first else 2
    sigs = lsh_signatures_udf(dim, cfg.lsh_rows, cfg.lsh_bands, cfg.lsh_seed)
    sig_items = items.select(*sel, F.explode(sigs(F.col(emb_col))).alias("sig"))
    a = sig_items.select(*[F.col(c).alias(f"{c}_a") for c in sel], F.col("sig"))
    b = sig_items.select(*[F.col(c).alias(f"{c}_b") for c in sel], F.col("sig"))
    pair_ids = (
        a.join(b, "sig")
        .where((F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & gate)
        .select(f"{id_col}_a", f"{id_col}_b")
        .dropDuplicates([f"{id_col}_a", f"{id_col}_b"])
    )
    ea = items.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col(emb_col).alias(f"{emb_col}_a")
    )
    eb = items.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col(emb_col).alias(f"{emb_col}_b")
    )
    sim = pair_cosine(F.col(f"{emb_col}_a"), F.col(f"{emb_col}_b"))
    pairs = (
        pair_ids.join(ea, f"{id_col}_a")
        .join(eb, f"{id_col}_b")
        .withColumn("sim", sim)
        .where(F.col("sim") >= threshold if cfg.inclusive else F.col("sim") > threshold)
    )
    return pairs.select(
        F.col(f"{id_col}_a").alias("id_a"),
        F.col(f"{id_col}_b").alias("id_b"),
        "sim",
    )
