"""MinHash + LSH near-dup detection: shingle -> minhash -> band -> bucket join.

The scale path for n-gram Jaccard: signatures are fixed-size (k hashes) per
document regardless of length, candidate generation is an equi-join on
(band, band_signature) buckets, and only candidates pay the exact-verify
cost. With k=64, b=16 bands of r=4 rows, P(candidate | J=0.8) ≈ 1-(1-0.8^4)^16
≈ 0.9997 — so verified output matches exact Jaccard pairs with near-certain
recall.

The signature computation is the one pandas UDF (Arrow-batched numpy: gram
hashing + (a*x+b) mod p row-min); banding, bucket join and exact verification
are DataFrame ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from itext2kg_spark.dedup.ngram import jaccard_pairs, restricted_filtered_grams

_MERSENNE = (1 << 61) - 1


def _gram_hashes(text: str, n: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
            for g in set(grams)
        ),
        dtype=np.uint64,
    )
    return hs


def minhash_signatures_udf(k: int = 64, n: int = 3, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.tolist():
            hs = _gram_hashes(t or "", n)
            # (a*h + b) mod p, row-min per permutation — vectorized (k, |grams|)
            vals = (a[:, None] * (hs[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return _sig


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard_10k): LSH candidates verified by exact Jaccard.

    Output is identical to `jaccard_pairs` whenever LSH recall holds — the
    DuckDB oracle for this operator IS the exact-Jaccard SQL.
    """
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signatures_udf(k, n, seed)
    with_sig = docs.select(
        F.col(id_col).alias("id"), F.col(text_col), sig(F.col(text_col)).alias("sig")
    ).localCheckpoint(eager=False)  # lazy: plan builders stay side-effect-free

    # band signature = hash of the band's slice + band index
    banded = with_sig.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" bi -> struct(bi as band, xxhash64(slice(sig, bi*{rows}+1, {rows})) as bsig))"
            )
        ).alias("bs"),
    ).select("id", "bs.band", "bs.bsig")

    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bsig"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    # exact verification via the gram equi-join restricted to candidates;
    # the df cutoff counts over the FULL corpus (round-4 advice) with the
    # restriction applied first so join cost stays candidate-proportional
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    grams_c = restricted_filtered_grams(
        docs, cand_ids, n, text_col, id_col, max_gram_df
    )
    exact = jaccard_pairs(
        docs, threshold=threshold, n=n, text_col=text_col, id_col=id_col,
        grams=grams_c, max_gram_df=None,
    )
    return exact.join(cand, ["id_a", "id_b"], "left_semi")
