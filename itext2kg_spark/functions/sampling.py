"""Deterministic corpus sampling and sequence packing — the dataset-mix
side of a training-data pipeline.

Four operators:

- hash_stratified_sample: keep a per-stratum fraction of documents,
  decided by a salted md5 hash of the document id — deterministic,
  join-free, replayable (the same (salt, id) always lands in the same
  bucket, so re-running the pipeline or sampling a superset corpus keeps
  exactly the same documents: the property quota-based mixes need when a
  crawl is re-cut). The hash bucket is conv(substring(md5, 1, 15), 16, 10)
  % 10000 — 60 bits of the digest, bit-identical in DuckDB via
  CAST('0x' || substring(md5(..),1,15) AS BIGINT), so the oracle
  reproduces the exact kept set.

- global_running_total: exact global cumulative sum in TWO window passes,
  neither corpus-global: a per-bucket running sum (window partitioned by
  a key-range bucket), plus a running sum over the per-bucket totals (one
  row per bucket — thousands of rows at 100 TB, evaluated in a single
  tiny partition) broadcast back. The naive Window.orderBy(...) with no
  partitionBy would pull the whole corpus through ONE task; this is the
  standard scalable decomposition.

- token_budget_mix: per-stratum token-budgeted corpus mixing — each
  domain/source contributes documents in deterministic salted-hash order
  until its token budget fills. The running total reuses the same
  two-phase decomposition, partitioned by (stratum, hash-range bucket).

- pack_sequences: GPT-style concat-and-chunk packing. Documents are laid
  end-to-end in id order; the token stream is cut every `budget` tokens;
  each document reports its global token offset and the first/last chunk
  it lands in. Chunk membership is pure arithmetic on the running total,
  so the operator inherits global_running_total's scalability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itext2kg_spark.functions.text import token_count


def _md5_bucket(key, salt: str, buckets: int = 10000):
    """Deterministic bucket in [0, buckets): 60 md5 bits of salt:key.
    Exactly replicable in DuckDB (see module docstring)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_stratified_sample(
    docs: DataFrame,
    quotas_10k: dict[str, int],
    default_10k: int = 0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Input rows + (bucket, keep), filtered to keep == true.

    quotas_10k maps stratum value -> keep fraction in basis points
    (5000 = 50%); strata not listed use default_10k. Changing the salt
    draws an independent sample; keeping it fixed makes the sample stable
    across re-runs and corpus growth.
    """
    bucket = _md5_bucket(F.col(id_col), salt)
    quota = F.lit(default_10k)
    for value, q in sorted(quotas_10k.items()):
        quota = F.when(F.col(strata_col) == value, F.lit(q)).otherwise(quota)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < quota)
    )


def global_running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    bucket_width: int = 1 << 16,
) -> DataFrame:
    """Adds out_col = inclusive running sum of value_col in order_col
    order. order_col must be unique (ties would make the fold order — and
    therefore the result — nondeterministic); doc ids satisfy this.

    Scale shape: window 1 partitions by floor(order_col / bucket_width)
    (parallel, every partition independent); window 2 runs over one row
    per bucket; the bucket-offset table broadcasts back. No corpus-sized
    single-partition window anywhere.
    """
    b = F.floor(F.col(order_col) / F.lit(bucket_width))
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = df.withColumn("__bucket", b).withColumn(
        "__cum_in", F.sum(value_col).over(w_in)
    )
    totals = part.groupBy("__bucket").agg(F.sum(value_col).alias("__total"))
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__offset"),
    )
    return (
        part.join(F.broadcast(offsets), on="__bucket")
        .withColumn(out_col, (F.col("__cum_in") + F.col("__offset")).cast("long"))
        .drop("__bucket", "__cum_in")
    )


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-order-v1",
) -> DataFrame:
    """doc_id, stratum, n_tokens, cum_tokens, kept — token-budgeted
    corpus mixing: each stratum (domain/source/language) contributes
    documents in a deterministic salted-hash order until its token budget
    is exhausted. kept = the document's cumulative token total still fits
    the stratum's budget (the straddling document is dropped, so a kept
    mix never exceeds any budget).

    This is the "give me a 30B-token web slice, 5B of books, 1B of code"
    cut a pretraining mix needs. Replayable: the same (corpus, salt)
    always yields the same cut, and the hash order makes the cut a
    uniform random sample of each stratum rather than a crawl-order
    prefix. (Unlike hash_stratified_sample, the cut is NOT superset-
    stable — the running total is order-dependent, so documents added by
    a re-crawl can displace survivors near the budget boundary; re-cut
    and diff when that matters.)

    Scale shape: the per-stratum running total is the same two-phase
    decomposition as global_running_total, partitioned by (stratum,
    hash-range bucket) — a hot stratum holding 90% of the corpus still
    spreads over 2^16 range buckets; no stratum-sized single partition.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    t = docs.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        h.alias("__h"),
    )
    # phase 1: running sum inside (stratum, 2^16 hash-range buckets)
    b = F.floor(F.col("__h") / F.lit(1 << 44))
    w_in = (
        Window.partitionBy("stratum", "__bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = t.withColumn("__bucket", b).withColumn(
        "__cum_in", F.sum("n_tokens").over(w_in)
    )
    # phase 2: one row per (stratum, bucket); window is per-stratum over
    # <= 2^16 rows
    totals = part.groupBy("stratum", "__bucket").agg(
        F.sum("n_tokens").alias("__total")
    )
    w_b = (
        Window.partitionBy("stratum")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "stratum",
        "__bucket",
        F.coalesce(F.sum("__total").over(w_b), F.lit(0)).alias("__offset"),
    )
    budget = F.lit(default_budget)
    for value, q in sorted(budgets.items()):
        budget = F.when(F.col("stratum") == value, F.lit(q)).otherwise(budget)
    return (
        part.join(F.broadcast(offsets), on=["stratum", "__bucket"])
        .withColumn("cum_tokens", (F.col("__cum_in") + F.col("__offset")).cast("long"))
        .withColumn("kept", F.col("cum_tokens") <= budget)
        .select(id_col, "stratum", "n_tokens", "cum_tokens", "kept")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id, n_tokens, tok_offset, bin_first, bin_last.

    tok_offset = global token-stream position where this document starts
    (documents concatenated in id order); bin_first/bin_last = the
    budget-sized chunks the document's tokens land in (documents straddle
    chunk boundaries, as GPT-style pretraining packing does). Empty
    documents occupy zero tokens: bin_last = bin_first - 1 flags them as
    spanning no chunk.
    """
    with_tok = docs.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    cum = global_running_total(
        with_tok, order_col=id_col, value_col="n_tokens", out_col="__cum"
    )
    offset = (F.col("__cum") - F.col("n_tokens")).cast("long")
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        offset.alias("tok_offset"),
        F.floor(offset / F.lit(budget)).cast("long").alias("bin_first"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor((F.col("__cum") - 1) / F.lit(budget)),
        )
        .otherwise(F.floor(offset / F.lit(budget)) - 1)
        .cast("long")
        .alias("bin_last"),
    )
