"""Corpus unigram language-model quality scoring (CCNet-style proxy).

CCNet (Wenzek et al. 2020) buckets web documents by language-model
perplexity; The Pile / RefinedWeb use the same idea as a junk detector.
This module implements the distributable core of that filter: fit a
unigram model on the corpus itself (one aggregation), then score each
document by how typical its tokens are under that model.

The score is the *arithmetic* mean of per-token corpus term frequencies
rather than the geometric mean (log-space perplexity): transcendental
functions are not bit-portable across engines (JVM StrictMath vs DuckDB's
libm can differ in the last ulp, which flips floor(x*10000) at
boundaries), while counts, sums, and integer ratios are exact everywhere.
Rare-token-heavy junk scores low under either mean; the ordering, not the
absolute scale, is what the downstream percentile cut consumes. min_tf
(the corpus frequency of the document's rarest token) is emitted
alongside as the sharpest single junk signal.

Scale notes (100 TB lens): the vocabulary aggregation and the score
aggregation both partial-combine map-side; the only corpus-global state
is the vocabulary table (one row per distinct token — Heaps' law keeps it
several orders smaller than the corpus). The token->vocab join is left to
AQE: when the vocab fits the broadcast threshold it becomes a broadcast
hash join at runtime; otherwise it shuffles on token, and the zipfian
head ("the") is already collapsed to one row per (doc, token) by the
preceding per-document count, so no single key carries more than
n_documents rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = False,
) -> DataFrame:
    """doc_id, n_tokens, sum_tf, avg_tf_10k, min_tf.

    avg_tf_10k = floor(10000 * sum(tf(token)) / n_tokens) where tf is the
    token's corpus-wide occurrence count (the document's own occurrences
    included — the model is fit on the full corpus, so every token has
    tf >= 1 and smoothing is unnecessary). min_tf is the smallest tf in
    the document. Empty documents report 0 / 0 / 0 / 0.

    broadcast_vocab=True adds an explicit broadcast hint for the vocab
    side of the score join; leave False to let AQE decide from the
    runtime size.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    doc_tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = doc_tf.groupBy("tok").agg(F.sum("c").alias("tf"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)

    per_doc = (
        doc_tf.join(vocab, on="tok")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("tf")).alias("sum_tf"),
            F.min("tf").alias("min_tf"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("sum_tf"), F.lit(0)).cast("long").alias("sum_tf"),
            F.when(
                F.col("n_tokens") > 0,
                F.floor(F.col("sum_tf") * 10000.0 / F.col("n_tokens")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("avg_tf_10k"),
            F.coalesce(F.col("min_tf"), F.lit(0)).cast("long").alias("min_tf"),
        )
    )
