"""Within-document n-gram repetition statistics (Gopher-style filters).

The Gopher / MassiveText quality pipeline (Rae et al. 2021, table A1)
filters web documents by (a) the fraction of characters contained in the
single most frequent n-gram (n = 2..4) and (b) the fraction of characters
contained in duplicated n-grams (n = 5..10).  These are WITHIN-document
statistics — no cross-document state — so the whole operator is two
partial-aggregatable hash aggregations keyed by (doc_id[, gram]): it
scales embarrassingly at 100 TB (the shuffle key space is per-document,
never corpus-global, and map-side combine collapses repeated grams before
the exchange).

Deliberate deltas from the Gopher paper, chosen for cross-engine
determinism (the DuckDB oracle must reproduce every value bit-for-bit):

- "characters in the most frequent n-gram" is computed as
  max(count * len(gram)) over grams with count >= 2 (0 when none).  The
  paper takes the most-frequent gram then multiplies by its length; under
  ties that choice is engine-order-dependent, while the max of the
  product is not.  A gram with count 1 contributes 0 in both readings.
- gram character length counts the single joining spaces of the
  space-joined token slice, not the original inter-token whitespace runs.
- duplicated-gram character fractions count every occurrence (overlaps
  are not deduplicated, same as the reference implementations) and are
  capped at 1.0 before the floor(x*10000) integerization.

Tokens are lowercased whitespace splits — the same tokenizer as
functions/text.py (token_count), so the stats compose with text_stats
over one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, n): top = chars of the most repeated n-gram, dup = chars of all
# duplicated n-grams. The Gopher paper uses top 2-4 and dup 5-10; the two
# dup endpoints bound that band.
DEFAULT_TOP_NS = (2, 3, 4)
DEFAULT_DUP_NS = (5, 10)


def _shifted_zip(tokens, max_n: int):
    """array<struct<a0..a{max_n-1}>> where element i holds tokens
    i..i+max_n-1 (null-padded past the end): arrays_zip of the token
    array with its own left-shifted slices. One native slice per shift —
    NOT one per gram — keeps the whole construction inside whole-stage
    codegen; a per-element transform(slice+array_join) lambda measured
    ~12us/gram interpreted, ~20x this formulation."""
    size = F.size(tokens)
    shifted = [tokens.alias("a0")] + [
        F.slice(tokens, k + 1, F.greatest(size - k, F.lit(0))).alias(f"a{k}")
        for k in range(1, max_n)
    ]
    return F.arrays_zip(*shifted)


def ngram_rows(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, gram) — one row per token n-gram occurrence, lowercased
    whitespace tokens, space-joined. Codegen path (`_shifted_zip`), shared
    by the repetition stats and the decontamination join."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    windows = docs.select(
        F.col(id_col), F.explode(_shifted_zip(toks, n)).alias("w")
    )
    return windows.where(F.col(f"w.a{n - 1}").isNotNull()).select(
        id_col,
        F.concat_ws(" ", *[F.col(f"w.a{k}") for k in range(n)]).alias("gram"),
    )


def ngram_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = DEFAULT_TOP_NS,
    dup_ns: tuple[int, ...] = DEFAULT_DUP_NS,
) -> DataFrame:
    """Per-document repetition stats: doc_id, top{n}_frac_10k for each
    top n, dup{n}_frac_10k for each dup n.

    frac = min(1, repeated-gram characters / len(text)), floored to a
    *_10k bigint. Documents with no qualifying grams (short or empty
    text) report all zeros. Plan shape: one scan -> single explode of a
    per-row struct array covering every requested n -> two hash
    aggregations ((id, n, gram) then (id)) -> left join back to the
    document ids. Both aggregations partial-combine map-side; nothing is
    corpus-global.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    max_n = all_ns[-1]
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    # Two narrow explodes, all codegen: token windows first (one row per
    # token position, struct of the next max_n tokens), then the n-grams
    # of each window (<= len(all_ns) structs per position; a window whose
    # (n-1)-th token is null ends past the text and yields no n-gram —
    # nulls only ever pad the tail, so gating on the LAST token is exact,
    # and concat_ws over the gated window never silently skips a null).
    windows = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.explode(_shifted_zip(toks, max_n)).alias("w"),
    )
    gram_structs = [
        F.when(
            F.col(f"w.a{n - 1}").isNotNull(),
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", *[F.col(f"w.a{k}") for k in range(n)]
                ).alias("gram"),
            ),
        )
        for n in all_ns
    ]
    exploded = (
        windows.select(
            id_col,
            "n_chars",
            F.explode(F.array(*gram_structs)).alias("p"),
        )
        .where(F.col("p").isNotNull())
        .select(
            id_col, "n_chars", F.col("p.n").alias("n"), F.col("p.gram").alias("gram")
        )
    )

    per_gram = exploded.groupBy(id_col, "n_chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rep_chars = F.when(
        F.col("cnt") >= 2, F.col("cnt") * F.length("gram")
    ).otherwise(F.lit(0))

    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(F.when(F.col("n") == n, rep_chars)).alias(f"top{n}_chars")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(F.when(F.col("n") == n, rep_chars)).alias(f"dup{n}_chars")
        )
    per_doc = per_gram.groupBy(id_col, "n_chars").agg(*aggs)

    def frac_10k(chars_col, n_chars):
        return F.when(
            n_chars > 0,
            F.floor(
                F.least(F.lit(1.0), F.coalesce(chars_col, F.lit(0)) / n_chars)
                * 10000.0
            ),
        ).otherwise(F.lit(0)).cast("long")

    out_cols = [F.col(id_col)]
    for n in top_ns:
        out_cols.append(
            frac_10k(F.col(f"top{n}_chars"), F.col("n_chars")).alias(
                f"top{n}_frac_10k"
            )
        )
    for n in dup_ns:
        out_cols.append(
            frac_10k(F.col(f"dup{n}_chars"), F.col("n_chars")).alias(
                f"dup{n}_frac_10k"
            )
        )
    stats = per_doc.select(*out_cols)

    zero_names = [f"top{n}_frac_10k" for n in top_ns] + [
        f"dup{n}_frac_10k" for n in dup_ns
    ]
    return (
        docs.select(id_col)
        .join(stats, on=id_col, how="left")
        .select(
            F.col(id_col),
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in zero_names
            ],
        )
    )
