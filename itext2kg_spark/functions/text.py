"""Text-analysis operators over a documents table — pure Catalyst expressions.

These are the training-data-pipeline additions (lang-ID heuristic, quality
scoring, token counting, fingerprinting). Every formula is deliberately
expressible 1:1 in ANSI SQL so the DuckDB oracle can verify them exactly;
ratio outputs are emitted as floor(x*10000) bigints to avoid cross-engine
rounding-mode drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword lists (shared verbatim with the SQL oracle).
STOP_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]
STOP_FR = ["le", "la", "les", "de", "des", "et", "un", "une", "est", "pour"]
STOP_ES = ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"]
STOP_DE = ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"]


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    # Known quirk, kept deliberately: trim strips only U+0020 in both Spark
    # and DuckDB, so text with trailing '\t'/'\n' counts one phantom empty
    # token — identically in the engine and the SQL oracle (the two stay in
    # lockstep; web-text inputs should be whitespace-normalized upstream,
    # e.g. via fingerprint()'s normalizer).
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(tokens_col(text))
    )


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))


def stopword_count(text: Column, stopwords: list[str]) -> Column:
    toks = tokens_col(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def _ratio10k(num: Column, den: Column) -> Column:
    """floor(10000 * num/den) as bigint; 0 when denominator is 0."""
    return F.when(den > 0, F.floor(num * 10000.0 / den)).otherwise(F.lit(0)).cast("long")


def quality_10k_col(text: Column) -> Column:
    """floor(10000 * quality) where quality = 0.5*min(1, n_tokens/100)
    + 0.3*(1 - punct_ratio) + 0.2*stop_en_ratio — the length/punctuation/
    stopword heuristic family used by web-text quality filters, as one
    deterministic scalar column (shared by text_stats and prepare_corpus)."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_punct = punct_count(text)
    n_stop = stopword_count(text, STOP_EN)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    quality = (
        0.5 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.2 * stop_ratio
    )
    return F.floor(quality * 10000.0).cast("long")


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id, n_tokens, punct_ratio_10k, stop_ratio_10k, quality_10k
    (see quality_10k_col for the formula)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_punct = punct_count(t)
    n_stop = stopword_count(t, STOP_EN)
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        _ratio10k(n_punct, n_chars).alias("punct_ratio_10k"),
        _ratio10k(n_stop, n_tok).alias("stop_ratio_10k"),
        quality_10k_col(t).alias("quality_10k"),
    )


def lang_pred_col(text: Column) -> Column:
    """Stopword-voting language heuristic with fixed priority
    en > fr > es > de, 'und' (undetermined) when no list scores > 0."""
    t = F.lower(text)
    n_en = stopword_count(t, STOP_EN)
    n_fr = stopword_count(t, STOP_FR)
    n_es = stopword_count(t, STOP_ES)
    n_de = stopword_count(t, STOP_DE)
    best = F.greatest(n_en, n_fr, n_es, n_de)
    return (
        F.when(best == 0, F.lit("und"))
        .when(n_en == best, F.lit("en"))
        .when(n_fr == best, F.lit("fr"))
        .when(n_es == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id, lang_pred (see lang_pred_col)."""
    return docs.select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("lang_pred")
    )


def fingerprint_col(text: Column) -> Column:
    """md5 of whitespace-normalized lowercased text — the cheap content
    fingerprint used for exact-dedup keys."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id, fp (see fingerprint_col)."""
    return docs.select(
        F.col(id_col), fingerprint_col(F.col(text_col)).alias("fp")
    )


# GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead, so the
# DuckDB oracle's regexp_extract_all tokenizes identically — both engines
# are leftmost-first over the same alternation order). Pieces: contraction
# suffixes, optionally-space-prefixed letter runs / digit runs / symbol
# runs, then residual whitespace runs.
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf:
    (doc_id, term, rank, score) with idf = ln(N / df) (un-smoothed: a term
    in every document scores exactly 0), score = round(tf * idf, 9), rank
    ordered by (score DESC, term ASC). Tokens shorter than `min_token_len`
    are dropped (the cheap stopword proxy shared with the SQL oracle).

    Shape: one explode + one (doc, term) groupBy with map-side combine, a
    df groupBy over the distinct (doc, term) pairs (ReusedExchange with
    the tf aggregation), a one-row broadcast for N, and a per-doc window
    top-k. Linear in corpus token count."""
    from pyspark.sql import Window

    terms = (
        docs.select(
            F.col(id_col),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
        )
        .where(F.length("term") >= min_token_len)
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 9
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", "score")
    )


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokenizer pieces (whitespace runs excluded) —
    the standard proxy for LLM token cost over a web-text corpus."""
    pieces = F.regexp_extract_all(text, F.lit(f"({BPE_PIECE_RE})"), 1)
    # rlike \S, not trim != '': SQL trim strips only U+0020, so a tab/newline
    # run would count as a piece (and Python .strip() would disagree)
    return F.size(F.filter(pieces, lambda p: p.rlike(r"\S")))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """doc_id, n_ws_tokens, n_bpe_pieces, chars_per_piece_10k.

    Whitespace tokens and BPE-ish pre-tokenizer pieces side by side;
    chars_per_piece ~ the compression ratio LLM-cost estimators use."""
    t = F.col(text_col)
    n_ws = token_count(t)
    n_bpe = bpe_token_count(t)
    return docs.select(
        F.col(id_col),
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_pieces"),
        _ratio10k(F.length(t), n_bpe).alias("chars_per_piece_10k"),
    )
