"""Distributed BPE vocabulary induction — tokenizer training as DataFrame
algebra (Sennrich et al. 2016, the word-frequency-table formulation).

The scalable decomposition: BPE statistics depend only on the corpus'
(word, frequency) table, so the corpus-sized work is ONE groupBy(word)
— after that, every merge iteration runs over the distinct-word table
(|vocab| rows, not |tokens|):

  iteration k:  adjacent symbol pairs exploded from the word table,
                weighted by word frequency -> groupBy(pair) sum ->
                argmax (count desc, pair asc — the deterministic
                tie-break) -> the merge applied to every word's symbol
                array by a greedy left-to-right aggregate fold.

Each iteration localCheckpoints the word table (same reason as
functions/pagerank.py: truncate the doubling plan). The per-iteration
driver traffic is ONE row (the argmax pair). The fold is an
F.aggregate with a (out, pending) struct accumulator — interpreted
higher-order lambdas, acceptable here because they run over the word
VOCAB; the corpus-sized path stays codegen.

Greedy-left-to-right semantics (pinned by the reference-parity test):
scanning a word's symbols once, a pair consumed by a merge does not
re-merge with the following symbol in the same iteration — 'aaa' under
merge (a,a) becomes ('aa','a').

bpe_segment applies a learned merge list to new text with the same
fold, k sequential array passes per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.functions.text import tokens_col

EOW = "</w>"


def _word_symbols(word: Column) -> Column:
    # character split + the end-of-word marker as its own symbol; the
    # (?!^) lookahead also matches at end-of-string, so the trailing
    # empty element is dropped
    return F.concat(
        F.array_remove(F.split(word, "(?!^)"), ""), F.array(F.lit(EOW))
    )


def _apply_merge(symbols: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b."""
    merged = F.lit(a + b)
    state = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        take = (acc["pend"] == F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(merged)))
            .when(acc["pend"].isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(acc["pend"])))
            .alias("out"),
            F.when(take, F.lit(None).cast("string")).otherwise(s).alias("pend"),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(symbols, state, step, finish)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols) — the only corpus-sized pass."""
    words = docs.select(
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq")).select(
        "word", "freq", _word_symbols(F.col("word")).alias("symbols")
    )


def bpe_train(
    docs: DataFrame, k: int = 10, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn k merges; returns (merges, final word table with segmented
    symbols). Deterministic: ties break on the lexicographically
    smallest pair."""
    wf = word_freqs(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pairs = wf.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        ).where(F.size("symbols") >= 2)
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        wf = wf.withColumn(
            "symbols", _apply_merge(F.col("symbols"), a, b)
        ).localCheckpoint(eager=True)
    return merges, wf


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc_id, n_pieces, pieces — documents segmented with a learned
    merge list (k sequential greedy folds per word)."""
    toks = tokens_col(F.lower(F.col(text_col)))
    words = docs.select(
        F.col(id_col), F.posexplode(toks).alias("word_pos", "word")
    ).where(F.col("word") != "")
    sym = _word_symbols(F.col("word"))
    for a, b in merges:
        sym = _apply_merge(sym, a, b)
    per_word = words.select(id_col, "word_pos", sym.alias("sym"))
    return per_word.groupBy(id_col).agg(
        F.sum(F.size("sym")).cast("long").alias("n_pieces"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("word_pos", "sym"))
                    ),
                    lambda s: s["sym"],
                )
            ),
            " ",
        ).alias("pieces"),
    )
