"""Cross-document duplicated-span removal (dedup/spans.py).

Covers the keeper contract (min doc_id retains its copy), coverage-mask
correctness for overlapping/adjacent duplicated windows, pass-through for
unique documents, degenerate inputs, and an invariant property: after one
span_dedup pass, no k-gram is shared between two NON-keeper survivors'
cleaned texts that wasn't re-created by splicing (checked on splice-free
constructions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from itext2kg_spark.dedup.spans import (
    duplicated_span_starts,
    positional_ngrams,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_keeper_keeps_nonkeeper_loses(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly k=8
    docs = _docs(
        spark,
        [
            (1, f"{shared} unique one tail"),
            (2, f"other prefix {shared} different tail two"),
            (3, "entirely unrelated words appear in this document body"),
        ],
    )
    out = _collect(span_dedup(docs, k=8))
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"].startswith(shared)
    assert out[2]["n_removed"] == 8
    assert shared not in out[2]["clean_text"]
    assert out[2]["clean_text"] == "other prefix different tail two"
    assert out[3]["n_removed"] == 0


def test_exact_duplicate_doc_empties(spark):
    text = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [(10, text), (20, text)])
    out = _collect(span_dedup(docs, k=8))
    assert out[10]["clean_text"] == text
    assert out[20]["clean_text"] == ""
    assert out[20]["n_removed"] == out[20]["n_tokens"] == 10


def test_long_shared_span_fully_covered(spark):
    # a 12-token shared span yields 5 duplicated 8-windows whose union
    # covers all 12 tokens in the non-keeper — the k-gram-chain property
    span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    docs = _docs(
        spark,
        [(1, f"{span} keeperside"), (2, f"pre1 pre2 {span} post1")],
    )
    out = _collect(span_dedup(docs, k=8))
    assert out[2]["clean_text"] == "pre1 pre2 post1"
    assert out[2]["n_removed"] == 12


def test_degenerate_inputs(spark):
    docs = _docs(
        spark,
        [(1, ""), (2, "   "), (3, "short doc"), (4, "short doc")],
    )
    out = _collect(span_dedup(docs, k=8))
    for i in (1, 2):
        assert out[i]["n_tokens"] == 0 and out[i]["clean_text"] == ""
    # docs 3/4 duplicate each other but are shorter than k: no window exists
    assert out[3]["n_removed"] == 0 and out[4]["n_removed"] == 0
    assert out[4]["clean_text"] == "short doc"


def test_positional_ngrams_positions(spark):
    docs = _docs(spark, [(1, " a b c d ")])
    rows = sorted(
        (r["pos"], r["gram"])
        for r in positional_ngrams(docs, 3).collect()
    )
    assert rows == [(0, "a b c"), (1, "b c d")]


def test_duplicated_starts_only_nonkeepers(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(
        spark,
        [(5, f"{shared} five"), (6, f"{shared} six"), (7, f"{shared} seven")],
    )
    starts = [
        (r["id"], r["pos"]) for r in duplicated_span_starts(docs, 8).collect()
    ]
    # doc 5 is keeper for the shared window; 6 and 7 each lose position 0
    assert sorted(starts) == [(6, 0), (7, 0)]


def test_no_cross_doc_duplicate_after_pass(spark):
    # splice-free construction: unique filler between shared spans, so one
    # pass must leave no duplicated k-gram between distinct surviving docs
    shared_a = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    shared_b = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    rows = [
        (1, f"{shared_a} u11 u12 u13 {shared_b}"),
        (2, f"u21 {shared_a} u22 u23 u24 u25"),
        (3, f"u31 u32 {shared_b} u33 u34 u35"),
        (4, "u41 u42 u43 u44 u45 u46 u47 u48 u49"),
    ]
    docs = _docs(spark, rows)
    cleaned = span_dedup(docs, k=8).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    again = duplicated_span_starts(cleaned, 8, id_col="doc_id")
    assert again.count() == 0


def test_whitespace_normalization_contract(spark):
    # tokenization splits on any whitespace run; clean_text re-joins with
    # single spaces even for untouched documents
    docs = _docs(spark, [(1, "  a   b\tc  ")])
    out = _collect(span_dedup(docs, k=8))
    assert out[1]["clean_text"] == "a b c"
    assert out[1]["n_tokens"] == 3


def test_input_with_reserved_id_column(spark):
    """ADVICE r5: an input that already carries a column named 'id' (while
    id_col='doc_id') must neither make the join ambiguous nor lose the
    user's column."""
    docs = spark.createDataFrame(
        [(0, 99, "w0 w1 w2 w3 w4 w5 w6 w7 tail zero"),
         (1, 98, "w0 w1 w2 w3 w4 w5 w6 w7 tail one")],
        "doc_id long, id long, text string",
    )
    rows = _collect(span_dedup(docs, k=8))
    assert rows[0]["n_removed"] == 0          # keeper
    # shared 8-grams start at positions 0 AND 1 ("w1..w7 tail"), covering
    # tokens 0..8 -> 9 removed
    assert rows[1]["n_removed"] == 9
    assert rows[1]["clean_text"] == "one"
