"""DSIR importance resampling (functions/dsir.py) and token-budgeted
corpus mixing (functions/sampling.py token_budget_mix)."""

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from itext2kg_spark.functions.dsir import dsir_select, dsir_weights, gumbel_key
from itext2kg_spark.functions.sampling import token_budget_mix

TWO60_PLUS_1 = float((1 << 60) + 1)


def _grams(text):
    toks = text.strip().lower().split()
    if not text.strip():
        return []
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram, n_buckets, salt="dsir-v1"):
    return int(hashlib.md5(f"{salt}:{gram}".encode()).hexdigest()[:15], 16) % n_buckets


def _py_weights(raw, target, n_buckets, alpha=1.0):
    """Reference implementation: returns {doc_id: (n_grams, weight)}."""
    tcounts, rcounts = {}, {}
    for _i, text in target:
        for g in _grams(text):
            b = _bucket(g, n_buckets)
            tcounts[b] = tcounts.get(b, 0) + 1
    doc_bc = {}
    for i, text in raw:
        for g in _grams(text):
            b = _bucket(g, n_buckets)
            doc_bc.setdefault(i, {})
            doc_bc[i][b] = doc_bc[i].get(b, 0) + 1
            rcounts[b] = rcounts.get(b, 0) + 1
    T, R = sum(tcounts.values()), sum(rcounts.values())
    # integer-nanos quantization, mirroring functions/dsir.py exactly
    floor_n = round(math.log(alpha / (T + alpha * n_buckets)) * 1e9)

    def lt_n(b):
        if b in tcounts:
            return round(math.log((tcounts[b] + alpha) / (T + alpha * n_buckets)) * 1e9)
        return floor_n

    def lr_n(b):
        return round(math.log((rcounts[b] + alpha) / (R + alpha * n_buckets)) * 1e9)

    out = {}
    for i, bc in doc_bc.items():
        w_n = sum(c * (lt_n(b) - lr_n(b)) for b, c in bc.items())
        out[i] = (sum(bc.values()), float(w_n) / 1e9)
    return out


def _py_gumbel(doc_id, salt="gumbel-v1"):
    h = float(int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16))
    u = (h + 1.0) / TWO60_PLUS_1
    return round(-math.log(-math.log(u)), 6)


RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices fell sharply today"),
    (2, "the dog sat on the log"),
    (3, "quantum mechanics of the hydrogen atom"),
    (4, "cat mat cat mat cat mat"),
    (5, ""),
]
TARGET = [
    (100, "the cat sat on the mat quietly"),
    (101, "a cat and a mat and a hat"),
]


def test_dsir_weights_match_reference(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["weight"])
        for r in dsir_weights(raw, target, n_buckets=64).collect()
    }
    want = _py_weights(RAW, TARGET, 64)
    assert set(got) == set(want)  # the empty doc has no grams, no row
    for i in want:
        assert got[i][0] == want[i][0]
        # exact integer-nano arithmetic: tolerance only covers a possible
        # half-up-vs-bankers tie in the one-shot nano quantization
        assert got[i][1] == pytest.approx(want[i][1], abs=3e-9)


def test_dsir_target_lookalikes_score_higher(spark):
    """Documents sharing the target's vocabulary must outrank the
    off-distribution ones — the operator's entire reason to exist."""
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = {r["doc_id"]: r["weight"] for r in dsir_weights(raw, target, n_buckets=64).collect()}
    # doc 0 shares the target's unigrams AND bigrams; finance (1) and
    # physics (3) share almost nothing. Doc 4 ("cat mat" repeated) is NOT
    # expected to rank high: its bigrams never occur in the target, so the
    # sum-of-log-ratios correctly piles floor penalties on it — a nice
    # property (DSIR resists degenerate keyword-stuffing pages).
    assert w[0] > max(w[1], w[3])
    assert w[0] > w[4]


def test_dsir_select_topk_deterministic(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    sel = dsir_select(raw, target, k=3, n_buckets=64)
    rows = sel.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["gumbel"] == pytest.approx(_py_gumbel(r["doc_id"]), abs=2e-6)
        assert r["score"] == pytest.approx(r["weight"] + r["gumbel"], abs=2e-6)
    # deterministic across re-runs, scores descending
    again = sel.collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in rows]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_gumbel_key_is_pinned_to_hashlib(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), gumbel_key(F.col("id")).alias("g")
    )
    for r in df.collect():
        assert r["g"] == pytest.approx(_py_gumbel(r["doc_id"]), abs=2e-6)


def test_token_budget_mix_matches_naive_window(spark):
    """Two-phase per-stratum running total == plain per-stratum window,
    and kept is exactly cum <= budget."""
    rows = [
        (i, f"s{i % 3}", " ".join(["tok"] * ((i * 7) % 11 + 1)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["stratum"], r["n_tokens"], r["cum_tokens"], r["kept"])
        for r in token_budget_mix(
            docs, budgets={"s0": 150, "s1": 80}, default_budget=100
        ).collect()
    }
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("mix-order-v1"), F.col("doc_id").cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    naive = docs.select(
        "doc_id",
        F.col("source").alias("stratum"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        h.alias("h"),
    ).withColumn(
        "cum",
        F.sum("n_tokens").over(
            Window.partitionBy("stratum")
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    budgets = {"s0": 150, "s1": 80, "s2": 100}
    want = {
        r["doc_id"]: (
            r["stratum"], r["n_tokens"], r["cum"], r["cum"] <= budgets[r["stratum"]]
        )
        for r in naive.collect()
    }
    assert got == want
    # every stratum's kept set respects its budget and is non-trivial
    for s, b in budgets.items():
        kept_tok = sum(v[1] for v in got.values() if v[0] == s and v[3])
        assert 0 < kept_tok <= b


def test_token_budget_mix_deterministic_and_budget_zero(spark):
    docs = spark.createDataFrame(
        [(i, "only", "a b c") for i in range(20)],
        "doc_id long, source string, text string",
    )
    out = token_budget_mix(docs, budgets={}, default_budget=0)
    assert out.where(F.col("kept")).count() == 0
    out2 = token_budget_mix(docs, budgets={"only": 9}, default_budget=0)
    kept = sorted(r["doc_id"] for r in out2.where(F.col("kept")).collect())
    assert len(kept) == 3  # 3 docs x 3 tokens == budget exactly
    assert kept == sorted(
        r["doc_id"] for r in out2.where(F.col("kept")).collect()
    )  # replay
