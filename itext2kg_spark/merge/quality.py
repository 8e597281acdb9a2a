"""Quintuple-quality, stability, and exhaustivity evaluation (the
reference's three remaining evaluation surfaces) as Spark operators.

Reference semantics reproduced:
  * quality — evaluation/quintuples_quality/calculate_quintuples_quality.py
    :92-301 (`calculate_comprehensive_metrics`): embed "head rel tail", all
    pairs with cosine > threshold sorted by similarity (stable, so ties keep
    (pred_idx, gold_idx) enumeration order), greedy one-to-one selection,
    then each match classified into exactly one temporal category
    (MATCH_t > OM_t > HALL_t > residual OM_t) with MATCH/HALL/OM counts.
  * stability — evaluation/stability/calculate_stability_jaccard.py:209-358
    (`find_bidirectional_matches_jaccard` + `calculate_row_stability_jaccard`):
    mutual-best (argmax both directions, > threshold) matching validated by
    temporal similarity, Jaccard = |matched| / (|run1| + |run2| - |matched|).
  * exhaustivity — evaluation/exhaustivity/plot_exhaustivity_quintuples.py
    :109-204 (`find_matches_quintuples_optimized`): per-predicted argmax
    > threshold marks the gold index matched; recall = |unique gold matched|
    / |gold|, recall_t additionally requires t_start AND t_end similarity.

Shared temporal logic (all three scripts define it identically):
`is_empty_temporal` treats None/''/'none' as empty (note: an empty LIST is
NOT empty under this test — str([]) == '[]'); `temporal_similar` parses both
sides (the reference uses `dateparser.parse`; this engine uses dateutil with
the same parse-or-None contract — the parity tests shim `dateparser` with
this very function so both systems share one parser) and compares calendar
dates, falling back to case-insensitive string equality when either side
fails to parse.

Spark shape: inputs are per-document quintuple tables
(doc_id, idx, head, rel, tail, t_start, t_end) — temporal columns are
STRINGS (callers stringify list-valued temporals with str(), which is
exactly what the reference's str(value) coercions see). Scoring is
embarrassingly parallel per document, so each operator is a cogrouped
applyInPandas: one hash shuffle by doc_id per side, one Arrow batch per
document, numpy cosine inside the kernel, no driver loop. Per-document
quintuple counts are small (tens), so the per-group n^2 is constant-bounded
and the operator scales linearly in document count — the 100 TB plan is
Exchange(doc_id) x2 -> FlatMapCoGroupsInPandas, nothing else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.extract.embed import hash_embed_texts

# ---------------------------------------------------------------------------
# shared temporal + cosine primitives (plain Python — reused by the pytest
# parity harness as the `dateparser` shim and the scoring oracle)
# ---------------------------------------------------------------------------


def parse_datetime(value):
    """dateutil parse-or-None. The engine-side analog of `dateparser.parse`
    as the reference's `temporal_similar` uses it (calculate_quintuples_
    quality.py:173-179): returns a datetime on success, None on any failure
    (dateparser returns None; dateutil raises — normalized here)."""
    from dateutil import parser as dparser

    if value is None:
        return None
    try:
        return dparser.parse(str(value))
    except Exception:
        return None


def is_empty_temporal(value) -> bool:
    """calculate_quintuples_quality.py:160-162 verbatim semantics."""
    return value is None or value == "" or str(value).lower() == "none"


def temporal_similar(pred_val, gold_val, parse=parse_datetime) -> bool:
    """calculate_quintuples_quality.py:164-186 semantics: empty==empty,
    empty!=non-empty, else parse both and compare .date(), else compare
    stripped lowercase strings."""
    if is_empty_temporal(pred_val) and is_empty_temporal(gold_val):
        return True
    if is_empty_temporal(pred_val) or is_empty_temporal(gold_val):
        return False
    try:
        pred_date = parse(str(pred_val).strip())
        gold_date = parse(str(gold_val).strip())
        if pred_date is not None and gold_date is not None:
            return pred_date.date() == gold_date.date()
        return str(pred_val).strip().lower() == str(gold_val).strip().lower()
    except (ValueError, TypeError, AttributeError):
        return str(pred_val).strip().lower() == str(gold_val).strip().lower()


def _cosine_matrix(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
    Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    return An @ Bn.T


def _texts(quintuples) -> list[str]:
    """quality/exhaustivity embedding text: f"{q[0]} {q[1]} {q[2]}"
    (calculate_quintuples_quality.py:136)."""
    return [f"{q[0]} {q[1]} {q[2]}" for q in quintuples]


def _temporal(q, i):
    return q[i] if len(q) > i else None


# ---------------------------------------------------------------------------
# scoring kernels (pure Python over one document's quintuple lists — the
# exact counterparts of the reference functions, minus async/LLM plumbing)
# ---------------------------------------------------------------------------


def score_quality(quintuples, gold_quintuples, embed_fn=None, threshold=0.7):
    """Greedy one-to-one quality metrics for ONE document.

    Mirrors `calculate_comprehensive_metrics` (calculate_quintuples_quality
    .py:92-301) including all three empty-input shortcuts, the stable
    similarity-descending sort, and the 4-way temporal priority chain.
    Returns the count dict (proportions are derivable and float-fragile, so
    only counts are produced here; callers compute ratios)."""
    embed = embed_fn or hash_embed_texts
    zeros = {
        "match_count": 0, "hall_count": 0, "om_count": 0,
        "match_t_count": 0, "om_t_count": 0, "hall_t_count": 0,
        "total_predicted": len(quintuples or []),
        "total_gold": len(gold_quintuples or []),
    }
    if not quintuples and not gold_quintuples:
        return zeros
    if not quintuples:  # every gold quintuple omitted — note the reference's
        # shortcut also counts them all as temporal omissions
        # (calculate_quintuples_quality.py:117-124, OM_t_count=total_gold)
        zeros["om_count"] = len(gold_quintuples)
        zeros["om_t_count"] = len(gold_quintuples)
        return zeros
    if not gold_quintuples:  # every prediction hallucinated
        zeros["hall_count"] = len(quintuples)
        return zeros

    sims = _cosine_matrix(
        embed(_texts(quintuples)), embed(_texts(gold_quintuples))
    )
    potential = []
    for i in range(len(quintuples)):
        for j in range(len(gold_quintuples)):
            if sims[i, j] > threshold:
                potential.append((i, j, sims[i, j]))
    # stable sort: ties keep (pred_idx, gold_idx) enumeration order, exactly
    # like the reference's list.sort(key=sim, reverse=True)
    potential.sort(key=lambda x: x[2], reverse=True)

    used_pred: set[int] = set()
    used_gold: set[int] = set()
    match_t = om_t = hall_t = 0
    for pi, gi, _ in potential:
        if pi in used_pred or gi in used_gold:
            continue
        used_pred.add(pi)
        used_gold.add(gi)
        p, g = quintuples[pi], gold_quintuples[gi]
        pts, pte = _temporal(p, 3), _temporal(p, 4)
        gts, gte = _temporal(g, 3), _temporal(g, 4)
        ts_ok = temporal_similar(pts, gts)
        te_ok = temporal_similar(pte, gte)
        if ts_ok and te_ok:
            match_t += 1
        elif (is_empty_temporal(pts) and not is_empty_temporal(gts)) or (
            is_empty_temporal(pte) and not is_empty_temporal(gte)
        ):
            om_t += 1
        elif (not is_empty_temporal(pts) and is_empty_temporal(gts)) or (
            not is_empty_temporal(pte) and is_empty_temporal(gte)
        ):
            hall_t += 1
        else:  # semantic match, imperfect temporal -> omission of temporal
            om_t += 1

    match = len(used_pred)
    return {
        "match_count": match,
        "hall_count": len(quintuples) - match,
        "om_count": len(gold_quintuples) - match,
        "match_t_count": match_t,
        "om_t_count": om_t,
        "hall_t_count": hall_t,
        "total_predicted": len(quintuples),
        "total_gold": len(gold_quintuples),
    }


def _stability_text(q) -> str:
    """calculate_stability_jaccard.py:106-124: None components render as ''."""
    if not q or len(q) < 3:
        return ""
    return " ".join("" if q[i] is None else str(q[i]) for i in range(3))


def score_stability(quintuples1, quintuples2, embed_fn=None, threshold=0.7):
    """Mutual-best bidirectional matching + temporal validation -> Jaccard
    for ONE row (calculate_row_stability_jaccard /
    find_bidirectional_matches_jaccard, calculate_stability_jaccard.py
    :209-358). Returns count dict + jaccard float."""
    embed = embed_fn or hash_embed_texts
    c1 = len(quintuples1 or [])
    c2 = len(quintuples2 or [])
    if c1 == 0 and c2 == 0:
        return {"count1": 0, "count2": 0, "matched_count": 0, "jaccard": 1.0}
    if c1 == 0 or c2 == 0:
        return {"count1": c1, "count2": c2, "matched_count": 0, "jaccard": 0.0}

    sims = _cosine_matrix(
        embed([_stability_text(q) for q in quintuples1]),
        embed([_stability_text(q) for q in quintuples2]),
    )
    best_1_to_2 = {}
    for i in range(c1):
        j = int(np.argmax(sims[i]))
        if sims[i, j] > threshold:
            best_1_to_2[i] = j
    best_2_to_1 = {}
    for j in range(c2):
        i = int(np.argmax(sims[:, j]))
        if sims[i, j] > threshold:
            best_2_to_1[j] = i

    matched = 0
    for i, j in best_1_to_2.items():
        if best_2_to_1.get(j) != i:
            continue
        q1, q2 = quintuples1[i], quintuples2[j]
        if temporal_similar(_temporal(q1, 3), _temporal(q2, 3)) and temporal_similar(
            _temporal(q1, 4), _temporal(q2, 4)
        ):
            matched += 1
    union = c1 + c2 - matched
    return {
        "count1": c1,
        "count2": c2,
        "matched_count": matched,
        "jaccard": (matched / union) if union else 1.0,
    }


def score_exhaustivity(quintuples, gold_quintuples, embed_fn=None, threshold=0.7):
    """Per-predicted argmax matching -> unique-gold recall / recall_t for ONE
    document (find_matches_quintuples_optimized,
    plot_exhaustivity_quintuples.py:109-204). Returns count dict."""
    embed = embed_fn or hash_embed_texts
    tp = len(quintuples or [])
    tg = len(gold_quintuples or [])
    if tp == 0 or tg == 0:
        return {
            "total_predicted": tp, "total_gold": tg,
            "matched_gold": 0, "matched_gold_t": 0,
        }
    sims = _cosine_matrix(
        embed(_texts(quintuples)), embed(_texts(gold_quintuples))
    )
    matched: set[int] = set()
    matched_t: set[int] = set()
    for i, q in enumerate(quintuples):
        j = int(np.argmax(sims[i]))
        if sims[i, j] > threshold:
            matched.add(j)
            g = gold_quintuples[j]
            if temporal_similar(_temporal(q, 3), _temporal(g, 3)) and temporal_similar(
                _temporal(q, 4), _temporal(g, 4)
            ):
                matched_t.add(j)
    return {
        "total_predicted": tp,
        "total_gold": tg,
        "matched_gold": len(matched),
        "matched_gold_t": len(matched_t),
    }


# ---------------------------------------------------------------------------
# Spark operators: cogrouped applyInPandas, one Arrow group per document
# ---------------------------------------------------------------------------

_QUINT_COLS = ["idx", "head", "rel", "tail", "t_start", "t_end"]

QUALITY_SCHEMA = (
    "doc_id long, total_pred long, total_gold long, "
    "match_count long, hall_count long, om_count long, "
    "match_t_count long, om_t_count long, hall_t_count long"
)

STABILITY_SCHEMA = (
    "doc_id long, count1 long, count2 long, matched_count long, jaccard double"
)

EXHAUSTIVITY_SCHEMA = (
    "doc_id long, total_pred long, total_gold long, "
    "matched_gold long, matched_gold_t long"
)


def _tuples(pdf: pd.DataFrame) -> list[tuple]:
    """One document's quintuples in idx order (group row order after the
    shuffle is nondeterministic; the reference consumes lists in document
    order, so the explicit idx restores it)."""
    if pdf.empty:
        return []
    pdf = pdf.sort_values("idx", kind="stable")
    # Arrow nulls can surface as NaN in object columns; the reference's
    # missing temporal is None (is_empty_temporal(None) is True, NaN is not)
    pdf = pdf.where(pd.notnull(pdf), None)
    return list(
        zip(pdf["head"], pdf["rel"], pdf["tail"], pdf["t_start"], pdf["t_end"])
    )


def _doc_id(key, left: pd.DataFrame, right: pd.DataFrame) -> int:
    if key:
        return int(key[0])
    src = left if not left.empty else right
    return int(src["doc_id"].iloc[0])


def _cogroup(pred_df: DataFrame, gold_df: DataFrame):
    cols = ["doc_id"] + _QUINT_COLS

    def fresh(df: DataFrame) -> DataFrame:
        # mint NEW attribute ids per side: when both inputs share lineage
        # (e.g. pred derived from gold), Catalyst's cogroup attribute dedup
        # can silently DROP the right child's duplicate-exprId columns under
        # a downstream projection, handing the kernel a pdf missing columns
        return df.select(*[F.col(c).alias(c) for c in cols])

    return fresh(pred_df).groupBy("doc_id").cogroup(
        fresh(gold_df).groupBy("doc_id")
    )


def quintuple_quality(
    pred_df: DataFrame,
    gold_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-document greedy one-to-one quality metrics (MATCH/HALL/OM + the
    temporal split). Inputs: (doc_id, idx, head, rel, tail, t_start, t_end)
    with string temporal columns."""

    def kernel(key, pred: pd.DataFrame, gold: pd.DataFrame) -> pd.DataFrame:
        doc = _doc_id(key, pred, gold)
        m = score_quality(_tuples(pred), _tuples(gold), embed_fn, threshold)
        return pd.DataFrame(
            [
                {
                    "doc_id": doc,
                    "total_pred": m["total_predicted"],
                    "total_gold": m["total_gold"],
                    "match_count": m["match_count"],
                    "hall_count": m["hall_count"],
                    "om_count": m["om_count"],
                    "match_t_count": m["match_t_count"],
                    "om_t_count": m["om_t_count"],
                    "hall_t_count": m["hall_t_count"],
                }
            ]
        )

    return _cogroup(pred_df, gold_df).applyInPandas(kernel, QUALITY_SCHEMA)


def quality_summary(quality_df: DataFrame) -> DataFrame:
    """Corpus-level summary of per-document quality metrics — the
    reference's `calculate_summary_statistics` (calculate_quintuples_quality
    .py:437-484): mean and POPULATION std (np.std, ddof=0) of each per-row
    proportion, totals of each count, n_samples. Per-row proportions follow
    :277-284 (MATCH/OM and all temporal variants over total_gold, HALL over
    total_predicted, 0.0 when the denominator is 0 — which also reproduces
    the empty-input shortcut rows). One wide-agg Spark job; comparing two
    extraction variants (the reference's case1 vs case2, its headline ~31%
    factual-exhaustivity claim) is two calls to this over two pred tables."""
    tg = F.col("total_gold").cast("double")
    tp = F.col("total_pred").cast("double")

    def ratio(num, den):
        return F.when(den > 0, F.col(num) / den).otherwise(F.lit(0.0))

    props = {
        "MATCH": ratio("match_count", tg),
        "HALL": ratio("hall_count", tp),
        "OM": ratio("om_count", tg),
        "MATCH_t": ratio("match_t_count", tg),
        "OM_t": ratio("om_t_count", tg),
        "HALL_t": ratio("hall_t_count", tg),
    }
    counts = [
        "match_count", "hall_count", "om_count",
        "match_t_count", "om_t_count", "hall_t_count",
        "total_pred", "total_gold",
    ]
    aggs = []
    for name, expr in props.items():
        aggs.append(F.avg(expr).alias(f"{name}_mean"))
        aggs.append(F.stddev_pop(expr).alias(f"{name}_std"))
    aggs += [F.sum(c).alias(f"{c}_total") for c in counts]
    aggs.append(F.count("*").alias("n_samples"))
    return quality_df.agg(*aggs)


def quintuple_stability(
    run1_df: DataFrame,
    run2_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-document mutual-best Jaccard stability between two runs."""

    def kernel(key, q1: pd.DataFrame, q2: pd.DataFrame) -> pd.DataFrame:
        doc = _doc_id(key, q1, q2)
        m = score_stability(_tuples(q1), _tuples(q2), embed_fn, threshold)
        return pd.DataFrame(
            [
                {
                    "doc_id": doc,
                    "count1": m["count1"],
                    "count2": m["count2"],
                    "matched_count": m["matched_count"],
                    "jaccard": m["jaccard"],
                }
            ]
        )

    return _cogroup(run1_df, run2_df).applyInPandas(kernel, STABILITY_SCHEMA)


def quintuple_exhaustivity(
    pred_df: DataFrame,
    gold_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-document argmax recall / recall_t counts vs gold."""

    def kernel(key, pred: pd.DataFrame, gold: pd.DataFrame) -> pd.DataFrame:
        doc = _doc_id(key, pred, gold)
        m = score_exhaustivity(_tuples(pred), _tuples(gold), embed_fn, threshold)
        return pd.DataFrame(
            [
                {
                    "doc_id": doc,
                    "total_pred": m["total_predicted"],
                    "total_gold": m["total_gold"],
                    "matched_gold": m["matched_gold"],
                    "matched_gold_t": m["matched_gold_t"],
                }
            ]
        )

    return _cogroup(pred_df, gold_df).applyInPandas(kernel, EXHAUSTIVITY_SCHEMA)
