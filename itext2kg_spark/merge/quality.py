"""Quintuple-quality, stability, and exhaustivity evaluation (the
reference's evaluation surfaces) as Spark operators.

Reference semantics reproduced:
  * quality — evaluation/quintuples_quality/calculate_quintuples_quality.py
    :92-301 (`calculate_comprehensive_metrics`): embed "head rel tail", all
    pairs with cosine > threshold sorted by similarity (stable, so ties keep
    (pred_idx, gold_idx) enumeration order), greedy one-to-one selection,
    then each match classified into exactly one temporal category
    (MATCH_t > OM_t > HALL_t > residual OM_t) with MATCH/HALL/OM counts.
  * stability (Jaccard) — evaluation/stability/calculate_stability_jaccard.py
    :209-358 (`find_bidirectional_matches_jaccard` +
    `calculate_row_stability_jaccard`): mutual-best (argmax both directions,
    > threshold) matching validated by temporal similarity,
    Jaccard = |matched| / (|run1| + |run2| - |matched|).
  * stability (row / avg-max) — evaluation/stability/calculate_stability.py
    :83-261 (`format_quintuple_text` + `calculate_row_stability`): the older
    thresholdless variant — embed "{s} {p} {o} {t_start}-{t_end}" per
    quintuple, similarity = mean over run1 rows of the row-max cosine, plus
    the full-matrix mean; empty-side shortcuts return 1.0/0.0 with a
    comparison_type tag.
  * exhaustivity (quintuples) — evaluation/exhaustivity/
    plot_exhaustivity_quintuples.py:109-204
    (`find_matches_quintuples_optimized`): per-predicted argmax
    > threshold marks the gold index matched; recall = |unique gold matched|
    / |gold|, recall_t additionally requires t_start AND t_end similarity.
  * exhaustivity (factoids) — evaluation/exhaustivity/
    plot_exhaustivity_factoids.py:242-364 (`find_matches_factoids_optimized`
    with its inner `extract_temporal_info_from_text` :263-290 and
    `temporal_lists_overlap` :323-338): factoids are free-text strings; the
    same per-predicted argmax marks gold factoids matched, and recall_t
    requires the date SETS mined from the two texts (every <=10-word phrase
    run through the parser) to overlap (both-empty counts as overlap).

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
embarrassingly parallel per document, so each operator packs both sides
into per-document struct arrays (partial-agg collect_list), full-outer
joins them on doc_id, and scores through mapInPandas — one Python/Arrow
invocation per ~10k documents with the per-document loop inside the batch
(see _grouped_eval for why this beats cogrouped applyInPandas ~8x).
Per-document quintuple counts are small (tens), so the per-doc n^2 is
constant-bounded and the operator scales linearly in document count — the
100 TB plan is two hash partial aggs + one doc_id equi-join +
MapInPandas, nothing else.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.extract.embed import hash_embed_texts

# ---------------------------------------------------------------------------
# shared temporal + cosine primitives (plain Python — reused by the pytest
# parity harness as the `dateparser` shim and the scoring oracle)
# ---------------------------------------------------------------------------


#: Fixed anchor for partially-specified dates: missing components (day,
#: month) resolve against 2020-01-01 instead of "now", so "June 2020" parses
#: to 2020-06-01 on every host on every day — the analog of dateparser's
#: PREFER_DAY_OF_MONTH='first' setting the factoid-exhaustivity reference
#: passes (plot_exhaustivity_factoids.py:276), and a determinism requirement
#: for the oracle queries.
_DEFAULT_ANCHOR = None  # set lazily (datetime import kept out of hot path)

_DATEPARSER = None  # lazily resolved: the real `dateparser` module, or False


def _dateparser_mod():
    global _DATEPARSER
    if _DATEPARSER is None:
        try:
            import dateparser as _dp

            # the pytest parity harness shims `dateparser` WITH this
            # module's parse_datetime (tests/ref_loader.py) — treating the
            # shim as the real parser would recurse; only a genuine
            # dateparser counts
            if getattr(_dp, "__spark_graft_shim__", False) or (
                getattr(_dp.parse, "__module__", "") == __name__
            ):
                _DATEPARSER = False
            else:
                _DATEPARSER = _dp
        except Exception:  # noqa: BLE001 — absent in this container
            _DATEPARSER = False
    return _DATEPARSER or None


def parse_datetime(value, settings=None):
    """Parse-or-None with the reference's parser when available.

    The reference mines dates with `dateparser.parse(phrase,
    settings={'PREFER_DAY_OF_MONTH': 'first'})`
    (plot_exhaustivity_factoids.py:276) and `temporal_similar` parses
    quintuple fields the same way (calculate_quintuples_quality.py:173-179).
    When the real `dateparser` is importable it is used first, with the
    caller's settings plus PREFER_DAY_OF_MONTH='first' and a pinned
    RELATIVE_BASE of 2020-01-01 unless the caller overrides them.

    Documented deltas vs a stock reference run:
      * RELATIVE_BASE pinning — stock dateparser resolves relative phrases
        ("last week") and missing components against *now*; the pin trades
        that for run-to-run determinism (a hard requirement for the oracle
        queries, whose corpora use fully-specified ISO dates where the two
        behaviors agree).
      * dateutil fallback (this container has no dateparser) — for
        fully-specified dates the two parsers agree
        (tests/test_quality_eval.py fixture test bounds this); divergence
        is confined to relative/multilingual phrases dateutil rejects.
    """
    global _DEFAULT_ANCHOR
    if value is None:
        return None
    if _DEFAULT_ANCHOR is None:
        from datetime import datetime

        _DEFAULT_ANCHOR = datetime(2020, 1, 1)
    dp = _dateparser_mod()
    if dp is not None:
        merged = {
            "PREFER_DAY_OF_MONTH": "first",
            "RELATIVE_BASE": _DEFAULT_ANCHOR,
            **(settings or {}),
        }
        try:
            return dp.parse(str(value), settings=merged)
        except Exception:  # noqa: BLE001 — dateparser contract is None-on-fail
            return None
    from dateutil import parser as dparser

    try:
        return dparser.parse(str(value), default=_DEFAULT_ANCHOR)
    except Exception:  # noqa: BLE001 — normalize raise -> None
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


#: Per-document pair budget for the O(n*m) scoring kernels. Real documents
#: carry tens of quintuples/factoids (NYT golden corpus: <=78), so the
#: kernels are constant-bounded per group; a pathological document with
#: thousands of rows would silently materialize a huge cosine matrix and
#: above-threshold pair list inside one Arrow group. Exceeding the budget
#: raises loudly instead — callers with a legitimately gigantic document can
#: pass a larger `max_pairs`.
MAX_GROUP_PAIRS = 4_000_000


def _guard_pairs(n1: int, n2: int, max_pairs: int, what: str) -> None:
    if n1 * n2 > max_pairs:
        raise ValueError(
            f"{what}: one document group has {n1} x {n2} = {n1 * n2} "
            f"candidate pairs (> max_pairs={max_pairs}); per-document "
            f"scoring is quadratic by reference semantics — split the "
            f"document or raise max_pairs explicitly"
        )


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


def score_quality(quintuples, gold_quintuples, embed_fn=None, threshold=0.7,
                  max_pairs=MAX_GROUP_PAIRS):
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

    _guard_pairs(len(quintuples), len(gold_quintuples), max_pairs, "score_quality")
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


def score_stability(quintuples1, quintuples2, embed_fn=None, threshold=0.7,
                    max_pairs=MAX_GROUP_PAIRS):
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

    _guard_pairs(c1, c2, max_pairs, "score_stability")
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


def score_exhaustivity(quintuples, gold_quintuples, embed_fn=None, threshold=0.7,
                       max_pairs=MAX_GROUP_PAIRS):
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
    _guard_pairs(tp, tg, max_pairs, "score_exhaustivity")
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
# factoid exhaustivity (plot_exhaustivity_factoids.py:242-364)
# ---------------------------------------------------------------------------


#: Cheap token gate for the dateutil fallback: a phrase can only parse when
#: at least one of its tokens carries a digit or starts (after leading
#: punctuation) with a month/weekday name prefix — dateutil's grammar has no
#: other date-bearing tokens (its JUMP whitelist words are skipped, and
#: am/pm/timezone tokens never parse alone). False positives ("market"
#: matches "mar") only cost a parse attempt that fails exactly as before.
_DATEISH_TOKEN = re.compile(
    r"\d|^[^a-zA-Z]*"
    r"(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec"
    r"|mon|tue|wed|thu|fri|sat|sun)",
    re.IGNORECASE,
)


def extract_temporal_dates(text, parse=parse_datetime, prefilter=None):
    """Date mining from free text — the reference's inner
    `extract_temporal_info_from_text` (plot_exhaustivity_factoids.py:263-290):
    every whitespace phrase of 1..9 words is fed to the parser; successful
    parses contribute their calendar date; the result is the deduplicated
    list. (The reference calls `dateparser.parse(phrase,
    settings={'PREFER_DAY_OF_MONTH': 'first'})`; parse_datetime uses the
    real dateparser when importable and the dateutil shim otherwise.)

    `prefilter` gates the O(words x 10) parse loop with _DATEISH_TOKEN:
    windows containing no date-ish token are skipped without a parser call —
    identical output under the dateutil fallback, ~10x fewer parser calls on
    prose. None (default) auto-enables it ONLY when the parser is the
    dateutil fallback; with real dateparser (which parses relative and
    multilingual phrases the token gate cannot see) or a custom `parse`, the
    full loop runs."""
    if not text or not isinstance(text, str):
        return []
    try:
        dates = []
        words = text.split()
        if prefilter is None:
            prefilter = parse is parse_datetime and _dateparser_mod() is None
        if prefilter:
            # nd[i] = first date-ish token index >= i (len(words) if none):
            # the window words[i:j] is attempted iff nd[i] < j
            nd = [len(words)] * (len(words) + 1)
            for k in range(len(words) - 1, -1, -1):
                nd[k] = k if _DATEISH_TOKEN.search(words[k]) else nd[k + 1]
        for i in range(len(words)):
            for j in range(i + 1, min(i + 10, len(words) + 1)):
                if prefilter and nd[i] >= j:
                    continue
                phrase = " ".join(words[i:j])
                try:
                    parsed = parse(phrase)
                    if parsed:
                        dates.append(parsed.date())
                except (ValueError, TypeError, AttributeError):
                    continue
        return list(set(dates))
    except Exception:
        return []


def temporal_lists_overlap(pred_dates, gold_dates) -> bool:
    """plot_exhaustivity_factoids.py:323-338: both-empty -> True, one-empty
    -> False, else any exact date equality."""
    if not pred_dates and not gold_dates:
        return True
    if not pred_dates or not gold_dates:
        return False
    for pred_date in pred_dates:
        for gold_date in gold_dates:
            if pred_date == gold_date:
                return True
    return False


def score_factoid_exhaustivity(
    factoids,
    gold_factoids,
    embed_fn=None,
    threshold=0.7,
    parse=parse_datetime,
    max_pairs=MAX_GROUP_PAIRS,
):
    """Per-predicted argmax matching over factoid TEXTS -> unique-gold
    recall / recall_t counts for ONE document
    (`find_matches_factoids_optimized`, plot_exhaustivity_factoids.py
    :242-364). recall_t validates by overlap of the date sets mined from the
    matched texts rather than by quintuple temporal fields. Returns counts;
    the reference's empty-input shortcut (recall = recall_t = 0.0) falls out
    of matched counts being 0."""
    embed = embed_fn or hash_embed_texts
    tp = len(factoids or [])
    tg = len(gold_factoids or [])
    if tp == 0 or tg == 0:
        return {
            "total_pred": tp, "total_gold": tg,
            "matched_gold": 0, "matched_gold_t": 0,
        }
    _guard_pairs(tp, tg, max_pairs, "score_factoid_exhaustivity")
    # the reference embeds str(f) but mines dates from the RAW item (non-str
    # items mine to []) — preserved exactly
    sims = _cosine_matrix(
        embed([str(f) for f in factoids]),
        embed([str(gf) for gf in gold_factoids]),
    )
    matched: set[int] = set()
    matched_t: set[int] = set()
    for i, factoid in enumerate(factoids):
        j = int(np.argmax(sims[i]))
        if sims[i, j] > threshold:
            matched.add(j)
            pred_dates = extract_temporal_dates(factoid, parse)
            gold_dates = extract_temporal_dates(gold_factoids[j], parse)
            if temporal_lists_overlap(pred_dates, gold_dates):
                matched_t.add(j)
    return {
        "total_pred": tp,
        "total_gold": tg,
        "matched_gold": len(matched),
        "matched_gold_t": len(matched_t),
    }


# ---------------------------------------------------------------------------
# row stability, non-Jaccard variant (calculate_stability.py:83-261)
# ---------------------------------------------------------------------------


def format_quintuple_text(q) -> str:
    """calculate_stability.py:83-113 semantics: "{s} {p} {o} {ts}-{te}" with
    None components rendered '', and the temporal suffix present only when
    t_start or t_end is truthy after str()-coercion of present values."""
    if not q or len(q) < 3:
        return ""
    subject = str(q[0]) if q[0] is not None else ""
    predicate = str(q[1]) if q[1] is not None else ""
    obj = str(q[2]) if q[2] is not None else ""
    t_start = str(q[3]) if len(q) > 3 and q[3] is not None else ""
    t_end = str(q[4]) if len(q) > 4 and q[4] is not None else ""
    temporal = f"{t_start}-{t_end}" if (t_start or t_end) else ""
    if temporal:
        return f"{subject} {predicate} {obj} {temporal}"
    return f"{subject} {predicate} {obj}"


def score_row_stability(quintuples1, quintuples2, embed_fn=None,
                        max_pairs=MAX_GROUP_PAIRS):
    """Thresholdless avg-max-cosine stability for ONE row
    (`calculate_row_stability`, calculate_stability.py:197-261): embeddings
    are computed over the NON-EMPTY formatted texts only
    (calculate_quintuple_embeddings:149-153 filters before embedding, while
    count1/count2 keep the raw list lengths), similarity is the mean of
    per-row-of-set1 max cosines, overall_mean the full-matrix mean."""
    embed = embed_fn or hash_embed_texts
    c1 = len(quintuples1 or [])
    c2 = len(quintuples2 or [])
    if c1 == 0 and c2 == 0:
        return {"count1": 0, "count2": 0, "similarity": 1.0,
                "overall_mean": 0.0, "comparison_type": "both_empty"}
    if c1 == 0 or c2 == 0:
        return {"count1": c1, "count2": c2, "similarity": 0.0,
                "overall_mean": 0.0, "comparison_type": "one_empty"}
    texts1 = [t for t in (format_quintuple_text(q) for q in quintuples1) if t.strip()]
    texts2 = [t for t in (format_quintuple_text(q) for q in quintuples2) if t.strip()]
    if not texts1 or not texts2:
        return {"count1": c1, "count2": c2, "similarity": 0.0,
                "overall_mean": 0.0, "comparison_type": "no_embeddings"}
    _guard_pairs(len(texts1), len(texts2), max_pairs, "score_row_stability")
    sims = _cosine_matrix(embed(texts1), embed(texts2))
    max_similarities = sims.max(axis=1)
    return {
        "count1": c1,
        "count2": c2,
        "similarity": float(np.mean(max_similarities)),
        "overall_mean": float(np.mean(sims)),
        "comparison_type": "full_comparison",
    }


# ---------------------------------------------------------------------------
# Spark operators: packed-array join + batched mapInPandas per document
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

ROW_STABILITY_SCHEMA = (
    "doc_id long, count1 long, count2 long, "
    "similarity double, overall_mean double, comparison_type string"
)


def _tuples_from_rows(rows) -> list[tuple]:
    """One document's quintuples in idx order from the packed struct array
    (collect_list order after the shuffle is nondeterministic; the reference
    consumes lists in document order, so the explicit idx restores it).
    Arrow hands nested struct nulls through as None, which is exactly the
    reference's missing-temporal representation."""
    if rows is None or len(rows) == 0:
        return []
    return [
        (r["head"], r["rel"], r["tail"], r["t_start"], r["t_end"])
        for r in sorted(rows, key=lambda r: r["idx"])
    ]


def _texts_from_rows(rows) -> list:
    """One document's factoid texts in idx order from the packed array."""
    if rows is None or len(rows) == 0:
        return []
    return [r["text"] for r in sorted(rows, key=lambda r: r["idx"])]


def _grouped_eval(pred_df, gold_df, kernel_row, out_schema, cols=None):
    """Shared execution shape of the per-document evaluation operators:
    pack each side into ONE array-of-structs row per document (partial-agg
    collect_list), full-outer join the two packed tables on doc_id, and run
    the scoring kernel via mapInPandas — one Python/Arrow invocation per
    ~10k documents, looping documents inside the batch.

    Why not cogrouped applyInPandas (the previous shape): Spark's cogroup
    pays per-GROUP overhead (Arrow slicing + a fresh pandas DataFrame pair
    per group) measured at ~50ms/document here, ~30x the 1.6ms scoring
    kernel; with batched rows the same workload drops from 34s to ~4s for
    5k documents. The shuffle profile is equivalent at scale: two hash
    partial aggregations + one doc_id equi-join vs two cogroup exchanges —
    both linear in documents, and per-document quintuple counts are small
    (tens), so the packed rows stay tiny.

    `kernel_row(doc_id, left_rows, right_rows) -> dict` scores one document;
    left/right are the packed struct arrays (None when the side is absent).
    """
    cols = _QUINT_COLS if cols is None else cols

    def pack(df: DataFrame, name: str) -> DataFrame:
        # mint NEW attribute ids per side: when both inputs share lineage
        # (e.g. pred derived from gold), Catalyst's attribute dedup can
        # otherwise conflate the two sides' columns under the join
        fresh = df.select(*[F.col(c).alias(c) for c in ["doc_id"] + cols])
        return fresh.groupBy("doc_id").agg(
            F.collect_list(F.struct(*cols)).alias(name)
        )

    joined = pack(pred_df, "__l").join(pack(gold_df, "__r"), "doc_id", "full_outer")

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                [
                    kernel_row(int(doc), left, right)
                    for doc, left, right in zip(
                        pdf["doc_id"], pdf["__l"], pdf["__r"]
                    )
                ]
            )

    return joined.mapInPandas(run, out_schema)


def quintuple_quality(
    pred_df: DataFrame,
    gold_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-document greedy one-to-one quality metrics (MATCH/HALL/OM + the
    temporal split). Inputs: (doc_id, idx, head, rel, tail, t_start, t_end)
    with string temporal columns."""

    def kernel_row(doc, pred, gold):
        m = score_quality(
            _tuples_from_rows(pred), _tuples_from_rows(gold), embed_fn, threshold
        )
        return {
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

    return _grouped_eval(pred_df, gold_df, kernel_row, QUALITY_SCHEMA)


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

    def kernel_row(doc, q1, q2):
        m = score_stability(
            _tuples_from_rows(q1), _tuples_from_rows(q2), embed_fn, threshold
        )
        return {
            "doc_id": doc,
            "count1": m["count1"],
            "count2": m["count2"],
            "matched_count": m["matched_count"],
            "jaccard": m["jaccard"],
        }

    return _grouped_eval(run1_df, run2_df, kernel_row, STABILITY_SCHEMA)


def quintuple_exhaustivity(
    pred_df: DataFrame,
    gold_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-document argmax recall / recall_t counts vs gold."""

    def kernel_row(doc, pred, gold):
        m = score_exhaustivity(
            _tuples_from_rows(pred), _tuples_from_rows(gold), embed_fn, threshold
        )
        return {
            "doc_id": doc,
            "total_pred": m["total_predicted"],
            "total_gold": m["total_gold"],
            "matched_gold": m["matched_gold"],
            "matched_gold_t": m["matched_gold_t"],
        }

    return _grouped_eval(pred_df, gold_df, kernel_row, EXHAUSTIVITY_SCHEMA)


def factoid_exhaustivity(
    pred_df: DataFrame,
    gold_df: DataFrame,
    embed_fn=None,
    threshold: float = 0.7,
    parse=parse_datetime,
) -> DataFrame:
    """Per-document factoid recall / recall_t counts vs gold
    (plot_exhaustivity_factoids.py:242-364). Inputs: (doc_id, idx, text) —
    one row per factoid string, idx giving document order. Same batched
    grouped shape as the quintuple operators; the date mining is O(words)
    parser calls per factoid, constant-bounded per document, linear in
    documents."""

    def kernel_row(doc, pred, gold):
        m = score_factoid_exhaustivity(
            _texts_from_rows(pred), _texts_from_rows(gold), embed_fn, threshold, parse
        )
        return {
            "doc_id": doc,
            "total_pred": m["total_pred"],
            "total_gold": m["total_gold"],
            "matched_gold": m["matched_gold"],
            "matched_gold_t": m["matched_gold_t"],
        }

    return _grouped_eval(
        pred_df, gold_df, kernel_row, EXHAUSTIVITY_SCHEMA, cols=["idx", "text"]
    )


def quintuple_row_stability(
    run1_df: DataFrame,
    run2_df: DataFrame,
    embed_fn=None,
) -> DataFrame:
    """Per-document thresholdless avg-max-cosine stability between two runs
    (calculate_row_stability, calculate_stability.py:197-261) — the older
    non-Jaccard variant; `quintuple_stability` is the published Jaccard one."""

    def kernel_row(doc, q1, q2):
        m = score_row_stability(_tuples_from_rows(q1), _tuples_from_rows(q2), embed_fn)
        return {
            "doc_id": doc,
            "count1": m["count1"],
            "count2": m["count2"],
            "similarity": m["similarity"],
            "overall_mean": m["overall_mean"],
            "comparison_type": m["comparison_type"],
        }

    return _grouped_eval(run1_df, run2_df, kernel_row, ROW_STABILITY_SCHEMA)


def row_stability_summary(row_stability_df: DataFrame) -> DataFrame:
    """Corpus-level summary of per-document row-stability metrics — the
    reference's `calculate_stability_statistics` (calculate_stability.py
    :357-414): mean / POPULATION std / min / max / median of similarity,
    mean/std of the overall-matrix similarity (falling back to `similarity`
    for rows without a full comparison, exactly like the reference's
    `result.get('overall_mean_similarity', result['similarity'])` — shortcut
    rows never carry the key), per-comparison-type counts, count1/count2
    mean/std/totals, n_samples. One wide-agg Spark job."""
    sim = F.col("similarity")
    overall = F.when(
        F.col("comparison_type") == "full_comparison", F.col("overall_mean")
    ).otherwise(sim)

    def type_count(t):
        return F.sum(
            F.when(F.col("comparison_type") == t, 1).otherwise(0)
        ).alias(f"n_{t}")

    return row_stability_df.agg(
        F.avg(sim).alias("mean_similarity"),
        F.stddev_pop(sim).alias("std_similarity"),
        F.min(sim).alias("min_similarity"),
        F.max(sim).alias("max_similarity"),
        F.median(sim).alias("median_similarity"),
        F.avg(overall).alias("mean_overall_similarity"),
        F.stddev_pop(overall).alias("std_overall_similarity"),
        F.count("*").alias("n_samples"),
        type_count("full_comparison"),
        type_count("both_empty"),
        type_count("one_empty"),
        type_count("no_embeddings"),
        F.avg("count1").alias("mean_count1"),
        F.stddev_pop("count1").alias("std_count1"),
        F.avg("count2").alias("mean_count2"),
        F.stddev_pop("count2").alias("std_count2"),
        F.sum("count1").alias("total_count1"),
        F.sum("count2").alias("total_count2"),
    )
