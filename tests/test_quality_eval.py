"""Parity of the quality/stability/exhaustivity operators against the LIVE
reference evaluation scripts, on the reference's own shipped NYT COVID golden
dataset (122 annotated rows).

Reference functions exercised (loaded from /root/reference, shims for
dateparser/sklearn/matplotlib only — see ref_loader):
  * calculate_comprehensive_metrics  (calculate_quintuples_quality.py:92-301)
  * calculate_row_stability_jaccard  (calculate_stability_jaccard.py:298-358)
  * find_matches_quintuples_optimized (plot_exhaustivity_quintuples.py:109-204)

Both sides share one embedding space (the engine's hash embedder via HashLG)
and one parser (dateparser shimmed to the engine's parse_datetime), so any
count difference is a matching-logic divergence, which is what we're testing.
"""

from __future__ import annotations

import asyncio

import pytest

from itext2kg_spark.merge.quality import (
    is_empty_temporal,
    quintuple_exhaustivity,
    quintuple_quality,
    quintuple_stability,
    score_exhaustivity,
    score_quality,
    score_stability,
    temporal_similar,
)
from tests.nyt_loader import (
    FACTOID_PRED_COL,
    FACTOID_RUN2_COL,
    GOLD_COL,
    PRED_COL,
    RUN2_COL,
    load_nyt,
    quintuple_rows,
    stringified_tuples,
)
from tests.ref_loader import (
    HashLG,
    load_reference_exhaustivity,
    load_reference_quality,
    load_reference_stability,
)

N_ROWS = 30  # parity sample size (the full corpus is 122 rows; 30 keeps the
# O(n^2)-per-row scoring fast while covering empty-temporal, list-temporal,
# duplicate-text and unequal-count rows)


@pytest.fixture(scope="module")
def nyt():
    df = load_nyt(max_rows=N_ROWS)
    if df is None:
        pytest.skip("NYT golden pickle not available")
    return df


def _as_list(v):
    return list(v) if isinstance(v, (list, tuple)) else []


def _counts(d):
    return {
        k: d[k]
        for k in (
            "MATCH_count",
            "HALL_count",
            "OM_count",
            "MATCH_t_count",
            "OM_t_count",
            "HALL_t_count",
            "total_predicted",
            "total_gold",
        )
    }


def test_quality_parity_vs_reference(nyt):
    ref = load_reference_quality()
    assert ref is not None, "reference quality script failed to load"
    lg = HashLG()
    checked = 0
    for idx in nyt.index:
        gold = _as_list(nyt[GOLD_COL].loc[idx])
        pred = _as_list(nyt[PRED_COL].loc[idx])
        if not gold or not pred:
            continue
        ref_m = asyncio.run(
            ref.calculate_comprehensive_metrics(
                quintuples=list(pred),
                gold_quintuples=list(gold),
                lg_kg_construction=lg,
                threshold=0.7,
            )
        )
        ours = score_quality(list(pred), list(gold), threshold=0.7)
        assert ours["match_count"] == ref_m["MATCH_count"], idx
        assert ours["hall_count"] == ref_m["HALL_count"], idx
        assert ours["om_count"] == ref_m["OM_count"], idx
        assert ours["match_t_count"] == ref_m["MATCH_t_count"], idx
        assert ours["om_t_count"] == ref_m["OM_t_count"], idx
        assert ours["hall_t_count"] == ref_m["HALL_t_count"], idx
        assert ours["total_predicted"] == ref_m["total_predicted"]
        assert ours["total_gold"] == ref_m["total_gold"]
        # the reference's own invariant: MATCH = MATCH_t + OM_t + HALL_t
        assert (
            ours["match_count"]
            == ours["match_t_count"] + ours["om_t_count"] + ours["hall_t_count"]
        )
        checked += 1
    assert checked >= 20


def test_quality_empty_cases_parity():
    ref = load_reference_quality()
    assert ref is not None
    lg = HashLG()
    gold = [("a", "rel", "b", [], [])]
    for pred, gold_q in [([], []), ([], gold), (gold, [])]:
        ref_m = asyncio.run(
            ref.calculate_comprehensive_metrics(
                quintuples=pred,
                gold_quintuples=gold_q,
                lg_kg_construction=lg,
                threshold=0.7,
            )
        )
        ours = score_quality(pred, gold_q)
        assert _counts(ref_m) == {
            "MATCH_count": ours["match_count"],
            "HALL_count": ours["hall_count"],
            "OM_count": ours["om_count"],
            "MATCH_t_count": ours["match_t_count"],
            "OM_t_count": ours["om_t_count"],
            "HALL_t_count": ours["hall_t_count"],
            "total_predicted": ours["total_predicted"],
            "total_gold": ours["total_gold"],
        }


def test_stability_parity_vs_reference(nyt):
    ref = load_reference_stability()
    assert ref is not None, "reference stability script failed to load"
    lg = HashLG()
    checked = 0
    for col1, col2 in [(RUN2_COL, PRED_COL), (FACTOID_RUN2_COL, FACTOID_PRED_COL)]:
        for idx in nyt.index:
            q1 = _as_list(nyt[col1].loc[idx])
            q2 = _as_list(nyt[col2].loc[idx])
            # the reference embeds only non-empty formatted texts (and would
            # misalign indices otherwise); the corpus has none — assert that
            # precondition rather than replicate the misalignment
            assert all(
                ref.format_quintuple_text_for_embedding(q).strip() for q in q1 + q2
            )
            ref_m = asyncio.run(
                ref.calculate_row_stability_jaccard(
                    quintuples1=q1, quintuples2=q2, lg_kg_construction=lg
                )
            )
            ours = score_stability(q1, q2, threshold=0.7)
            assert ours["matched_count"] == ref_m["matched_count"], idx
            assert ours["count1"] == ref_m["count1"]
            assert ours["count2"] == ref_m["count2"]
            assert ours["jaccard"] == pytest.approx(ref_m["jaccard_similarity"])
            checked += 1
    assert checked >= 40


def test_exhaustivity_parity_vs_reference(nyt):
    ref = load_reference_exhaustivity()
    assert ref is not None, "reference exhaustivity script failed to load"
    lg = HashLG()
    checked = 0
    for idx in nyt.index:
        gold = _as_list(nyt[GOLD_COL].loc[idx])
        pred = _as_list(nyt[PRED_COL].loc[idx])
        if not gold or not pred:
            continue
        ref_m = asyncio.run(
            ref.find_matches_quintuples_optimized(
                quintuples=list(pred),
                gold_quintuples=list(gold),
                lg_kg_construction=lg,
                threshold=0.7,
            )
        )
        ours = score_exhaustivity(list(pred), list(gold), threshold=0.7)
        assert ours["matched_gold"] / ours["total_gold"] == pytest.approx(
            ref_m["recall"]
        ), idx
        assert ours["matched_gold_t"] / ours["total_gold"] == pytest.approx(
            ref_m["recall_t"]
        ), idx
        checked += 1
    assert checked >= 20


def test_stringified_temporals_preserve_semantics():
    """The Spark operators receive str(value) temporal columns; every
    is_empty/temporal_similar outcome must survive the stringification
    (None -> None; lists/values -> str)."""
    from tests.nyt_loader import stringify_temporal

    values = [None, "", [], ["2020-01-09"], ["2020-01-09", "2021-02-03"],
              "none", "None", "2020-01-09", "mid-2020", 0, 3.5]
    for v in values:
        assert is_empty_temporal(v) == is_empty_temporal(stringify_temporal(v))
    for a in values:
        for b in values:
            assert temporal_similar(a, b) == temporal_similar(
                stringify_temporal(a), stringify_temporal(b)
            ), (a, b)


# ---------------------------------------------------------------------------
# Spark operators vs the local kernels on the same NYT rows
# ---------------------------------------------------------------------------


def _spark_df(spark, nyt, col):
    rows = []
    for doc_id, idx in enumerate(nyt.index):
        rows.extend(quintuple_rows(_as_list(nyt[col].loc[idx]), doc_id))
    return spark.createDataFrame(
        rows,
        "doc_id long, idx long, head string, rel string, tail string, "
        "t_start string, t_end string",
    )


def test_spark_quality_operator_nyt(spark, nyt):
    pred_df = _spark_df(spark, nyt, PRED_COL)
    gold_df = _spark_df(spark, nyt, GOLD_COL)
    got = {
        r["doc_id"]: r.asDict()
        for r in quintuple_quality(pred_df, gold_df, threshold=0.7).collect()
    }
    for doc_id, idx in enumerate(nyt.index):
        pred = _as_list(nyt[PRED_COL].loc[idx])
        gold = _as_list(nyt[GOLD_COL].loc[idx])
        if doc_id not in got:  # no rows on either side -> no cogroup group
            assert not pred and not gold
            continue
        exp = score_quality(
            stringified_tuples(pred),
            stringified_tuples(gold),
            threshold=0.7,
        )
        row = got[doc_id]
        assert row["match_count"] == exp["match_count"], doc_id
        assert row["hall_count"] == exp["hall_count"], doc_id
        assert row["om_count"] == exp["om_count"], doc_id
        assert row["match_t_count"] == exp["match_t_count"], doc_id
        assert row["om_t_count"] == exp["om_t_count"], doc_id
        assert row["hall_t_count"] == exp["hall_t_count"], doc_id
        assert row["total_pred"] == exp["total_predicted"]
        assert row["total_gold"] == exp["total_gold"]


def test_spark_stability_operator_nyt(spark, nyt):
    r1 = _spark_df(spark, nyt, RUN2_COL)
    r2 = _spark_df(spark, nyt, PRED_COL)
    got = {
        r["doc_id"]: r.asDict()
        for r in quintuple_stability(r1, r2, threshold=0.7).collect()
    }
    for doc_id, idx in enumerate(nyt.index):
        q1 = _as_list(nyt[RUN2_COL].loc[idx])
        q2 = _as_list(nyt[PRED_COL].loc[idx])
        if doc_id not in got:
            assert not q1 and not q2
            continue
        exp = score_stability(
            stringified_tuples(q1),
            stringified_tuples(q2),
            threshold=0.7,
        )
        row = got[doc_id]
        assert row["matched_count"] == exp["matched_count"], doc_id
        assert row["count1"] == exp["count1"]
        assert row["count2"] == exp["count2"]
        assert row["jaccard"] == pytest.approx(exp["jaccard"])


def test_spark_exhaustivity_operator_nyt(spark, nyt):
    pred_df = _spark_df(spark, nyt, PRED_COL)
    gold_df = _spark_df(spark, nyt, GOLD_COL)
    got = {
        r["doc_id"]: r.asDict()
        for r in quintuple_exhaustivity(pred_df, gold_df, threshold=0.7).collect()
    }
    for doc_id, idx in enumerate(nyt.index):
        pred = _as_list(nyt[PRED_COL].loc[idx])
        gold = _as_list(nyt[GOLD_COL].loc[idx])
        if doc_id not in got:
            assert not pred and not gold
            continue
        exp = score_exhaustivity(
            stringified_tuples(pred),
            stringified_tuples(gold),
            threshold=0.7,
        )
        row = got[doc_id]
        assert row["matched_gold"] == exp["matched_gold"], doc_id
        assert row["matched_gold_t"] == exp["matched_gold_t"], doc_id
        assert row["total_pred"] == exp["total_predicted"]
        assert row["total_gold"] == exp["total_gold"]


def test_quality_summary_parity_vs_reference(spark, nyt):
    """Corpus-level summary statistics (the reference's
    calculate_summary_statistics — mean/population-std of per-row
    proportions + count totals) must match when the Spark quality operator's
    per-doc rows are aggregated by quality_summary. Both extraction variants
    (direct and from-factoids) are summarized, mirroring the reference's
    case1/case2 comparison."""
    from itext2kg_spark.merge.quality import quality_summary

    ref = load_reference_quality()
    assert ref is not None
    lg = HashLG()

    for pred_col in (PRED_COL, FACTOID_PRED_COL):
        # the reference's loop evaluates only rows with nonempty gold AND
        # nonempty prediction (evaluate_quintuples_quality:389-432)
        keep = [
            idx
            for idx in nyt.index
            if _as_list(nyt[GOLD_COL].loc[idx]) and _as_list(nyt[pred_col].loc[idx])
        ]
        ref_rows = [
            asyncio.run(
                ref.calculate_comprehensive_metrics(
                    quintuples=_as_list(nyt[pred_col].loc[idx]),
                    gold_quintuples=_as_list(nyt[GOLD_COL].loc[idx]),
                    lg_kg_construction=lg,
                    threshold=0.7,
                )
            )
            for idx in keep
        ]
        ref_summary = ref.calculate_summary_statistics({"case": ref_rows})["case"]

        sub = nyt.loc[keep]
        got = quality_summary(
            quintuple_quality(
                _spark_df(spark, sub, pred_col),
                _spark_df(spark, sub, GOLD_COL),
                threshold=0.7,
            )
        ).collect()[0].asDict()

        assert got["n_samples"] == ref_summary["n_samples"]
        for m in ("MATCH", "HALL", "OM", "MATCH_t", "OM_t", "HALL_t"):
            assert got[f"{m}_mean"] == pytest.approx(ref_summary[f"{m}_mean"]), m
            assert got[f"{m}_std"] == pytest.approx(ref_summary[f"{m}_std"]), m
        count_map = {
            "match_count": "MATCH_count", "hall_count": "HALL_count",
            "om_count": "OM_count", "match_t_count": "MATCH_t_count",
            "om_t_count": "OM_t_count", "hall_t_count": "HALL_t_count",
            "total_pred": "total_predicted", "total_gold": "total_gold",
        }
        for ours, theirs in count_map.items():
            assert got[f"{ours}_total"] == ref_summary[f"{theirs}_total"], ours


# ---------------------------------------------------------------------------
# round-4 variants: factoid exhaustivity + non-Jaccard row stability
# ---------------------------------------------------------------------------

FACTOID_GOLD_COL = "factoids_g_truth"
FACTOID_TEXT_COL = "factoids_claude"
RUN3_COL = "quintuples_gpt41_run3"


def test_factoid_exhaustivity_parity_vs_reference(nyt):
    """Per-row parity of score_factoid_exhaustivity vs the live
    find_matches_factoids_optimized (plot_exhaustivity_factoids.py:242-364)
    on the NYT factoid columns, sharing one embedder and one date parser."""
    from itext2kg_spark.merge.quality import (
        extract_temporal_dates,
        score_factoid_exhaustivity,
    )
    from tests.ref_loader import load_reference_exhaustivity_factoids

    ref = load_reference_exhaustivity_factoids()
    assert ref is not None, "reference factoid script failed to load"
    lg = HashLG()
    checked = mined = 0
    for idx in nyt.index:
        gold = _as_list(nyt[FACTOID_GOLD_COL].loc[idx])
        pred = _as_list(nyt[FACTOID_TEXT_COL].loc[idx])
        if not gold or not pred:
            continue
        ref_m = asyncio.run(
            ref.find_matches_factoids_optimized(
                factoids=list(pred),
                gold_factoids=list(gold),
                lg_kg_construction=lg,
                threshold=0.7,
            )
        )
        ours = score_factoid_exhaustivity(list(pred), list(gold), threshold=0.7)
        assert ours["matched_gold"] / ours["total_gold"] == pytest.approx(
            ref_m["recall"]
        ), idx
        assert ours["matched_gold_t"] / ours["total_gold"] == pytest.approx(
            ref_m["recall_t"]
        ), idx
        if any(extract_temporal_dates(g) for g in gold):
            mined += 1
        checked += 1
    assert checked >= 20
    # the temporal mining path must actually fire on this corpus
    assert mined >= 10


def test_factoid_empty_cases_parity():
    from itext2kg_spark.merge.quality import score_factoid_exhaustivity
    from tests.ref_loader import load_reference_exhaustivity_factoids

    ref = load_reference_exhaustivity_factoids()
    assert ref is not None
    lg = HashLG()
    for pred, gold in [([], []), ([], ["a fact"]), (["a fact"], [])]:
        ref_m = asyncio.run(
            ref.find_matches_factoids_optimized(pred, gold, lg, threshold=0.7)
        )
        ours = score_factoid_exhaustivity(pred, gold)
        assert ref_m == {"recall": 0.0, "recall_t": 0.0}
        assert ours["matched_gold"] == 0 and ours["matched_gold_t"] == 0


def test_temporal_date_mining_parity():
    """The inner date-extraction must agree with the reference's on real
    factoid texts (both use the shimmed shared parser) — checked indirectly
    by recall_t parity above, and directly here on representative shapes."""
    from itext2kg_spark.merge.quality import (
        extract_temporal_dates,
        temporal_lists_overlap,
    )

    d1 = extract_temporal_dates("The outbreak began on January 9, 2020 in Asia")
    assert any(str(d) == "2020-01-09" for d in d1)
    assert extract_temporal_dates("") == []
    assert extract_temporal_dates(None) == []
    assert extract_temporal_dates(123) == []  # non-str mines to []
    assert temporal_lists_overlap([], [])
    assert not temporal_lists_overlap(d1, [])
    assert temporal_lists_overlap(d1, list(d1))


def test_row_stability_parity_vs_reference(nyt):
    """Per-row parity of score_row_stability vs the live
    calculate_row_stability (calculate_stability.py:197-261) on the NYT
    run3-vs-run1 pairs — the exact comparison the reference script runs."""
    from itext2kg_spark.merge.quality import score_row_stability
    from tests.ref_loader import load_reference_stability_row

    ref = load_reference_stability_row()
    assert ref is not None, "reference row-stability script failed to load"
    lg = HashLG()
    checked = 0
    for col1, col2 in [(RUN3_COL, PRED_COL), (FACTOID_RUN2_COL, FACTOID_PRED_COL)]:
        for idx in nyt.index:
            q1 = _as_list(nyt[col1].loc[idx])
            q2 = _as_list(nyt[col2].loc[idx])
            ref_m = asyncio.run(
                ref.calculate_row_stability(
                    quintuples1=q1, quintuples2=q2, lg_kg_construction=lg
                )
            )
            ours = score_row_stability(q1, q2)
            assert ours["count1"] == ref_m["count1"], idx
            assert ours["count2"] == ref_m["count2"], idx
            assert ours["comparison_type"] == ref_m["comparison_type"], idx
            assert ours["similarity"] == pytest.approx(ref_m["similarity"]), idx
            if "overall_mean_similarity" in ref_m:
                assert ours["overall_mean"] == pytest.approx(
                    ref_m["overall_mean_similarity"]
                ), idx
            checked += 1
    assert checked >= 40


def test_row_stability_empty_cases_parity():
    from itext2kg_spark.merge.quality import score_row_stability
    from tests.ref_loader import load_reference_stability_row

    ref = load_reference_stability_row()
    assert ref is not None
    lg = HashLG()
    q = [("a", "rel", "b", "2020-01-01", None)]
    for q1, q2 in [([], []), ([], q), (q, [])]:
        ref_m = asyncio.run(ref.calculate_row_stability(q1, q2, lg))
        ours = score_row_stability(q1, q2)
        assert ours["similarity"] == pytest.approx(ref_m["similarity"])
        assert ours["comparison_type"] == ref_m["comparison_type"]
    # formatted-text parity incl. the temporal suffix rule
    from itext2kg_spark.merge.quality import format_quintuple_text

    refmod = ref
    for t in [("s", "p", "o"), ("s", "p", "o", "2020", None),
              ("s", "p", "o", None, "2021"), ("s", None, "o", "", ""),
              ("s",), (), ("s", "p", "o", ["2020-01-01"], [])]:
        assert format_quintuple_text(t) == refmod.format_quintuple_text(t), t


def test_group_pair_guard():
    """A pathological document (thousands of quintuples) must fail loudly,
    not silently materialize an O(n*m) pair list (VERDICT r3 watch item)."""
    from itext2kg_spark.merge.quality import score_quality, score_row_stability

    big = [("h%d" % i, "r", "t%d" % i, None, None) for i in range(300)]
    with pytest.raises(ValueError, match="max_pairs"):
        score_quality(big, big, max_pairs=10_000)
    with pytest.raises(ValueError, match="max_pairs"):
        score_row_stability(big, big, max_pairs=10_000)
    # within budget -> scores normally
    ok = score_quality(big[:5], big[:5], max_pairs=10_000)
    assert ok["match_count"] == 5


def _factoid_spark_df(spark, nyt, col):
    rows = []
    for doc_id, idx in enumerate(nyt.index):
        for i, f in enumerate(_as_list(nyt[col].loc[idx])):
            rows.append({"doc_id": doc_id, "idx": i, "text": str(f)})
    return spark.createDataFrame(rows, "doc_id long, idx long, text string")


def test_spark_factoid_exhaustivity_operator_nyt(spark, nyt):
    from itext2kg_spark.merge.quality import (
        factoid_exhaustivity,
        score_factoid_exhaustivity,
    )

    pred_df = _factoid_spark_df(spark, nyt, FACTOID_TEXT_COL)
    gold_df = _factoid_spark_df(spark, nyt, FACTOID_GOLD_COL)
    got = {
        r["doc_id"]: r.asDict()
        for r in factoid_exhaustivity(pred_df, gold_df, threshold=0.7).collect()
    }
    for doc_id, idx in enumerate(nyt.index):
        pred = [str(f) for f in _as_list(nyt[FACTOID_TEXT_COL].loc[idx])]
        gold = [str(f) for f in _as_list(nyt[FACTOID_GOLD_COL].loc[idx])]
        if doc_id not in got:
            assert not pred and not gold
            continue
        exp = score_factoid_exhaustivity(pred, gold, threshold=0.7)
        row = got[doc_id]
        assert row["matched_gold"] == exp["matched_gold"], doc_id
        assert row["matched_gold_t"] == exp["matched_gold_t"], doc_id
        assert row["total_pred"] == exp["total_pred"]
        assert row["total_gold"] == exp["total_gold"]


def test_spark_row_stability_operator_nyt(spark, nyt):
    from itext2kg_spark.merge.quality import (
        quintuple_row_stability,
        score_row_stability,
    )

    r1 = _spark_df(spark, nyt, RUN3_COL)
    r2 = _spark_df(spark, nyt, PRED_COL)
    got = {
        r["doc_id"]: r.asDict()
        for r in quintuple_row_stability(r1, r2).collect()
    }
    for doc_id, idx in enumerate(nyt.index):
        q1 = _as_list(nyt[RUN3_COL].loc[idx])
        q2 = _as_list(nyt[PRED_COL].loc[idx])
        if doc_id not in got:
            assert not q1 and not q2
            continue
        exp = score_row_stability(
            stringified_tuples(q1), stringified_tuples(q2)
        )
        row = got[doc_id]
        assert row["count1"] == exp["count1"]
        assert row["count2"] == exp["count2"]
        assert row["comparison_type"] == exp["comparison_type"], doc_id
        assert row["similarity"] == pytest.approx(exp["similarity"]), doc_id
        assert row["overall_mean"] == pytest.approx(exp["overall_mean"]), doc_id


def test_row_stability_summary_parity_vs_reference(spark, nyt):
    """Corpus-level parity: reference calculate_row_stability per row ->
    calculate_stability_statistics vs our Spark operator pipeline
    (quintuple_row_stability -> row_stability_summary) on the same rows."""
    from itext2kg_spark.merge.quality import (
        quintuple_row_stability,
        row_stability_summary,
    )
    from tests.ref_loader import load_reference_stability_row

    ref = load_reference_stability_row()
    assert ref is not None
    lg = HashLG()
    # restrict both sides to documents with at least one quintuple on either
    # side: the cogrouped Spark operator emits no row for a fully absent
    # document, so the reference loop is run over the same set
    keep = [
        idx
        for idx in nyt.index
        if _as_list(nyt[RUN3_COL].loc[idx]) or _as_list(nyt[PRED_COL].loc[idx])
    ]
    sub = nyt.loc[keep]
    ref_rows = [
        asyncio.run(
            ref.calculate_row_stability(
                quintuples1=_as_list(sub[RUN3_COL].loc[idx]),
                quintuples2=_as_list(sub[PRED_COL].loc[idx]),
                lg_kg_construction=lg,
            )
        )
        for idx in keep
    ]
    ref_sum = ref.calculate_stability_statistics({"case": ref_rows})["case"]

    r1 = _spark_df(spark, sub, RUN3_COL)
    r2 = _spark_df(spark, sub, PRED_COL)
    got = (
        row_stability_summary(quintuple_row_stability(r1, r2))
        .collect()[0]
        .asDict()
    )
    assert got["n_samples"] == ref_sum["n_samples"]
    for k in (
        "mean_similarity", "std_similarity", "min_similarity",
        "max_similarity", "median_similarity",
        "mean_overall_similarity", "std_overall_similarity",
        "mean_count1", "std_count1", "mean_count2", "std_count2",
    ):
        assert got[k] == pytest.approx(ref_sum[k]), k
    assert got["total_count1"] == ref_sum["total_count1"]
    assert got["total_count2"] == ref_sum["total_count2"]
    types = ref_sum["comparison_types"]
    assert got["n_full_comparison"] == types.get("full_comparison", 0)
    assert got["n_one_empty"] == types.get("one_empty", 0)
    assert got["n_both_empty"] == types.get("both_empty", 0)
    assert got["n_no_embeddings"] == types.get("no_embeddings", 0)


# ---------------------------------------------------------------------------
# randomized live-reference fuzz parity (edge cases the NYT corpus lacks:
# duplicate texts / cosine ties, None and list temporals, short tuples)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_WORD = st.sampled_from(
    ["virus", "asia", "outbreak", "fear", "china", "on", "by", "x"]
)
_TEMPORAL = st.sampled_from(
    [None, "", [], "none", "2020-01-09", ["2020-01-09"], "mid-2020", "March 05, 2020"]
)
_QUINT = st.tuples(_WORD, _WORD, _WORD, _TEMPORAL, _TEMPORAL)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_QUINT, min_size=0, max_size=6),
    st.lists(_QUINT, min_size=0, max_size=6),
)
def test_row_stability_fuzz_parity(q1, q2):
    from itext2kg_spark.merge.quality import score_row_stability
    from tests.ref_loader import load_reference_stability_row

    ref = load_reference_stability_row()
    assert ref is not None
    lg = HashLG()
    ref_m = asyncio.run(
        ref.calculate_row_stability(list(q1), list(q2), lg_kg_construction=lg)
    )
    ours = score_row_stability(list(q1), list(q2))
    assert ours["count1"] == ref_m["count1"]
    assert ours["count2"] == ref_m["count2"]
    assert ours["comparison_type"] == ref_m["comparison_type"]
    assert ours["similarity"] == pytest.approx(ref_m["similarity"])


_FACTOID = st.sampled_from(
    [
        "the virus spread on January 9, 2020 across asia",
        "the virus spread across asia",
        "a deadly epidemic struck in 2003",
        "a deadly epidemic struck",
        "fear rose on 2020-03-05",
        "fear rose on 2021-07-07",
        "",
    ]
)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_FACTOID, min_size=0, max_size=5),
    st.lists(_FACTOID, min_size=0, max_size=5),
)
def test_factoid_exhaustivity_fuzz_parity(pred, gold):
    from itext2kg_spark.merge.quality import score_factoid_exhaustivity
    from tests.ref_loader import load_reference_exhaustivity_factoids

    ref = load_reference_exhaustivity_factoids()
    assert ref is not None
    lg = HashLG()
    ref_m = asyncio.run(
        ref.find_matches_factoids_optimized(
            list(pred), list(gold), lg, threshold=0.7
        )
    )
    ours = score_factoid_exhaustivity(list(pred), list(gold), threshold=0.7)
    if not pred or not gold:
        assert ref_m == {"recall": 0.0, "recall_t": 0.0}
        assert ours["matched_gold"] == 0 and ours["matched_gold_t"] == 0
    else:
        assert ours["matched_gold"] / ours["total_gold"] == pytest.approx(
            ref_m["recall"]
        )
        assert ours["matched_gold_t"] / ours["total_gold"] == pytest.approx(
            ref_m["recall_t"]
        )


def test_temporal_prefilter_identical_output():
    """The date-ish token gate must not change extract_temporal_dates output
    under the dateutil fallback — only skip windows that could never parse.
    Corpus mixes ISO / long-form / ordinal / dotted dates, month-prefix false
    positives ('market', 'maybe'), jump-word phrases, and plain prose."""
    from itext2kg_spark.merge.quality import extract_temporal_dates

    texts = [
        "the merger closed on 2020-03-05 after review",
        "announced March 5, 2020 in new york",
        "from July 17th, 2025 onward the market may rally",
        "deadline 17.07.2025 set by the board",
        "maybe the market moves on monday of at on and",
        "plain prose with no dates at all just words and more words",
        "June 2020 saw record growth but maybe not in august",
        "",
        "on st nd rd th of at and m t",
        "q3 numbers beat q2 by 12 percent",
    ]
    for t in texts:
        gated = sorted(extract_temporal_dates(t, prefilter=True))
        brute = sorted(extract_temporal_dates(t, prefilter=False))
        assert gated == brute, t


def test_parse_datetime_fixture_fully_specified():
    """Bounds the dateutil-fallback / dateparser divergence (round-4 advice):
    for fully-specified dates the two parsers agree — these expected values
    are stock `dateparser.parse(s, settings={'PREFER_DAY_OF_MONTH':
    'first'})` outputs, asserted here against whatever parser
    parse_datetime resolved (the dateutil shim in this container; real
    dateparser where installed)."""
    from datetime import date

    from itext2kg_spark.merge.quality import parse_datetime

    fixture = {
        "2020-03-05": date(2020, 3, 5),
        "March 5, 2020": date(2020, 3, 5),
        "March 05, 2020": date(2020, 3, 5),
        "5 March 2020": date(2020, 3, 5),
        "July 17th, 2025": date(2025, 7, 17),
        "17.07.2025": date(2025, 7, 17),
        "June 2020": date(2020, 6, 1),  # PREFER_DAY_OF_MONTH='first' analog
    }
    for s, expected in fixture.items():
        got = parse_datetime(s)
        assert got is not None and got.date() == expected, s
    assert parse_datetime("definitely not a date phrase") is None
    assert parse_datetime(None) is None


def test_parse_datetime_real_dateparser_leg():
    """When real dateparser is importable (not this container), the
    dateparser-first path must activate and agree with the fixture; skipped
    otherwise. Also asserts the parity shim is never mistaken for the real
    module (the recursion guard)."""
    import sys

    from itext2kg_spark.merge import quality

    shim = sys.modules.get("dateparser")
    if shim is not None and getattr(shim, "__spark_graft_shim__", False):
        assert quality._dateparser_mod() is None
        pytest.skip("only the parity shim is present")
    try:
        import dateparser  # noqa: F401
    except ImportError:
        pytest.skip("dateparser not installed in this container")
    quality._DATEPARSER = None  # re-resolve
    assert quality._dateparser_mod() is not None
    from datetime import date

    assert quality.parse_datetime("June 2020").date() == date(2020, 6, 1)
