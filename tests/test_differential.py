"""Differential harness: the REFERENCE pipeline (its own Entity/Relationship/
GraphMatcher classes, loaded live from /root/reference) vs our Spark engine on
identical inputs and an identical deterministic embedding space.

Target (BASELINE.json): triple (subj, pred, obj) precision/recall >= 0.95.
"""

import pytest
from pyspark.sql import functions as F

from itext2kg_spark.config import ATOM, PipelineConfig, MatchConfig, EmbedConfig
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.merge.kg import canonicalize_kg
from itext2kg_spark.pipeline import KGPipeline
from itext2kg_spark.sources.pages import synth_pages
from tests.kg_helpers import (
    pr,
    quintuples_df,
    reference_build_kg,
    ref_triples,
    spark_triples,
)
from tests.ref_loader import get_reference


@pytest.fixture(scope="module")
def ref():
    r = get_reference()
    if r is None:
        pytest.skip("reference tree not loadable")
    return r


def _collect_fact_rows(quints_df):
    """Group collected quintuples into (fact, obs_epoch, [quintuple dicts])."""
    rows = quints_df.collect()
    by_fact = {}
    for r in rows:
        key = (r["url"], r["fact_idx"])
        obs = r["obs_ts"].timestamp()
        entry = by_fact.setdefault(key, (r["fact"], obs, []))
        entry[2].append(
            {
                "subj_name": r["subj_name"],
                "subj_label": r["subj_label"],
                "pred": r["pred"],
                "obj_name": r["obj_name"],
                "obj_label": r["obj_label"],
                "t_start": list(r["t_start"] or []),
                "t_end": list(r["t_end"] or []),
            }
        )
    # deterministic order (the reference's merge is order-dependent; fix one)
    return [by_fact[k] for k in sorted(by_fact)]


def _run_both(spark, ref, n_pages, seed, ent_thr=0.8, rel_thr=0.7):
    pipe = KGPipeline(
        PipelineConfig(
            match=MatchConfig(ent_threshold=ent_thr, rel_threshold=rel_thr),
            embed=EmbedConfig(),
        )
    )
    pages = synth_pages(spark, n_pages, seed=seed)
    quints = pipe.quintuples_from_pages(pages).localCheckpoint()

    fact_rows = _collect_fact_rows(quints)
    ref_kg = reference_build_kg(
        ref, fact_rows, ent_threshold=ent_thr, rel_threshold=rel_thr
    )

    _, edges = canonicalize_kg(quints, pipe.cfg, pipe.embedder)
    return ref_triples(ref_kg), spark_triples(edges)


def test_triple_pr_small_batch(spark, ref):
    expected, got = _run_both(spark, ref, n_pages=40, seed=42)
    precision, recall = pr(expected, got)
    assert precision >= 0.95, f"precision {precision:.3f} (n_ref={len(expected)}, n_got={len(got)})"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_triple_pr_larger_batch(spark, ref):
    expected, got = _run_both(spark, ref, n_pages=120, seed=7)
    precision, recall = pr(expected, got)
    assert precision >= 0.95, f"precision {precision:.3f} (n_ref={len(expected)}, n_got={len(got)})"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_triple_pr_large_batch(spark, ref):
    """~1.2k facts — the scale where the reference's quadratic merge starts
    to labor; P/R must hold as batch size grows."""
    expected, got = _run_both(spark, ref, n_pages=400, seed=3)
    precision, recall = pr(expected, got)
    assert precision >= 0.95, f"precision {precision:.3f} (n_ref={len(expected)})"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_temporal_lists_match_reference(spark, ref):
    """t_start/t_end parity as multisets (A4 note: our lists are array_sort'ed,
    the reference's keep merge order): for triples both systems emit, the
    parsed epoch multisets must agree — including the dateutil-only fuzzy
    forms synth_pages now emits ("July 17th, 2025", "17.07.2025"), which the
    pre-round-2 fast-path-only array parser silently dropped."""
    from collections import Counter

    pipe = KGPipeline()
    pages = synth_pages(spark, 60, seed=21)
    quints = pipe.quintuples_from_pages(pages).localCheckpoint()
    fact_rows = _collect_fact_rows(quints)
    # the corpus must actually exercise the fuzzy formats
    assert any(
        any("," in t or "." in t for q in quints_ for t in q["t_start"] + q["t_end"])
        for _, _, quints_ in fact_rows
    )
    ref_kg = reference_build_kg(ref, fact_rows)
    _, edges = canonicalize_kg(quints, pipe.cfg, pipe.embedder)

    def key(s, sl, p, o, ol):
        return (s, sl, p, o, ol)

    ref_times = {}
    for r in ref_kg.relationships:
        k = key(r.startEntity.name, r.startEntity.label, r.name,
                r.endEntity.name, r.endEntity.label)
        ref_times[k] = (
            Counter(round(x, 3) for x in r.properties.t_start),
            Counter(round(x, 3) for x in r.properties.t_end),
        )
    rows = edges.select(
        "src_name", "src_label", "pred", "dst_name", "dst_label",
        "t_start", "t_end",
    ).collect()
    common = mismatched = 0
    for r in rows:
        k = key(r["src_name"], r["src_label"], r["pred"], r["dst_name"], r["dst_label"])
        if k not in ref_times:
            continue
        common += 1
        got = (
            Counter(round(x, 3) for x in (r["t_start"] or [])),
            Counter(round(x, 3) for x in (r["t_end"] or [])),
        )
        if got != ref_times[k]:
            mismatched += 1
    assert common > 20
    assert mismatched / common <= 0.05, f"{mismatched}/{common} temporal mismatches"


def test_entity_sets_close(spark, ref):
    """Entity canonical sets agree within the same budget."""
    pipe = KGPipeline()
    pages = synth_pages(spark, 60, seed=13)
    quints = pipe.quintuples_from_pages(pages).localCheckpoint()
    fact_rows = _collect_fact_rows(quints)
    ref_kg = reference_build_kg(ref, fact_rows)
    ents, _ = canonicalize_kg(quints, pipe.cfg, pipe.embedder)

    ref_ents = sorted((e.name, e.label) for e in ref_kg.entities)
    got_ents = sorted((r["name"], r["label"]) for r in ents.collect())
    precision, recall = pr(ref_ents, got_ents)
    assert precision >= 0.9 and recall >= 0.9, f"entity P/R {precision:.3f}/{recall:.3f}"
