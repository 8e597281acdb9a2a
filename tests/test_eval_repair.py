"""E4 repair loop + published ER/RR precision formulas, with live parity
against the reference eval functions (evaluate_itext2kg_merge.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from itext2kg_spark.extract.embed import HashEmbedder, hash_embed_texts
from itext2kg_spark.merge.evaluation import er_rr_precision
from itext2kg_spark.merge.legacy import repair_isolated_entities
from tests.ref_loader import get_reference, load_reference_merge_eval

EDGE_DDL = (
    "src_name string, src_label string, pred string,"
    " dst_name string, dst_label string"
)


# ---------------------------------------------------------------------------
# E4 repair loop
# ---------------------------------------------------------------------------

def _ents(spark, names):
    return spark.createDataFrame(
        [(n, "thing") for n in names], "name string, label string"
    )


def _edges(spark, triples):
    return spark.createDataFrame(
        [(s, "thing", p, o, "thing") for s, p, o in triples], EDGE_DDL
    )


def test_repair_loop_links_then_terminates(spark):
    entities = _ents(spark, ["a", "b", "c", "d"])
    edges = _edges(spark, [("a", "knows", "b")])

    calls = []

    def extract_fn(isolated):
        names = sorted(r["name"] for r in isolated.collect())
        calls.append(names)
        if "c" in names:  # round 1 links c only
            return _edges(spark, [("c", "knows", "a")])
        return _edges(spark, [])  # later rounds produce nothing

    out, m = repair_isolated_entities(entities, edges, extract_fn, max_tries=3)
    assert calls[0] == ["c", "d"]
    assert m["isolated_initial"] == 2
    assert m["tries"] == 3  # bounded: d never links, loop stops at max_tries
    assert m["isolated_remaining"] == 1
    assert out.where(F.col("src_name") == "c").count() == 1


def test_repair_loop_stops_when_all_linked(spark):
    entities = _ents(spark, ["a", "b", "c"])
    edges = _edges(spark, [("a", "knows", "b")])

    def extract_fn(isolated):
        return _edges(
            spark, [(r["name"], "rel", "a") for r in isolated.collect()]
        )

    out, m = repair_isolated_entities(entities, edges, extract_fn, max_tries=5)
    assert m["tries"] == 1
    assert m["isolated_remaining"] == 0
    assert out.count() == 2


def test_repair_loop_no_isolated_no_calls(spark):
    entities = _ents(spark, ["a", "b"])
    edges = _edges(spark, [("a", "knows", "b")])
    out, m = repair_isolated_entities(
        entities, edges, lambda _: pytest.fail("must not be called"), max_tries=3
    )
    assert m == {"tries": 0, "isolated_initial": 0, "isolated_remaining": 0}
    assert out.count() == 1


# ---------------------------------------------------------------------------
# ER/RR precision — live parity with the published formulas
# ---------------------------------------------------------------------------

ENTITIES = [
    ("acme corp", "org"),
    ("acme corp inc", "org"),   # residual near-dup pair (cos ~0.816)
    ("jane smith", "person"),
    ("quantum widgets", "org"),
]
PREDS = ["works at acme", "works at acme inc", "founded"]  # one similar pair
GT_QUINTS = [
    [("Acme", "works_at", "Jane"), ("Acme Inc", "works_at", "Jane S")],
    [("Acme Corp", "founded", "Quantum"), ("Quantum W", "employs", "Jane")],
]


def _spark_kg(spark):
    emb = hash_embed_texts([n for n, _ in ENTITIES])
    ents = spark.createDataFrame(
        [(n, l, [float(x) for x in emb[i]]) for i, (n, l) in enumerate(ENTITIES)],
        "name string, label string, embedding array<double>",
    )
    edges = spark.createDataFrame(
        [("acme corp", "org", p, "jane smith", "person") for p in PREDS],
        EDGE_DDL,
    )
    return ents, edges


def _reference_kg(ref):
    ents = []
    for n, l in ENTITIES:
        e = ref.Entity(name=n, label=l)
        e.properties.embeddings = hash_embed_texts([n])[0]
        ents.append(e)
    rels = []
    for p in PREDS:
        r = ref.Relationship(
            name=p,
            startEntity=ents[0],
            endEntity=ents[2],
            properties=ref.RelationshipProperties(),
        )
        r.properties.embeddings = hash_embed_texts([p])[0]
        rels.append(r)
    return ref.KnowledgeGraph(entities=ents, relationships=rels)


def test_er_rr_precision_matches_reference(spark):
    ref = get_reference()
    ev = load_reference_merge_eval()
    if ref is None or ev is None:
        pytest.skip("reference eval not loadable")
    df_nyt = pd.DataFrame({"quintuples_g_truth": GT_QUINTS})
    kg = _reference_kg(ref)
    thr = 0.8

    exp_er, _ = ev.calculate_ER_precision(kg, df_nyt, threshold=thr)
    exp_rr, _ = ev.calculate_RR_precision(kg, df_nyt, threshold=thr)

    ents, edges = _spark_kg(spark)
    got = er_rr_precision(
        ents,
        edges,
        HashEmbedder(),
        gt_entity_mentions=ev.calculate_number_of_entities(df_nyt),
        gt_relation_mentions=ev.calculate_number_of_relations(df_nyt),
        threshold=thr,
    ).collect()[0]

    assert got["er_precision_10k"] == int(exp_er * 10000)
    assert got["rr_precision_10k"] == int(exp_rr * 10000)
    # sanity: the scenario actually has residual pairs on both sides
    assert got["residual_entity_pairs"] >= 1
    assert got["residual_relation_pairs"] >= 1


def test_er_rr_edge_cases_match_reference_rules(spark):
    """expected_duplicates <= 0: ER returns 0.0 (:240-242) while RR returns
    1.0 on exact equality (:550-553) — reproduced asymmetry."""
    ents, edges = _spark_kg(spark)
    n_ent = ents.count()
    n_pred = 3
    got = er_rr_precision(
        ents, edges, HashEmbedder(),
        gt_entity_mentions=n_ent,       # expected_duplicates = 0
        gt_relation_mentions=n_pred,    # equal -> RR 1.0
        threshold=0.8,
    ).collect()[0]
    assert got["er_precision_10k"] == 0
    assert got["rr_precision_10k"] == 10000
