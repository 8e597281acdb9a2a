"""Property-based parity: Catalyst normalization vs the live reference
classes on hypothesis-generated strings, and incremental-merge differential
vs the reference's existing-KG path."""

from datetime import datetime

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from itext2kg_spark.config import ATOM
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.functions.normalize import norm_label, norm_name
from itext2kg_spark.merge.kg import canonicalize_kg
from tests.kg_helpers import (
    pr,
    quintuples_df,
    reference_build_kg,
    ref_triples,
    spark_triples,
)
from tests.ref_loader import get_reference

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=30,
)


@pytest.fixture(scope="module")
def ref():
    r = get_reference()
    if r is None:
        pytest.skip("reference tree not loadable")
    return r


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_normalization_property_parity(spark, ref, values):
    expected_l, expected_n = [], []
    for v in values:
        e = ref.Entity(name=v, label=v)
        e.process()
        expected_l.append(e.label)
        expected_n.append(e.name)
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    rows = df.select(
        norm_label(F.col("s")).alias("l"), norm_name(F.col("s")).alias("n")
    ).collect()
    assert [r["l"] for r in rows] == expected_l
    assert [r["n"] for r in rows] == expected_n


def test_incremental_merge_differential(spark, ref):
    """Two-batch incremental flow vs the reference's existing-KG merge
    (atom/atom.py:196-208): end-state triples agree at P/R >= 0.95."""
    emb = HashEmbedder(256, 42)

    def q(url, idx, s, p, o, ts):
        return {
            "url": url, "obs_ts": datetime(2025, 1, 1), "lang": "en",
            "fact_idx": idx, "fact": f"{s} {p} {o}",
            "subj_name": s, "subj_label": "Person" if " " in s else "Company",
            "pred": p, "obj_name": o, "obj_label": "Company",
            "t_start": [ts], "t_end": [],
        }

    batch1 = [
        q("u1", 0, "john doe", "works_at", "acme corp", "2024-01-01"),
        q("u1", 1, "jane kim", "ceo_of", "globex labs", "2024-02-01"),
    ]
    batch2 = [
        q("u2", 0, "john doe", "works_at", "acme corp inc", "2024-06-01"),
        q("u2", 1, "wei chen", "cto_of", "globex labs", "2024-07-01"),
    ]

    # ours: canonicalize batch1, then merge batch2 against the store
    e1, ed1 = canonicalize_kg(quintuples_df(spark, batch1), ATOM, emb)
    e2, ed2 = canonicalize_kg(quintuples_df(spark, batch2), ATOM, emb, e1, ed1)

    # reference: build kg1, then merge kg2's atomic facts against it
    def rows(batch, base_epoch):
        return [
            (r["fact"], base_epoch, [
                {k: r[k] for k in (
                    "subj_name", "subj_label", "pred", "obj_name", "obj_label",
                    "t_start", "t_end")}
            ])
            for r in batch
        ]

    kg1 = reference_build_kg(ref, rows(batch1, 1.7e9))
    kg2 = reference_build_kg(ref, rows(batch2, 1.75e9))
    matcher = ref.GraphMatcher()
    es, rs = matcher.match_entities_and_update_relationships(
        entities_1=kg2.entities,
        entities_2=kg1.entities,
        relationships_1=kg2.relationships,
        relationships_2=kg1.relationships,
        ent_threshold=0.8,
        rel_threshold=0.7,
    )
    merged = ref.KnowledgeGraph(entities=es, relationships=rs)

    precision, recall = pr(ref_triples(merged), spark_triples(ed2))
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}\n"
        f"ref={ref_triples(merged)}\nours={spark_triples(ed2)}"
    )


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)),
        min_size=0, max_size=60,
    ),
)
def test_near_dup_clusters_matches_union_find(spark, n_docs, raw_edges):
    """near_dup_clusters(pairs=...) computes exactly the connected-component
    partition an independent union-find computes, for arbitrary random pair
    graphs (self-loops and out-of-range ids filtered like the engine's
    threshold filter would)."""
    from itext2kg_spark.dedup.clusters import near_dup_clusters

    edges = [(a, b) for a, b in raw_edges if a != b and a < n_docs and b < n_docs]
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n_docs)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        pairs = pairs.where(F.col("id_a") != F.col("id_a"))  # empty

    got = {
        r["doc_id"]: r["rep_id"]
        for r in near_dup_clusters(docs, pairs=pairs).collect()
    }

    # independent reference: plain union-find with min-id representatives
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n_docs)}
    assert got == want
