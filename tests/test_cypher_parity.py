"""String-equality parity of the distributed cypher export against the LIVE
reference Neo4jStorage query builders (graph_integration/neo4j_storage.py
create_nodes:155-191 / create_relationships:193-246) on the same KG —
including full relationship-property SET clauses (embeddings, atomic_facts,
t_obs, t_start, t_end), quote escaping, list literals, and label/type
sanitization edge cases (empty, digit-leading, unicode, punctuation)."""

from __future__ import annotations

import numpy as np
import pytest

from itext2kg_spark.sources.export import (
    cypher_node_queries,
    cypher_relationship_queries,
    node_query,
    relationship_query,
)
from tests.ref_loader import get_reference, load_reference_neo4j_storage

# (name, label, embedding) — exercises escaping + every sanitize branch
ENTITIES = [
    ('john "jd" doe', "person", [0.5, -1.25]),
    ("9corp", "", [1.0, 0.0]),
    ("acme", "9-industry", [0.25, 0.75]),
    ("café", "café-lab", [0.125, 2.0]),
    ("no-embedding", "thing", None),
]

# (src, dst are (name, label)), pred, atomic_facts, t_obs, t_start, t_end, emb
RELS = [
    (
        ('john "jd" doe', "person"), ("9corp", ""), "works at!",
        ['joined "early"', "plain fact"], [1.5e9, 1580515200.0], [], [1.7e9],
        [0.5, 0.5],
    ),
    (
        ("acme", "9-industry"), ("café", "café-lab"), "123_funds",
        [], [1.6e9], [1.2e9, 1.3e9], [], None,
    ),
    (
        ("café", "café-lab"), ("no-embedding", "thing"), "",
        ["x"], [], [], [], None,
    ),
]


@pytest.fixture(scope="module")
def ref_built():
    """Reference-built query strings for the same KG."""
    storage = load_reference_neo4j_storage()
    ns = get_reference()
    if storage is None or ns is None:
        pytest.skip("reference neo4j storage not loadable")

    def mk_entity(name, label, emb):
        e = ns.Entity(name=name, label=label)
        e.properties.embeddings = (
            None if emb is None else np.asarray(emb, dtype=np.float32)
        )
        return e

    kg_entities = [mk_entity(*row) for row in ENTITIES]
    kg_rels = []
    for (sn, sl), (dn, dl), pred, facts, t_obs, t_start, t_end, emb in RELS:
        r = ns.Relationship(
            startEntity=ns.Entity(name=sn, label=sl),
            endEntity=ns.Entity(name=dn, label=dl),
            name=pred,
            properties=ns.RelationshipProperties(
                embeddings=None if emb is None else np.asarray(emb, np.float32),
                atomic_facts=list(facts),
                t_obs=[float(t) for t in t_obs],
                t_start=[float(t) for t in t_start],
                t_end=[float(t) for t in t_end],
            ),
        )
        kg_rels.append(r)
    kg = ns.KnowledgeGraph(entities=kg_entities, relationships=kg_rels)
    # the builders never use self; call unbound so no bolt connection happens
    node_qs = storage.create_nodes(None, kg)
    rel_qs = storage.create_relationships(None, kg)
    return node_qs, rel_qs


def test_node_query_parity(ref_built):
    ref_nodes, _ = ref_built
    ours = [node_query(label, name, emb) for name, label, emb in ENTITIES]
    assert ours == ref_nodes  # same order, byte-identical


def test_relationship_query_parity(ref_built):
    _, ref_rels = ref_built
    ours = [
        relationship_query(
            sl, sn, dl, dn, pred, emb, facts, t_obs, t_start, t_end
        )
        for (sn, sl), (dn, dl), pred, facts, t_obs, t_start, t_end, emb in RELS
    ]
    assert ours == ref_rels


def test_spark_export_parity(spark, ref_built):
    """The DISTRIBUTED path (pandas-UDF operators) emits the same strings."""
    ref_nodes, ref_rels = ref_built
    ents = spark.createDataFrame(
        [(n, l, e) for n, l, e in ENTITIES],
        "name string, label string, embedding array<float>",
    )
    got_nodes = [
        r["value"] for r in cypher_node_queries(ents).collect()
    ]
    assert sorted(got_nodes) == sorted(ref_nodes)

    rows = [
        (sn, sl, pred, dn, dl, [float(t) for t in t_obs],
         [float(t) for t in t_start], [float(t) for t in t_end],
         list(facts), emb)
        for (sn, sl), (dn, dl), pred, facts, t_obs, t_start, t_end, emb in RELS
    ]
    edges = spark.createDataFrame(
        rows,
        "src_name string, src_label string, pred string, dst_name string,"
        " dst_label string, t_obs array<double>, t_start array<double>,"
        " t_end array<double>, atomic_facts array<string>,"
        " embedding array<float>",
    )
    got_rels = [
        r["value"] for r in cypher_relationship_queries(edges).collect()
    ]
    assert sorted(got_rels) == sorted(ref_rels)
