"""Shared helpers: build quintuple DataFrames for merge tests, and drive the
REFERENCE pipeline (loaded from /root/reference via ref_loader) on identical
inputs for differential comparison.

The reference driver below reproduces the flow of `Atom.build_graph`
(atom/atom.py:155-209) using the reference's own classes and matcher — embed
entities with the shared deterministic hash embedding (weights 0.8/0.2,
knowledge_graph.py:29-43), split into atomic KGs, stamp facts/t_obs, pairwise
binary-tree merge (atom/atom.py:55-84, sequential order) — so both systems see
the same vector space and the same inputs.
"""

from __future__ import annotations

from dateutil import parser as dparser

from itext2kg_spark.extract.embed import hash_embed_texts

QUINTUPLE_COLS = [
    "url",
    "obs_ts",
    "lang",
    "fact_idx",
    "fact",
    "subj_name",
    "subj_label",
    "pred",
    "obj_name",
    "obj_label",
    "t_start",
    "t_end",
]

QUINTUPLE_DDL = (
    "url string, obs_ts timestamp, lang string, fact_idx int, fact string,"
    " subj_name string, subj_label string, pred string, obj_name string,"
    " obj_label string, t_start array<string>, t_end array<string>"
)


def quintuples_df(spark, rows):
    """rows: list of dicts with QUINTUPLE_COLS keys (obs_ts as datetime)."""
    data = [tuple(r.get(c) for c in QUINTUPLE_COLS) for r in rows]
    return spark.createDataFrame(data, QUINTUPLE_DDL)


# ---------------------------------------------------------------------------
# Reference-side driver
# ---------------------------------------------------------------------------

def _embed_entity(ref, name, label, dim=256, seed=42, w_name=0.8, w_label=0.2):
    e = ref.Entity(name=name, label=label)
    e.process()
    mat = hash_embed_texts([e.name, e.label], dim=dim, seed=seed)
    e.properties.embeddings = w_name * mat[0] + w_label * mat[1]
    return e


def reference_build_kg(
    ref,
    fact_rows,
    ent_threshold=0.8,
    rel_threshold=0.7,
    dim=256,
    seed=42,
):
    """fact_rows: list of (fact_text, obs_ts_epoch, [quintuple dicts]).

    Returns the reference KnowledgeGraph after atomic-KG build + binary-tree
    pairwise merge, mirroring Atom.build_graph with the LLM replaced by the
    supplied quintuples and the embedder by the shared hash embedding.
    """
    from tests.ref_loader import get_reference  # noqa - callers pass ref

    atomic_kgs = []
    for fact_text, obs_epoch, quints in fact_rows:
        rels = []
        ents = {}
        for qd in quints:
            s = _embed_entity(ref, qd["subj_name"], qd["subj_label"], dim, seed)
            o = _embed_entity(ref, qd["obj_name"], qd["obj_label"], dim, seed)
            s = ents.setdefault((s.name, s.label), s)
            o = ents.setdefault((o.name, o.label), o)

            def _parse(lst):
                out = []
                for ts in lst or []:
                    try:
                        out.append(dparser.parse(ts).timestamp())
                    except Exception:
                        continue
                return out

            r = ref.Relationship(
                name=qd["pred"],
                startEntity=s,
                endEntity=o,
                properties=ref.RelationshipProperties(
                    t_start=_parse(qd.get("t_start")),
                    t_end=_parse(qd.get("t_end")),
                ),
            )
            r.process()
            r.properties.embeddings = hash_embed_texts([r.name], dim=dim, seed=seed)[0]
            rels.append(r)
        kg = ref.KnowledgeGraph(entities=list(ents.values()), relationships=rels)
        # per-fact provenance + per-fact t_obs (our engine stamps per mention)
        kg.add_atomic_facts_to_relationships(atomic_facts=[fact_text])
        kg.add_t_obs_to_relationships(t_obs=[float(obs_epoch)])
        # intra-fact dedup via split + pairwise merge, as in
        # build_atomic_kg_from_quintuples (atom/atom.py:144-153)
        for akg in kg.split_into_atomic_kgs():
            atomic_kgs.append(akg)

    atomic_kgs = [k for k in atomic_kgs if k.relationships]
    if not atomic_kgs:
        return ref.KnowledgeGraph()

    matcher = ref.GraphMatcher()

    def merge_two(kg1, kg2):
        es, rs = matcher.match_entities_and_update_relationships(
            entities_2=kg1.entities,
            relationships_2=kg1.relationships,
            entities_1=kg2.entities,
            relationships_1=kg2.relationships,
            rel_threshold=rel_threshold,
            ent_threshold=ent_threshold,
        )
        return ref.KnowledgeGraph(entities=es, relationships=rs)

    current = atomic_kgs
    while len(current) > 1:
        nxt = [
            merge_two(current[i], current[i + 1])
            for i in range(0, len(current) - 1, 2)
        ]
        if len(current) % 2 == 1:
            nxt.append(current[-1])
        current = nxt
    return current[0]


def ref_triples(kg) -> list[tuple]:
    return sorted(
        (
            r.startEntity.name,
            r.startEntity.label,
            r.name,
            r.endEntity.name,
            r.endEntity.label,
        )
        for r in kg.relationships
    )


def spark_triples(edges_df) -> list[tuple]:
    return sorted(
        (r["src_name"], r["src_label"], r["pred"], r["dst_name"], r["dst_label"])
        for r in edges_df.select(
            "src_name", "src_label", "pred", "dst_name", "dst_label"
        ).collect()
    )


def pr(reference: list[tuple], ours: list[tuple]) -> tuple[float, float]:
    """Set precision/recall of our triples vs the reference's.

    Sets, not multisets: the reference can emit duplicate (src,pred,dst)
    objects when endpoints become identical only AFTER remapping (its
    full-identity dedup runs before the endpoint rewrite,
    matcher.py:155-170 vs :204-226), and its own persistence layer collapses
    them via Cypher MERGE (neo4j_storage.py:193-246) — as our groupBy does."""
    sr, so = set(reference), set(ours)
    inter = len(sr & so)
    precision = inter / max(len(so), 1)
    recall = inter / max(len(sr), 1)
    return precision, recall
