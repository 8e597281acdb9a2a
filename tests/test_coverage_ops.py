"""Coverage tests for the remaining SURVEY §2 operators: Cypher export (S3),
embedding cache (S6), entity extraction + retry (E2/E7), merge-quality eval
(J8/A9), distill field-merge (A8)."""

import glob

import pyspark.sql.functions as F
import pytest

from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.extract.entities import (
    RetryingExtractor,
    RuleEntityExtractor,
    extract_entities,
)
from itext2kg_spark.merge.evaluation import (
    distill_field_merge,
    kg_count_metrics,
    residual_duplicate_pairs,
)
from itext2kg_spark.sources.export import (
    EmbeddingCache,
    cypher_export,
    embedding_to_string,
    string_to_embedding,
)

EMB = HashEmbedder(32, 5)


def test_cypher_export_shapes(spark, tmp_path):
    ents = spark.createDataFrame(
        [("john doe", "person", [0.5, 0.25]), ("9corp", "", [1.0, 0.0])],
        "name string, label string, embedding array<float>",
    )
    edges = spark.createDataFrame(
        [("john doe", "person", "works_at", "9corp", "", [1.5e9])],
        "src_name string, src_label string, pred string,"
        " dst_name string, dst_label string, t_obs array<double>",
    )
    out = str(tmp_path / "cypher")
    cypher_export(ents, edges, out)
    nodes = sorted(
        line
        for f in glob.glob(f"{out}/nodes/part-*")
        for line in open(f).read().splitlines()
    )
    assert any('MERGE (n:person {name: "john doe"})' in l for l in nodes)
    # storage sanitization parity: empty label -> Entity
    assert any('MERGE (n:Entity {name: "9corp"})' in l for l in nodes)
    rels = [
        line
        for f in glob.glob(f"{out}/relationships/part-*")
        for line in open(f).read().splitlines()
    ]
    assert any("MERGE (n)-[r:works_at]->(m)" in l for l in rels)
    # every RelationshipProperties field is SET on both MERGE branches
    assert any("ON CREATE SET r.embeddings" in l and "ON MATCH SET" in l
               and "r.atomic_facts = []" in l and "r.t_obs = [1500000000.0]" in l
               and "r.t_start = []" in l and "r.t_end = []" in l for l in rels)


def test_embedding_string_codec_roundtrip(spark):
    df = spark.createDataFrame([([0.5, -1.25, 3.0],)], "e array<float>")
    rt = df.select(
        string_to_embedding(embedding_to_string(F.col("e"))).alias("r")
    ).collect()[0]["r"]
    assert rt == [0.5, -1.25, 3.0]


def test_embedding_cache(spark, tmp_path):
    cache = EmbeddingCache(str(tmp_path / "embcache"))
    t1 = spark.createDataFrame([("alpha",), ("beta",)], ["text"])
    out1 = cache.lookup_and_update(t1, EMB)
    assert out1.count() == 2
    # second call: one hit, one miss; cache grows to 3 distinct
    t2 = spark.createDataFrame([("alpha",), ("gamma",)], ["text"])
    out2 = cache.lookup_and_update(t2, EMB)
    assert out2.count() == 2
    cached = spark.read.parquet(cache.path)
    assert cached.select("text").distinct().count() == 3
    # identical embedding for the cached string across calls
    e1 = {r["text"]: list(r["embedding"]) for r in out1.collect()}
    e2 = {r["text"]: list(r["embedding"]) for r in out2.collect()}
    assert e1["alpha"] == e2["alpha"]


def test_entity_extraction_rule(spark):
    docs = spark.createDataFrame(
        [(0, "Jane Smith leads Acme Corp since June. Then Bob visited Paris.")],
        "id long, text string",
    )
    ents = {(r["name"], r["label"]) for r in extract_entities(docs).collect()}
    assert ("Jane Smith", "Person") in ents
    assert ("Acme Corp", "Company") in ents
    assert ("Paris", "Entity") in ents


def test_retrying_extractor_gives_up_to_empty():
    class Flaky:
        def __init__(self, fail_times):
            self.n = fail_times

        def extract(self, x):
            if self.n > 0:
                self.n -= 1
                raise ValueError("malformed")
            return [{"ok": x}]

    assert RetryingExtractor(Flaky(2), max_tries=3).extract("a") == [{"ok": "a"}]
    assert RetryingExtractor(Flaky(5), max_tries=3).extract("a") == []


def test_residual_duplicates_and_counts(spark):
    texts = ["acme corp", "acme corp inc", "zeta zebra", "unrelated thing"]
    mat = EMB(texts)
    ents = spark.createDataFrame(
        [(t, "company", [float(x) for x in mat[i]]) for i, t in enumerate(texts)],
        "name string, label string, embedding array<float>",
    )
    pairs = residual_duplicate_pairs(ents, 0.8, method="broadcast").collect()
    assert len(pairs) == 1  # only the acme variants survive as near-dups
    edges = spark.createDataFrame(
        [("acme corp", "company", "acquired", "zeta zebra", "company")],
        "src_name string, src_label string, pred string, dst_name string, dst_label string",
    )
    m = kg_count_metrics(ents, edges).collect()[0]
    assert m["n_entities"] == 4 and m["n_edges"] == 1 and m["n_preds"] == 1


def test_distill_field_merge(spark):
    df = spark.createDataFrame(
        [
            ("d1", ["a"], "intro", 1),
            ("d1", ["b", "c"], "more", None),
            ("d2", [], "solo", 7),
        ],
        "doc string, facts array<string>, summary string, score int",
    )
    out = {
        r["doc"]: r
        for r in distill_field_merge(
            df, "doc", list_cols=["facts"], str_cols=["summary"], scalar_cols=["score"]
        ).collect()
    }
    assert out["d1"]["facts"] == ["a", "b", "c"]
    assert out["d1"]["summary"] == "intro more"
    assert out["d1"]["score"] == 1
    assert out["d2"]["summary"] == "solo"
