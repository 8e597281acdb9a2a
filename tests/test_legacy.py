"""Legacy/star-mode operators: endpoint snapping (J7), isolation anti-join
(F3), star normalization parity (P3), star-mode pipeline config."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from itext2kg_spark.config import STAR
from itext2kg_spark.extract.embed import HashEmbedder
from itext2kg_spark.functions.normalize import norm_label_star, norm_name_star
from itext2kg_spark.merge.kg import canonicalize_kg
from itext2kg_spark.merge.legacy import find_isolated_entities, snap_endpoints
from tests.kg_helpers import quintuples_df
from tests.ref_loader import REF

EMB = HashEmbedder(256, 42)


def _load_star_entity():
    """Load the star Entity class from the reference for P3 parity."""
    import importlib.util
    import sys
    import types

    name = "ref_star_kg"
    if name in sys.modules:
        return sys.modules[name].Entity
    spec = importlib.util.spec_from_file_location(
        name, f"{REF}/itext2kg_star/models/knowledge_graph.py"
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    except Exception:
        del sys.modules[name]
        return None
    return mod.Entity


def test_star_normalization_parity(spark):
    Entity = _load_star_entity()
    if Entity is None:
        pytest.skip("star reference module not loadable")
    vals = ["Quantum Computing", "R&D-dept", "UP_PER", 'quo"ted', "a.b.c", ""]
    expected_names, expected_labels = [], []
    for v in vals:
        e = Entity(name=v, label=v)
        e.process()
        expected_names.append(e.name)
        expected_labels.append(e.label)
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got_n = [r["n"] for r in df.select(norm_name_star(F.col("s")).alias("n")).collect()]
    got_l = [r["l"] for r in df.select(norm_label_star(F.col("s")).alias("l")).collect()]
    assert got_n == expected_names
    assert got_l == expected_labels


def test_snap_endpoints(spark):
    endpoints = spark.createDataFrame(
        [("google",), ("big google",), ("zzz qqq",)], ["name"]
    )
    allowed = spark.createDataFrame(
        [("google",), ("big google inc",), ("apple",)], ["name"]
    )
    out = {r["name"]: r["snapped_name"] for r in
           snap_endpoints(endpoints, allowed, EMB, threshold=0.5).collect()}
    assert out["google"] == "google"               # exact pass-through
    assert out["big google"] == "big google inc"   # cos ~0.82 >= 0.5 -> snapped
    assert out["zzz qqq"] == "zzz qqq"             # nothing close -> kept


def test_find_isolated_entities(spark):
    ents = spark.createDataFrame(
        [("a", "person"), ("b", "company"), ("lonely", "person")],
        ["name", "label"],
    )
    edges = spark.createDataFrame(
        [("a", "person", "works_at", "b", "company")],
        ["src_name", "src_label", "pred", "dst_name", "dst_label"],
    )
    iso = find_isolated_entities(ents, edges).collect()
    assert [(r["name"], r["label"]) for r in iso] == [("lonely", "person")]


def test_star_mode_pipeline(spark):
    rows = [
        {
            "url": "u1", "obs_ts": datetime(2025, 1, 1), "lang": "en",
            "fact_idx": 0, "fact": "f1",
            "subj_name": "John_Doe", "subj_label": "Person",
            "pred": "works at", "obj_name": "Google", "obj_label": "Company",
            "t_start": [], "t_end": [],
        },
    ]
    ents, edges = canonicalize_kg(quintuples_df(spark, rows), STAR, EMB)
    names = {(r["name"], r["label"]) for r in ents.collect()}
    # star label rule preserves case, per-char underscore; name lowers + spaces
    assert ("john doe", "Person") in names
    assert ("google", "Company") in names
    e = edges.collect()[0]
    assert e["pred"] == "works_at"  # star relation rule: per-char '_'
