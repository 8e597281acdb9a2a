"""S2 structured distillation: user-schema struct extraction + cross-document
field-merge, with live parity against the reference's
DocumentsDistiller.__combine_objects (documents_distiller.py:20-139)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from itext2kg_spark.extract.distill_structured import (
    ARTICLE_SCHEMA,
    FACTS_SCHEMA,
    ArticleRuleExtractor,
    FactsRuleExtractor,
    combine_distilled,
    distill_structured,
    facts_from_distilled,
)
from tests.ref_loader import load_reference_distiller

DOCS = [
    (0, "Title: Spark KG Authors: Ada Lovelace (Analytical Engines); "
        "Alan Turing (Bletchley) Abstract: We build graphs."),
    (1, "Authors: Grace Hopper (Navy) Abstract: More results."),
    (2, "Title: Spark KG v2 Abstract: Final remarks."),
]


def _distilled(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return distill_structured(docs, ARTICLE_SCHEMA, ArticleRuleExtractor())


def test_distill_struct_column(spark):
    rows = {r["doc_id"]: r["distilled"] for r in _distilled(spark).collect()}
    assert rows[0]["title"] == "Spark KG"
    assert [a["name"] for a in rows[0]["authors"]] == ["Ada Lovelace", "Alan Turing"]
    assert rows[0]["authors"][1]["affiliation"] == "Bletchley"
    assert rows[1]["title"] is None
    assert rows[2]["authors"] is None  # no Authors: section -> unset field
    assert rows[2]["abstract"] == "Final remarks."


def test_combine_matches_reference_rules(spark):
    out = combine_distilled(
        _distilled(spark), ARTICLE_SCHEMA, F.lit(1), order_col="doc_id"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # strings: ' '.join of non-empty in doc order
    assert r["title"] == "Spark KG Spark KG v2"
    assert r["abstract"] == "We build graphs. More results. Final remarks."
    # lists: extend in doc order
    assert [a["name"] for a in r["authors"]] == [
        "Ada Lovelace", "Alan Turing", "Grace Hopper",
    ]
    assert r["n_docs"] == 3


def test_combine_live_parity_vs_reference(spark):
    """Run the REFERENCE __combine_objects on pydantic objects carrying the
    same values and compare field-by-field: lists extend, strings concat,
    dicts update (later wins), scalars last-non-null."""
    DD = load_reference_distiller()
    if DD is None:
        pytest.skip("reference distiller not loadable")
    from pydantic import BaseModel

    class Doc(BaseModel):
        tags: list = []
        summary: str = ""
        meta: dict = {}
        score: int | None = None

    objs = [
        Doc(tags=["a", "b"], summary="first part", meta={"k": "1", "x": "0"}, score=3),
        Doc(tags=[], summary="", meta={"k": "2"}, score=None),
        Doc(tags=["c"], summary="last part", meta={"y": "9"}, score=7),
    ]
    expected = DD._DocumentsDistiller__combine_objects(list(objs))

    schema = StructType(
        [
            StructField("tags", ArrayType(StringType())),
            StructField("summary", StringType()),
            StructField("meta", MapType(StringType(), StringType())),
            StructField("score", IntegerType()),
        ]
    )
    rows = [
        (i, o.tags, o.summary, o.meta, o.score) for i, o in enumerate(objs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, tags array<string>, summary string,"
        " meta map<string,string>, score int",
    ).select(
        "doc_id",
        F.struct("tags", "summary", "meta", "score").alias("distilled"),
    )
    got = combine_distilled(df, schema, F.lit(0), order_col="doc_id").collect()[0]

    assert got["tags"] == expected.tags
    assert got["summary"] == expected.summary
    assert dict(got["meta"]) == expected.meta
    assert got["score"] == expected.score


def test_combine_scalar_last_nonnull_and_nested_struct(spark):
    """Nested struct models take the reference's fallback branch: last
    non-None wins (documents_distiller.py:137-139)."""
    schema = StructType(
        [
            StructField(
                "best",
                StructType(
                    [StructField("name", StringType()), StructField("v", IntegerType())]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(0, ("x", 1)), (1, ("y", 2)), (2, None)],
        "doc_id long, best struct<name:string, v:int>",
    ).select("doc_id", F.struct("best").alias("distilled"))
    got = combine_distilled(df, schema, F.lit(0), order_col="doc_id").collect()[0]
    assert got["best"]["name"] == "y" and got["best"]["v"] == 2


def test_facts_distill_feeds_extraction(spark):
    docs = spark.createDataFrame(
        [(0, "A is here. B follows! C ends?"), (1, "")],
        "doc_id long, text string",
    )
    d = distill_structured(docs, FACTS_SCHEMA, FactsRuleExtractor())
    facts = facts_from_distilled(d)
    rows = [(r["doc_id"], r["fact_idx"], r["fact"]) for r in facts.collect()]
    assert sorted(rows) == [
        (0, 0, "A is here."),
        (0, 1, "B follows!"),
        (0, 2, "C ends?"),
    ]
