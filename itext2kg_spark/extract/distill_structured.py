"""Structured distillation (S2 core): documents -> user-declared nested
struct -> cross-document field-merge.

Reference front door: `DocumentsDistiller.distill(documents,
output_data_structure, IE_query)` runs one LLM structured-output call per
document coerced into the user's Pydantic schema, then combines the
per-document objects field-wise (documents_distiller/documents_distiller.py:
176-196; combine rules :96-139; user schemas itext2kg_star/models/schemas.py:
7-195 — website / Article / CV / Facts).

Spark mapping:
  * the user schema is a `StructType` (nested ArrayType/StructType allowed);
  * `distill_structured` wraps the (LLM or rule) extractor in ONE pandas UDF
    over Arrow batches of `text` and yields the nested struct column — the
    UDF batch is the API batch, like every extractor in this engine;
  * `combine_distilled` is the cross-document `__combine_objects` as one
    order-deterministic aggregation. Per-field rules (documents_distiller.py:
    96-139, mirrored exactly):
      - lists            -> extend in document order        (ArrayType)
      - strings          -> ' '.join of non-empty values    (StringType)
      - dicts            -> update(), later docs win per key (MapType)
      - everything else  -> last non-null value             (scalars, nested
                            StructType models — the reference's fallback
                            branch returns the last non-None)
    Document order is taken from `order_col` so the result equals the
    reference's sequential fold regardless of partitioning/shuffle order.

Scale shape: distillation is embarrassingly parallel (one UDF, no shuffle);
the combine is a single groupBy whose lists are bounded by documents-per-
group, with map-side partial aggregation for the collect_lists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# A ready-made Article-like schema (reference ArticleDescription,
# itext2kg_star/models/schemas.py:31-35: title + authors[name, affiliation]
# + abstract) — the shape every README distill example starts from.
ARTICLE_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField(
            "authors",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("affiliation", StringType()),
                    ]
                )
            ),
        ),
        StructField("abstract", StringType()),
    ]
)

# Facts schema (itext2kg_star/models/schemas.py:142-195): the distill shape
# that feeds atomic-fact extraction.
FACTS_SCHEMA = StructType([StructField("facts", ArrayType(StringType()))])


class ArticleRuleExtractor:
    """Deterministic rule extractor for the Article shape (test/bench/oracle
    stand-in for the LLM structured-output call).

    Parses a 'Title: ... Authors: name (aff); name2 (aff2). Abstract: ...'
    layout; absent sections yield None fields (the reference's model fields
    stay unset and are skipped by the combiner).
    """

    import re as _re

    _TITLE = _re.compile(r"Title:\s*(?P<v>.*?)(?=\s*Authors:|\s*Abstract:|$)", _re.S)
    _AUTHORS = _re.compile(r"Authors:\s*(?P<v>.*?)(?=\s*Abstract:|$)", _re.S)
    _ABSTRACT = _re.compile(r"Abstract:\s*(?P<v>.*)$", _re.S)
    _AUTHOR = _re.compile(r"\s*(?P<name>[^();]+?)\s*\((?P<aff>[^)]*)\)\s*")

    def __call__(self, texts: list[str]) -> list[dict]:
        out = []
        for t in texts:
            t = t or ""
            m_t = self._TITLE.search(t)
            m_a = self._AUTHORS.search(t)
            m_b = self._ABSTRACT.search(t)
            authors = None
            if m_a:
                authors = [
                    {"name": am.group("name"), "affiliation": am.group("aff")}
                    for am in self._AUTHOR.finditer(m_a.group("v"))
                ]
            out.append(
                {
                    "title": m_t.group("v").strip() if m_t else None,
                    "authors": authors,
                    "abstract": m_b.group("v").strip() if m_b else None,
                }
            )
        return out


class FactsRuleExtractor:
    """Sentence-split Facts distiller (deterministic stand-in for the Facts
    schema prompt, schemas.py:142-195)."""

    import re as _re

    _SENT = _re.compile(r"(?<=[.!?])\s+")

    def __call__(self, texts: list[str]) -> list[dict]:
        return [
            {
                "facts": [
                    s for s in (x.strip() for x in self._SENT.split(t or "")) if s
                ]
            }
            for t in texts
        ]


def distill_structured(
    docs: DataFrame,
    schema: StructType,
    extractor,
    text_col: str = "text",
    out_col: str = "distilled",
) -> DataFrame:
    """docs(text, ...) -> + `out_col` struct column per the user schema.

    `extractor(list[str]) -> list[dict]` runs once per Arrow batch (the API
    batch for an LLM-backed extractor, cf. langchain_output_parser.py:168-221
    batching); dict keys match the schema's top-level fields.
    """
    cols = list(docs.columns)
    out_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in docs.schema.fields]
        + [StructField(out_col, schema, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = extractor(pdf[text_col].tolist())
            out = pdf[cols].copy()
            out[out_col] = [
                {f.name: v.get(f.name) for f in schema.fields}
                if v is not None
                else None
                for v in vals
            ]
            yield out

    return docs.mapInPandas(run, schema=out_schema)


def _ordered_values(c: str, order_col: str) -> Column:
    """Array of the field's values in document order (nulls kept for now).

    Sorted with an explicit comparator on the order key only — struct-wide
    ordering would reject unorderable value types (MapType)."""
    cmp = lambda left, right: (  # noqa: E731
        F.when(left["o"] < right["o"], -1)
        .when(left["o"] > right["o"], 1)
        .otherwise(0)
    )
    return F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(order_col).alias("o"), F.col(c).alias("v"))
            ),
            cmp,
        ),
        lambda s: s["v"],
    )


def _combine_expr(field: StructField, order_col: str) -> Column:
    """One field's combine aggregation, per the reference's merge rules."""
    c, t = field.name, field.dataType
    vals = _ordered_values(c, order_col)
    nonnull = F.filter(vals, lambda x: x.isNotNull())
    if isinstance(t, ArrayType):
        # lists extend in document order (collect_list drops null lists like
        # the reference drops None values)
        return F.flatten(nonnull).alias(c)
    if isinstance(t, StringType):
        # ' '.join(str(v) for v in values if v) — empty strings skipped
        return F.array_join(
            F.filter(nonnull, lambda x: x != F.lit("")), " "
        ).alias(c)
    if isinstance(t, MapType):
        # dict.update fold: later documents win per key
        empty = F.map_from_arrays(
            F.array().cast(ArrayType(t.keyType)),
            F.array().cast(ArrayType(t.valueType)),
        )
        return F.aggregate(
            nonnull,
            empty,
            lambda acc, m: F.map_concat(
                F.map_filter(
                    acc, lambda k, _: ~F.array_contains(F.map_keys(m), k)
                ),
                m,
            ),
        ).alias(c)
    # scalars and nested struct models: last non-None
    return F.element_at(F.reverse(nonnull), 1).alias(c)


def combine_distilled(
    distilled: DataFrame,
    schema: StructType,
    group_col: str | Column,
    order_col: str,
    out_col: str = "distilled",
) -> DataFrame:
    """Cross-document combine: one row per group with the schema's fields
    merged per the reference rules, deterministically ordered by `order_col`
    (the reference folds documents in list order)."""
    flat = distilled.select(
        (F.col(group_col) if isinstance(group_col, str) else group_col).alias(
            "__grp"
        ),
        F.col(order_col).alias("__ord"),
        *[F.col(f"{out_col}.{f.name}").alias(f.name) for f in schema.fields],
    )
    aggs = [_combine_expr(f, "__ord") for f in schema.fields]
    return (
        flat.groupBy("__grp")
        .agg(*aggs, F.count("*").alias("n_docs"))
        .withColumnRenamed("__grp", "group_id")
    )


def facts_from_distilled(
    distilled: DataFrame, out_col: str = "distilled"
) -> DataFrame:
    """Facts-schema distillation -> one row per atomic fact with positional
    lineage, the E6 entry point of the extraction pipeline."""
    return distilled.select(
        *[c for c in distilled.columns if c != out_col],
        F.posexplode(F.col(f"{out_col}.facts")).alias("fact_idx", "fact"),
    )
