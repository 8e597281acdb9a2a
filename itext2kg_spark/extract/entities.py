"""Legacy entity extraction (E2) and the in-UDF retry wrapper (E7).

The reference's `iEntitiesExtractor.extract_entities` is an LLM structured
call per section returning `EntitiesExtractor{entities: [{label, name}]}` with
up to `max_tries` retries on malformed output (itext2kg_star/
ientities_extraction/ientities_extractor.py:25-85). Spark mapping: a pandas
UDF text -> array<struct<name,label>> + explode; retries live inside the UDF
(per batch element), and rows whose extraction still fails emit an empty
array that explode drops — a dropped-row metric is the pre/post count delta
(E7 disposition per SURVEY.md §2.2).

The deterministic stand-in recognizes Capitalized Token Spans as entities
(label heuristic: span followed by a role keyword -> Person, suffix-matched
corp/inc/labs etc -> Company, else Entity).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

ENTITY_SCHEMA = ArrayType(
    StructType(
        [StructField("name", StringType()), StructField("label", StringType())]
    )
)

_SPAN = re.compile(r"\b([A-Z][a-zA-Z]*(?: [A-Z][a-zA-Z]*)*)\b")
_ORG_SUFFIX = re.compile(r"(corp|inc|labs|industries|systems|dynamics|holdings|networks|media|energy|logistics)$", re.I)


class RuleEntityExtractor:
    def extract(self, text: str) -> list[dict]:
        if not text:
            return []
        out = []
        for m in _SPAN.finditer(text):
            name = m.group(1)
            label = "Company" if _ORG_SUFFIX.search(name) else (
                "Person" if len(name.split()) >= 2 else "Entity"
            )
            out.append({"name": name, "label": label})
        return out

    def udf(self):
        extract = self.extract

        @F.pandas_udf(ENTITY_SCHEMA)
        def _extract(texts: pd.Series) -> pd.Series:
            return pd.Series([extract(t) for t in texts.tolist()])

        return _extract


class RetryingExtractor:
    """E7: bounded retry around a flaky extract fn; [] after max_tries.

    Wraps any object with .extract(...) — the reference retries the LLM call
    `while tries < max_tries` and gives up silently (ientities_extractor.py:
    54-70); poison inputs become empty arrays which explode drops.
    """

    def __init__(self, inner, max_tries: int = 3):
        self.inner = inner
        self.max_tries = max_tries

    def extract(self, *args):
        for _ in range(self.max_tries):
            try:
                return self.inner.extract(*args)
            except Exception:
                continue
        return []

    def udf(self):
        # mirror the wrapped extractor's UDF shape via a generic dispatcher
        extract = self.extract
        import pandas as pd  # noqa

        schema = getattr(self.inner, "SCHEMA", None)
        if schema is None:
            from itext2kg_spark.extract.quintuples import QUINTUPLE_SCHEMA

            schema = QUINTUPLE_SCHEMA

        @F.pandas_udf(schema)
        def _extract(*cols) -> pd.Series:
            rows = zip(*[c.tolist() for c in cols])
            return pd.Series([extract(*r) for r in rows])

        return _extract


def extract_entities(sections: DataFrame, text_col: str = "text", extractor=None) -> DataFrame:
    """sections(..., text) -> one row per extracted entity (E2 + explode)."""
    extractor = extractor or RuleEntityExtractor()
    udf = extractor.udf()
    return sections.withColumn("__e", F.explode(udf(F.col(text_col)))).select(
        *sections.columns, F.col("__e.name").alias("name"), F.col("__e.label").alias("label")
    )
