"""Atomic-fact decomposition (E6, ATOM Module-1).

The reference uses an LLM to split paragraphs into atomic, decontextualized,
absolute-dated factoids (atom/models/schemas.py:46-105; README.md:79 chunks at
<400 tokens). Our deterministic stand-in splits on sentence boundaries with a
pure Catalyst regex — one row per factoid with (url, fact_idx) lineage kept by
`posexplode`, exactly the provenance the merge stage later stamps onto edges
(atom/atom.py:181-183).

An LLM-backed splitter would replace `F.split` with a pandas UDF of signature
text -> array<string>; the explode/lineage plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENTENCE_SPLIT = r"(?<=[.!?])\s+"


def split_atomic_facts(distilled: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, obs_ts, lang, text) -> (url, obs_ts, lang, fact_idx, fact)."""
    facts = F.filter(
        F.transform(F.split(F.col(text_col), _SENTENCE_SPLIT), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return (
        distilled.withColumn("__facts", facts)
        .select(
            "url",
            "obs_ts",
            "lang",
            F.posexplode("__facts").alias("fact_idx", "fact"),
        )
    )
