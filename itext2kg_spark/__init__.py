"""itext2kg_spark — a PySpark-native incremental knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of AuvaLab/itext2kg (ATOM +
iText2KG) on the Spark DataFrame API:

    pages (url, warc_ts, html, text, lang)
      --distill (mapInPandas, byte-identical text per url)-->
    facts (url, obs_ts, fact_idx, fact)
      --extract (pandas UDF -> array<struct> -> explode)-->
    quintuples (subj, pred, obj, t_start, t_end) with lineage
      --embed (hash/pluggable pandas UDF over distinct strings)-->
      --similarity join + connected components canonicalization-->
    entities / edges canonical tables (incremental MERGE semantics)

Everything is DataFrame/Catalyst expressions except exactly three pandas/Arrow
UDF families (distill, extract, embed) plus the LSH-signature helper, mirroring
the reference's own UDF surface (LLM extraction + embedding calls).

Reference semantics are documented per-module with file:line citations into
/root/reference (read-only); no reference code is copied.
"""

from itext2kg_spark.config import MatchConfig, EmbedConfig, PipelineConfig

__version__ = "0.1.0"

__all__ = ["MatchConfig", "EmbedConfig", "PipelineConfig", "__version__"]
