from itext2kg_spark.sources.pages import synth_pages, PAGES_SCHEMA
from itext2kg_spark.sources.store import KGStore

__all__ = ["synth_pages", "PAGES_SCHEMA", "KGStore"]
