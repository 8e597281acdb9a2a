from itext2kg_spark.extract.embed import HashEmbedder, hash_embed_texts, with_embedding
from itext2kg_spark.extract.distill import distill_pages, synth_html
from itext2kg_spark.extract.facts import split_atomic_facts
from itext2kg_spark.extract.quintuples import (
    GrammarExtractor,
    TokenTripleExtractor,
    extract_quintuples,
    QUINTUPLE_SCHEMA,
)

__all__ = [
    "HashEmbedder",
    "hash_embed_texts",
    "with_embedding",
    "distill_pages",
    "synth_html",
    "split_atomic_facts",
    "GrammarExtractor",
    "TokenTripleExtractor",
    "extract_quintuples",
    "QUINTUPLE_SCHEMA",
]
