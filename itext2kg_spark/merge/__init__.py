from itext2kg_spark.merge.candidates import candidate_pairs, lsh_signatures_udf
from itext2kg_spark.merge.components import connected_components
from itext2kg_spark.merge.resolve import resolve_items
from itext2kg_spark.merge.kg import canonicalize_kg, EDGE_GROUP_KEYS

__all__ = [
    "candidate_pairs",
    "lsh_signatures_udf",
    "connected_components",
    "resolve_items",
    "canonicalize_kg",
    "EDGE_GROUP_KEYS",
]
