from itext2kg_spark.functions.normalize import (
    norm_label,
    norm_name,
    norm_predicate,
    norm_label_star,
    norm_name_star,
    sanitize_storage_label,
    sanitize_storage_reltype,
)
from itext2kg_spark.functions.vectors import dot, l2_norm, cosine, unit
from itext2kg_spark.functions.timeparse import parse_timestamp_expr

__all__ = [
    "norm_label",
    "norm_name",
    "norm_predicate",
    "norm_label_star",
    "norm_name_star",
    "sanitize_storage_label",
    "sanitize_storage_reltype",
    "dot",
    "l2_norm",
    "cosine",
    "unit",
    "parse_timestamp_expr",
]
