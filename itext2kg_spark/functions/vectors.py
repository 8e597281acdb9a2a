"""Dense-vector expressions over `array<float>` columns — pure Catalyst.

The reference computes cosine similarity with sklearn matrix ops on the driver
(atom/graph_matching/matcher.py:68-74). Here vectors live in columns; pairwise
cosine inside joins is expressed with `zip_with` + `aggregate` so it runs in
whole-stage codegen — no Python worker round-trip for the scoring hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe-ish (0-norm vectors yield null)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit(a: Column) -> Column:
    """L2-normalize so downstream cosine == dot (cheaper inside joins)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)
