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
    """L2-normalize so downstream cosine == dot (cheaper inside joins).

    The norm is bound ONCE per row as a lambda variable (outer transform
    over a one-element array) — substituting `l2_norm(a)` directly into the
    per-element lambda would re-evaluate the O(dim) aggregate for EVERY
    element (O(dim^2) interpreted ops per row; measured ~3s per 600x256
    table, ~50x the cost of the whole embed stage)."""
    return F.element_at(
        F.transform(
            F.array(l2_norm(a)),
            lambda n: F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a),
        ),
        1,
    )
