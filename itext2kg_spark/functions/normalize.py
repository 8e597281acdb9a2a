"""Normalization as pure Catalyst expressions (whole-stage-codegen'd, no Python).

Parity targets (reference file:line, semantics re-derived, not copied):

* ATOM entity normalize — `Entity.process` (itext2kg/atom/models/entity.py:30-38):
    label: regex `[^a-zA-Z0-9]+` -> "_", then `.replace("&","and")`, then lower.
    NOTE: the `&` replacement is a no-op in the reference because the regex has
    already rewritten every `&` to `_`; we reproduce the *net* behavior.
    name: lower, runs of `[_"\\-]+` -> single space, strip.
* ATOM relation normalize — `Relationship.process`
  (itext2kg/atom/models/relationship.py:34-36): same as label.
* star/legacy variant — `Entity.process` / `Relationship.process`
  (itext2kg/itext2kg_star/models/knowledge_graph.py:23-26, :58-60):
    label: per-char `[^a-zA-Z0-9]` -> "_" (no run-collapsing, NOT lowercased),
    then `&` -> "and" — also a net no-op, every `&` already became `_`.
    name: lower; each of `_`, `-`, `"` -> a space (per char); strip.
* storage sanitization — `Neo4jStorage.sanitize_label` /
  `sanitize_relationship_type` (itext2kg/graph_integration/neo4j_storage.py:
  267-321): keep alnum+underscore, prefix `L`/`R` when digit-leading,
  defaults Entity / RELATES_TO.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex; identical character classes to the reference's Python patterns.
LABEL_PATTERN = r"[^a-zA-Z0-9]+"
NAME_PATTERN = r"[_\"\-]+"
LABEL_PATTERN_STAR = r"[^a-zA-Z0-9]"  # per-char, no run collapsing

# Python str.strip() strips everything str.isspace() considers whitespace:
# the Unicode White_Space property PLUS the information separators
# \x1c-\x1f. Spark's trim() strips ASCII space only — found by the
# hypothesis parity fuzzer on '\x1f'. This class reproduces Python exactly.
_PYSTRIP = r"[\p{IsWhite_Space}\x1c-\x1f]"


def _pystrip(col: Column) -> Column:
    return F.regexp_replace(col, f"^{_PYSTRIP}+|{_PYSTRIP}+$", "")


def norm_label(col: Column) -> Column:
    """ATOM label/predicate normalization: non-alnum runs -> '_', lowercase."""
    return F.lower(F.regexp_replace(col, LABEL_PATTERN, "_"))


def norm_name(col: Column) -> Column:
    """ATOM name normalization: lowercase, `[_"-]+` runs -> space, strip."""
    return _pystrip(F.regexp_replace(F.lower(col), NAME_PATTERN, " "))


# Relation names share the label rule (relationship.py:34-36).
norm_predicate = norm_label


def norm_label_star(col: Column) -> Column:
    """star/legacy label rule: per-char non-alnum -> '_', case preserved."""
    return F.regexp_replace(col, LABEL_PATTERN_STAR, "_")


def norm_name_star(col: Column) -> Column:
    """star/legacy name rule: lowercase; each `_`/`-`/`"` char -> one space."""
    return _pystrip(F.regexp_replace(F.lower(col), r"[_\"\-]", " "))


def sanitize_storage_label(col: Column) -> Column:
    """Graph-store label sanitization (Neo4j-compliant in the reference)."""
    kept = F.regexp_replace(col, r"[^a-zA-Z0-9_]", "")
    prefixed = F.when(kept.rlike(r"^[0-9]"), F.concat(F.lit("L"), kept)).otherwise(kept)
    return F.when(F.coalesce(prefixed, F.lit("")) == "", F.lit("Entity")).otherwise(prefixed)


def sanitize_storage_reltype(col: Column) -> Column:
    kept = F.regexp_replace(col, r"[^a-zA-Z0-9_]", "")
    prefixed = F.when(kept.rlike(r"^[0-9]"), F.concat(F.lit("R"), kept)).otherwise(kept)
    return F.when(F.coalesce(prefixed, F.lit("")) == "", F.lit("RELATES_TO")).otherwise(prefixed)
