"""Legacy iText2KG / iText2KG_Star operators (E3/E4/F3 analogs, J6/J7).

The legacy pipeline extracts entities and relations separately per section
(itext2kg/itext2kg_star/itext2kg.py:36-121) with two repair loops this module
re-expresses set-based:

* `snap_endpoints` (J7) — invented-entity repair: relation endpoints that are
  not in the section's extracted entity set are snapped to their most-similar
  allowed entity at threshold 0.5, else kept as themselves
  (irelations_extractor.py:101-154 — embed hallucinated endpoint, cosine vs
  section entities, replace if >= 0.5, coalesce fallback to self).
* `find_isolated_entities` (F3) — entities with no incident edge
  (itext2kg_star/models/knowledge_graph.py:157-160 / atom knowledge_graph.py:
  80-83) as one LEFT ANTI join. The reference re-prompts the LLM for these
  (E4, irelations_extractor.py:163-216); here the operator returns the set —
  an extraction re-run on the isolated subset is a bounded driver loop around
  the extraction UDF.

Star-mode matching semantics (strict `>` threshold, 0.6/0.4 weights,
per-char label normalization) are covered by `PipelineConfig` STAR +
`norm_*_star` in functions.normalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itext2kg_spark.functions.vectors import dot, unit


def snap_endpoints(
    endpoints: DataFrame,
    allowed: DataFrame,
    embedder,
    threshold: float = 0.5,
    name_col: str = "name",
) -> DataFrame:
    """endpoints(name, ...) -> + snapped_name.

    Endpoints exactly present in `allowed(name)` keep their name; others are
    embedded and snapped to the best-cosine allowed name when sim >= threshold
    (the reference uses >=, irelations_extractor.py:140-148), else kept.
    `allowed` is broadcast — it is one section's entity set, always small.
    """
    from itext2kg_spark.extract.embed import with_embedding

    allowed_names = allowed.select(F.col(name_col).alias("__allowed")).distinct()
    exact = endpoints.join(
        F.broadcast(allowed_names),
        endpoints[name_col] == allowed_names["__allowed"],
        "left",
    )
    hit = exact.where(F.col("__allowed").isNotNull()).withColumn(
        "snapped_name", F.col(name_col)
    ).drop("__allowed")
    miss = exact.where(F.col("__allowed").isNull()).drop("__allowed")

    if miss.isEmpty():
        return hit
    if allowed_names.isEmpty():
        # no allowed entities at all: keep every endpoint as itself (the
        # reference keeps a hallucinated endpoint when nothing scores above
        # threshold; with an empty allow list the cross join below would
        # silently DROP all miss rows instead)
        return hit.unionByName(miss.withColumn("snapped_name", F.col(name_col)))

    miss_emb = with_embedding(miss, name_col, "__e", embedder).withColumn(
        "__e", unit(F.col("__e"))
    )
    allow_emb = with_embedding(allowed_names, "__allowed", "__a", embedder).withColumn(
        "__a", unit(F.col("__a"))
    )
    scored = miss_emb.join(F.broadcast(allow_emb)).withColumn(
        "__sim", dot(F.col("__e"), F.col("__a"))
    )
    w = Window.partitionBy(name_col).orderBy(
        F.col("__sim").desc(), F.col("__allowed").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .withColumn(
            "snapped_name",
            F.when(F.col("__sim") >= threshold, F.col("__allowed")).otherwise(
                F.col(name_col)
            ),
        )
        .drop("__rn", "__sim", "__allowed", "__a", "__e")
    )
    return hit.unionByName(best)


def repair_isolated_entities(
    entities: DataFrame,
    edges: DataFrame,
    extract_fn,
    max_tries: int = 3,
) -> tuple[DataFrame, dict]:
    """E4: bounded repair loop for entities with no incident edge
    (reference `extract_verify_and_correct_relations`,
    irelations_extractor.py:163-216 — re-prompt the extractor on the
    isolated subset ≤ `max_tries_isolated_entities` times, folding any new
    relations into the curated set).

    `extract_fn(isolated_entities_df) -> edges_df` is the re-extraction
    round (the LLM re-prompt; a deterministic extractor in tests). Like the
    reference (:212), the next round's isolation check runs against the
    edges produced by THAT round — an entity linked in any round leaves the
    loop. Returns (edges ∪ repaired, metrics) where metrics carries the
    dropped-entity count the reference only logs.
    """
    metrics = {"tries": 0, "isolated_initial": 0, "isolated_remaining": 0}
    isolated = find_isolated_entities(entities, edges).localCheckpoint()
    metrics["isolated_initial"] = isolated.count()
    while metrics["tries"] < max_tries and not isolated.isEmpty():
        new_edges = extract_fn(isolated)
        if new_edges is None:
            break
        new_edges = new_edges.localCheckpoint()
        edges = edges.unionByName(new_edges)
        isolated = find_isolated_entities(isolated, new_edges).localCheckpoint()
        metrics["tries"] += 1
    metrics["isolated_remaining"] = isolated.count()
    return edges, metrics


def find_isolated_entities(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """Entities appearing as neither src nor dst — one anti-join."""
    endpoints = (
        edges.select(
            F.col("src_name").alias("name"), F.col("src_label").alias("label")
        )
        .union(
            edges.select(
                F.col("dst_name").alias("name"), F.col("dst_label").alias("label")
            )
        )
        .distinct()
    )
    return entities.join(endpoints, ["name", "label"], "left_anti")
