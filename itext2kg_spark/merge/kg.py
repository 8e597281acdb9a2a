"""Canonical-KG construction: quintuples -> (entities, edges) tables, with
incremental merge against an existing canonical store.

Reproduces the ATOM merge semantics (SURVEY.md §2.7) as one global dataflow:

  1. normalize names/labels/predicates (Entity.process / Relationship.process
     parity — itext2kg/atom/models/entity.py:30-38, relationship.py:34-36);
  2. weighted entity embeddings over distinct (name,label)
     (knowledge_graph.py:29-43, weights atom/atom.py:161-162);
  3. entity resolution: exact (name,label) equality + cosine >= θ_E clusters
     via similarity join + connected components (replaces matcher.py:41-94);
  4. predicate resolution at θ_R over distinct predicate names — endpoints
     ignored, exactly like _batch_match_relationships (matcher.py:105-153);
  5. endpoint/predicate remap = three hash joins against the mapping tables
     (replaces matcher.py:204-226);
  6. temporal resolution: groupBy canonical (src,pred,dst) aggregating
     t_obs/t_start/t_end/atomic_facts lists (replaces matcher.py:155-170 +
     relationship.py:38-76 list-extends). Lists keep duplicates (reference
     extends, never dedups) and are array_sort'ed for deterministic output —
     compare as multisets against the reference (SURVEY.md A4 note).

Incremental path: existing entities join the resolution with is_existing=1;
store-internal pairs are never candidates, so existing rows always map to
themselves and a cluster's representative is the store row whenever one is
present — matching `existing_knowledge_graph` behavior (atom/atom.py:196-208).
Existing edges then union with the batch's mention rows before the groupBy, so
re-observed edges extend their lists exactly like combine_timestamps.

Scale shape: every join here is key-equi (broadcastable mapping tables —
distinct names, not mentions); the single wide shuffle is the final groupBy on
the canonical triple, which Spark executes with partial (map-side) aggregation.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.config import PipelineConfig
from itext2kg_spark.extract.embed import with_embedding
from itext2kg_spark.functions.normalize import norm_label, norm_name, norm_predicate
from itext2kg_spark.functions.timeparse import (
    parse_timestamp_array_columns,
    parse_timestamp_array_inline,
)
from itext2kg_spark.functions.vectors import unit
from itext2kg_spark.merge.resolve import resolve_items

EDGE_GROUP_KEYS = ["src_name", "src_label", "pred", "dst_name", "dst_label"]

EDGE_LIST_COLS = ["t_obs", "t_start", "t_end", "atomic_facts"]


def _normalize_quintuples(q: DataFrame, mode: str = "atom") -> DataFrame:
    if mode == "star":  # legacy per-char rule, case-preserving labels (P3)
        from itext2kg_spark.functions.normalize import (
            norm_label_star,
            norm_name_star,
        )

        nn, nl, np_ = norm_name_star, norm_label_star, norm_label_star
    else:
        nn, nl, np_ = norm_name, norm_label, norm_predicate
    return (
        q.withColumn("subj_name", nn(F.col("subj_name")))
        .withColumn("subj_label", nl(F.col("subj_label")))
        .withColumn("obj_name", nn(F.col("obj_name")))
        .withColumn("obj_label", nl(F.col("obj_label")))
        .withColumn("pred", np_(F.col("pred")))
    )


def _mention_order() -> F.Column:
    # A sortable first-seen key per mention: the reference's merge tree folds
    # atomic facts in input order, so the earliest (url, fact_idx) mention's
    # surface form becomes the cluster representative.
    return F.struct(F.col("url"), F.col("fact_idx"))


def _entity_mentions(q: DataFrame) -> DataFrame:
    subj = q.select(
        F.col("subj_name").alias("name"),
        F.col("subj_label").alias("label"),
        _mention_order().alias("__ord"),
    )
    obj = q.select(
        F.col("obj_name").alias("name"),
        F.col("obj_label").alias("label"),
        _mention_order().alias("__ord"),
    )
    return (
        subj.union(obj)
        .groupBy("name", "label")
        .agg(F.min("__ord").alias("first_seen"))
    )


def embed_entities(
    distinct_entities: DataFrame, embedder, name_weight: float, label_weight: float
) -> DataFrame:
    """(name, label) -> + embedding (weighted sum, raw like the reference) +
    emb (unit-normalized, for matching).

    The input is already distinct on (name, label), so for recompute-cheap
    embedders (the default) names and labels are embedded DIRECTLY — both
    pandas UDFs fuse into ONE ArrowEvalPython stage, no distinct shuffle, no
    join-back. An embedder wrapping a paid API should set
    `prefers_distinct = True` to route through `with_embedding` instead
    (each distinct string embedded exactly once, P9)."""
    if getattr(embedder, "prefers_distinct", False):
        d = with_embedding(distinct_entities, "name", "__emb_n", embedder)
        d = with_embedding(d, "label", "__emb_l", embedder)
    else:
        e = embedder.udf()
        d = distinct_entities.withColumn("__emb_n", e(F.col("name"))).withColumn(
            "__emb_l", e(F.col("label"))
        )
    combined = F.zip_with(
        "__emb_n",
        "__emb_l",
        lambda a, b: a * F.lit(float(name_weight)) + b * F.lit(float(label_weight)),
    )
    return (
        d.withColumn("embedding", combined)
        .withColumn("emb", unit(F.col("embedding")))
        .drop("__emb_n", "__emb_l")
    )


def merge_edges_join(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """Canonical-key merge of batch-aggregated edges into a stored edge
    table as a FULL OUTER join (counts are list lengths here; list columns
    concatenate and re-sort). Semantically identical to the union+groupBy
    path — array_sort over the concat of two per-side-sorted lists equals
    array_sort over the flattened multiset — but expressed as a join so a
    bucketed stored side is read in place: only the (batch-sized) side
    shuffles. Plain equality keys, NOT eqNullSafe: null-safe keys are
    rewritten into expressions that cannot line up with the table's
    bucketing (see BucketedTableStore.merge_plan); canonical keys are
    non-null by construction."""
    s, u = stored.alias("s"), batch.alias("u")
    cond = [F.col(f"s.{k}") == F.col(f"u.{k}") for k in EDGE_GROUP_KEYS]
    return s.join(u, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"s.{k}"), F.col(f"u.{k}")).alias(k)
            for k in EDGE_GROUP_KEYS
        ],
        *[
            F.array_sort(
                F.concat(
                    F.coalesce(
                        F.col(f"s.{c}"),
                        F.array().cast(stored.schema[c].dataType),
                    ),
                    F.coalesce(
                        F.col(f"u.{c}"),
                        F.array().cast(stored.schema[c].dataType),
                    ),
                )
            ).alias(c)
            for c in EDGE_LIST_COLS
        ],
    )


def _resolve_both_driver(q: DataFrame, cfg: PipelineConfig, embedder):
    """One-job driver-path resolution of entities AND predicates for fresh
    batches: a kind-tagged 3-way explode of the (checkpointed) quintuple
    table feeds a single distinct-aggregate + embed + collect; the per-kind
    numpy resolutions (identical `_driver_resolve` calls to resolve_items'
    driver path — thresholds, link mode, ordering and tie-breaks unchanged)
    run on the collected rows. Returns (resolved_entities_df,
    resolved_predicates_df) with the same schemas/semantics the two
    resolve_items calls produce for is_existing=False inputs: semantics are
    unchanged because entity rows only ever score against entity rows and
    predicate rows against predicate rows — the kinds are split BEFORE any
    cosine is computed."""
    from itext2kg_spark.merge.resolve import _driver_resolve

    e = embedder.udf()
    ord_ = _mention_order().alias("__ord")
    kinds = F.explode(
        F.array(
            F.struct(
                F.lit("e").alias("kind"),
                F.col("subj_name").alias("name"),
                F.col("subj_label").alias("label"),
                ord_,
            ),
            F.struct(
                F.lit("e").alias("kind"),
                F.col("obj_name").alias("name"),
                F.col("obj_label").alias("label"),
                ord_,
            ),
            F.struct(
                F.lit("p").alias("kind"),
                F.col("pred").alias("name"),
                F.lit("").alias("label"),
                ord_,
            ),
        )
    )
    items = (
        q.select(kinds.alias("m"))
        .select("m.kind", "m.name", "m.label", "m.__ord")
        .groupBy("kind", "name", "label")
        .agg(F.min("__ord").alias("first_seen"))
    )
    nw, lw = float(cfg.embed.name_weight), float(cfg.embed.label_weight)
    d = items.withColumn("__emb_n", e(F.col("name"))).withColumn(
        "__emb_l", e(F.col("label"))
    )
    combined = F.when(
        F.col("kind") == "e",
        F.zip_with(
            "__emb_n", "__emb_l", lambda a, b: a * F.lit(nw) + b * F.lit(lw)
        ),
    ).otherwise(F.col("__emb_n"))  # predicates embed the name alone
    d = (
        d.withColumn("embedding", combined)
        .withColumn("emb", unit(F.col("embedding")))
        .drop("__emb_n", "__emb_l")
    )
    rows = d.collect()
    spark = q.sparkSession
    emb_type = d.schema["embedding"].dataType

    def _local(kind, key_cols, threshold):
        sub = [r for r in rows if r["kind"] == kind]
        resolved = _driver_resolve(
            sub,
            key_cols,
            threshold,
            cfg.match.inclusive,
            has_existing=False,
            order_col="first_seen",
            link_mode=cfg.match.link_mode,
        )
        return sub, resolved

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    import pandas as pd

    esub, eres = _local("e", ["name", "label"], cfg.match.ent_threshold)
    e_schema = StructType(
        [
            StructField("name", StringType(), True),
            StructField("label", StringType(), True),
            StructField("embedding", emb_type, True),
            StructField("comp", LongType(), False),
            StructField("is_rep", BooleanType(), False),
            StructField("canon_name", StringType(), True),
            StructField("canon_label", StringType(), True),
        ]
    )
    e_rows = [
        (r["name"], r["label"], r["embedding"]) + res[2:]
        for r, res in zip(esub, eres)
    ]
    resolved_e = spark.createDataFrame(
        pd.DataFrame(e_rows, columns=[f.name for f in e_schema.fields]),
        e_schema,
    )

    psub, pres = _local("p", ["name"], cfg.match.rel_threshold)
    p_schema = StructType(
        [
            StructField("pred", StringType(), True),
            StructField("canon_pred", StringType(), True),
        ]
    )
    p_rows = [(r["name"], res[3]) for r, res in zip(psub, pres)]
    resolved_p = spark.createDataFrame(
        pd.DataFrame(p_rows, columns=["pred", "canon_pred"]), p_schema
    )
    return resolved_e, resolved_p


def canonicalize_kg(
    quintuples: DataFrame,
    cfg: PipelineConfig,
    embedder,
    existing_entities: DataFrame | None = None,
    existing_edges: DataFrame | None = None,
    existing_edges_merge: str = "union",
    temporal_empty: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """quintuples(url, obs_ts, fact, subj_*, pred, obj_*, t_start, t_end)
    -> (entities, edges) canonical DataFrames.

    existing_edges_merge: "union" (default) unions stored edge rows into the
    mention stream before the wide groupBy — one aggregation, both sides
    shuffle. "join" aggregates the batch alone and FULL-OUTER-joins the
    stored side on the canonical key (merge_edges_join) — the right mode
    when the stored side is a bucketed table (KGStore(bucketed_edges=True)),
    where the join reads stored buckets in place and ONLY the batch side
    shuffles. Outputs are identical (equivalence-tested).

    entities: name, label, embedding array<float>
    edges:    src_name, src_label, pred, dst_name, dst_label,
              t_obs/t_start/t_end array<double>, atomic_facts array<string>
    """
    # Materialize the quintuple mention table once — it feeds entity-mention
    # distinct, predicate distinct, and the final remap; recomputing the
    # distill/extract UDF lineage per action would triple the extraction cost
    # (the reference likewise materializes extraction output before merging).
    # cfg.materialize_quintuples=False skips the barrier for cheap extractors.
    q = _normalize_quintuples(quintuples, cfg.mode)
    ent_hint = pred_hint = None
    if cfg.materialize_quintuples:
        if existing_entities is None and existing_edges is None:
            # Materialize via the SAME job that gathers cardinality hints:
            # one tiny agg over the lazily-checkpointed table (first compute
            # materializes it) yields approximate distinct-entity/predicate
            # counts, letting both resolutions skip their path-decision
            # count job and collect directly (see resolve_items
            # n_items_hint — approximation only picks between
            # output-equivalent physical paths).
            q = q.localCheckpoint(eager=False)
            st = q.agg(
                F.approx_count_distinct(
                    F.struct("subj_name", "subj_label")
                ).alias("ns"),
                F.approx_count_distinct(
                    F.struct("obj_name", "obj_label")
                ).alias("no"),
                F.approx_count_distinct("pred").alias("np"),
            ).first()
            ent_hint = int(st["ns"]) + int(st["no"])
            pred_hint = int(st["np"])
        else:
            q = q.localCheckpoint()

    def _resolve_entities():
        ents = _entity_mentions(q).withColumn("is_existing", F.lit(False))
        if existing_entities is not None:
            ex = (
                existing_entities.select("name", "label")
                .withColumn("is_existing", F.lit(True))
                .withColumn(
                    "first_seen",
                    F.lit(None).cast(ents.schema["first_seen"].dataType),
                )
            )
            # batch rows that exactly equal a store row are dropped in favor
            # of the store row (exact-match pre-pass, matcher.py:41-63)
            if cfg.match.exclude_exact_matched_store:
                # direct two-KG-merge parity (see MatchConfig): the claimed
                # store row leaves the cosine pool entirely
                # (unmatched_entities2, matcher.py:53-63)
                batch_keys = ents.select("name", "label").withColumn(
                    "exact_hit", F.lit(True)
                )
                ex = ex.join(batch_keys, ["name", "label"], "left").withColumn(
                    "exact_hit", F.coalesce(F.col("exact_hit"), F.lit(False))
                )
                ents = ex.unionByName(
                    ents.join(
                        ex.select("name", "label"), ["name", "label"], "left_anti"
                    ).withColumn("exact_hit", F.lit(False))
                )
            else:
                ents = ex.unionByName(
                    ents.join(
                        ex.select("name", "label"), ["name", "label"], "left_anti"
                    )
                )
        if getattr(embedder, "prefers_distinct", False):
            # with_embedding's join-back references the distinct table twice;
            # checkpoint so each branch doesn't recompute the mention groupBy.
            # The default direct-embed path references it once — resolve's
            # single collect executes the whole chain as ONE job.
            ents = ents.localCheckpoint()
        ents = embed_entities(
            ents, embedder, cfg.embed.name_weight, cfg.embed.label_weight
        )
        return resolve_items(
            ents,
            cfg.match,
            cfg.match.ent_threshold,
            key_cols=["name", "label"],
            emb_col="emb",
            order_col="first_seen",
            emb_dim=cfg.embed.dim,
            n_items_hint=ent_hint,
        )

    def _resolve_predicates():
        preds = (
            q.select("pred", _mention_order().alias("__ord"))
            .groupBy("pred")
            .agg(F.min("__ord").alias("first_seen"))
            .withColumn("is_existing", F.lit(False))
        )
        if existing_edges is not None:
            exp = (
                existing_edges.select(F.col("pred"))
                .distinct()
                .withColumn("is_existing", F.lit(True))
                .withColumn(
                    "first_seen",
                    F.lit(None).cast(preds.schema["first_seen"].dataType),
                )
            )
            preds = exp.unionByName(
                preds.join(exp.select("pred"), ["pred"], "left_anti")
            )
        if getattr(embedder, "prefers_distinct", False):
            preds = preds.localCheckpoint()
            preds = with_embedding(preds, "pred", "embedding", embedder)
        else:
            # table is already distinct on pred — embed directly, one stage
            preds = preds.withColumn("embedding", embedder.udf()(F.col("pred")))
        preds = preds.withColumn("emb", unit(F.col("embedding")))
        return resolve_items(
            preds,
            cfg.match,
            cfg.match.rel_threshold,
            key_cols=["pred"],
            emb_col="emb",
            order_col="first_seen",
            emb_dim=cfg.embed.dim,
            n_items_hint=pred_hint,
        )

    # Fast path for fresh batches (no store tables, cheap embedder, both
    # hints clearly under the driver limit): ONE job aggregates distinct
    # entities AND predicates (kind-tagged union), embeds them in a single
    # ArrowEvalPython stage and collects once; the per-kind numpy
    # resolutions then run on the driver exactly as resolve_items'
    # driver path would. Incremental merges and big batches fall back to
    # the per-kind resolve_items pair on two driver threads.
    limit = cfg.match.effective_broadcast_limit(2 * cfg.embed.dim)
    if (
        existing_entities is None
        and existing_edges is None
        and not getattr(embedder, "prefers_distinct", False)
        and ent_hint is not None
        and pred_hint is not None
        and (ent_hint + pred_hint) * 1.2 + 200 <= limit
    ):
        resolved_e, resolved_p = _resolve_both_driver(q, cfg, embedder)
    else:
        # Entity and predicate resolution are independent chains of small
        # jobs (checkpoint/count/CC iterations); running them on two driver
        # threads overlaps their serial latencies — Spark schedules
        # concurrent jobs fine.
        with ThreadPoolExecutor(max_workers=2) as pool:
            fe = pool.submit(_resolve_entities)
            fp = pool.submit(_resolve_predicates)
            resolved_e = fe.result()
            resolved_p = fp.result()

    ent_map = resolved_e.select("name", "label", "canon_name", "canon_label")
    entities = resolved_e.where("is_rep").select(
        F.col("canon_name").alias("name"),
        F.col("canon_label").alias("label"),
        "embedding",
    )
    pred_map = resolved_p.select("pred", "canon_pred")

    # ---- remap + temporal aggregation ---------------------------------------
    sm = ent_map.select(
        F.col("name").alias("subj_name"),
        F.col("label").alias("subj_label"),
        F.col("canon_name").alias("src_name"),
        F.col("canon_label").alias("src_label"),
    )
    om = ent_map.select(
        F.col("name").alias("obj_name"),
        F.col("label").alias("obj_label"),
        F.col("canon_name").alias("dst_name"),
        F.col("canon_label").alias("dst_label"),
    )
    # P4: t_start/t_end string arrays -> epoch arrays with dateutil fallback
    # (relationship.py:44-57 parity, incl. fuzzy forms). Only this consumer
    # reads the temporal columns, so the parse lives here:
    #  * materialized mode — clean/dirty row split (parse_timestamp_array_
    #    columns) applied to the CHECKPOINTED quintuple table BEFORE the
    #    remap joins: both branches re-scan cheap checkpointed rows, the
    #    all-fast-path majority keeps a pure-JVM plan, and the three
    #    broadcast joins run ONCE over the branch union (splitting after the
    #    joins executed them once per branch — round-2 finding).
    #  * no-materialize mode — the split would re-run the extractor once per
    #    branch, so the single-pass row-gated variant is used instead (one
    #    scan; fast arrays materialized as columns so the per-element
    #    try_to_timestamp sweep runs once per row, not per consumer).
    #  * temporal_empty mode — the caller asserts every t_start/t_end array
    #    is empty BY CONSTRUCTION (the token extractor emits literal empty
    #    arrays; parsing an empty array is an empty array), so the parse
    #    collapses to typed empty literals: no clean/dirty union, no second
    #    checkpoint scan, and — decisively — no ArrowEvalPython fallback
    #    stage spinning up Python workers for a branch that is provably
    #    rowless (measured ~0.5s of the token-path count at sf0.1).
    if temporal_empty:
        empty_d = F.array().cast("array<double>")
        q_parsed = q.withColumn("t_start", empty_d).withColumn(
            "t_end", empty_d
        )
    elif cfg.materialize_quintuples:
        q_parsed = parse_timestamp_array_columns(q, ["t_start", "t_end"])
    else:
        q_parsed = parse_timestamp_array_inline(q, ["t_start", "t_end"])
    mentions = (
        q_parsed.join(F.broadcast(sm), ["subj_name", "subj_label"])
        .join(F.broadcast(om), ["obj_name", "obj_label"])
        .join(F.broadcast(pred_map), ["pred"])
        .select(
            "src_name",
            "src_label",
            F.col("canon_pred").alias("pred"),
            "dst_name",
            "dst_label",
            F.array(F.col("obs_ts").cast("double")).alias("t_obs"),
            "t_start",
            "t_end",
            F.array(F.col("fact")).alias("atomic_facts"),
        )
    )
    if existing_edges is not None and existing_edges_merge == "union":
        mentions = mentions.unionByName(
            existing_edges.select(*EDGE_GROUP_KEYS, *EDGE_LIST_COLS)
        )

    if cfg.edge_salt > 1:
        # Two-phase skew-safe list accumulation (north rule: salted
        # repartition for hot keys). Salt is deterministic per mention (hash
        # of the observation stamp + provenance — the fields that VARY within
        # a hot edge), so one hyper-re-observed triple spreads over
        # cfg.edge_salt reduce tasks in phase 1; phase 2 combines the
        # <= edge_salt partial lists per triple. Output is identical to the
        # single-phase path: the sort happens once, over the final multiset.
        salt = F.pmod(
            F.xxhash64(F.col("t_obs"), F.col("atomic_facts")),
            F.lit(cfg.edge_salt),
        )
        agg_input = (
            mentions.withColumn("__salt", salt)
            .groupBy(*EDGE_GROUP_KEYS, "__salt")
            .agg(
                *[
                    F.flatten(F.collect_list(c)).alias(c)
                    for c in EDGE_LIST_COLS
                ]
            )
        )
    else:
        agg_input = mentions
    edges = agg_input.groupBy(*EDGE_GROUP_KEYS).agg(
        *[
            F.array_sort(F.flatten(F.collect_list(c))).alias(c)
            for c in EDGE_LIST_COLS
        ]
    )
    if existing_edges is not None and existing_edges_merge == "join":
        edges = merge_edges_join(
            existing_edges.select(*EDGE_GROUP_KEYS, *EDGE_LIST_COLS), edges
        )
    return entities, edges
