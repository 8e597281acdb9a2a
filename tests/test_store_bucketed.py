"""KGStore(bucketed_edges=True): the incremental batch merge reads the
stored edge table bucket-aligned — only the batch side shuffles — and is
row-identical to the plain-parquet store (VERDICT r5 ask #4).
"""

from __future__ import annotations

import pytest

from itext2kg_spark.pipeline import KGPipeline
from itext2kg_spark.sources.pages import synth_pages
from itext2kg_spark.sources.store import KGStore


@pytest.fixture()
def stores(spark, tmp_path):
    # edge_buckets == the session's shuffle partitions (8): the batch-side
    # groupBy exchange then already satisfies the join's distribution, so
    # the merge plan carries exactly ONE exchange (see plan test below)
    b = KGStore(str(tmp_path / "bucketed"), bucketed_edges=True, edge_buckets=8)
    p = KGStore(str(tmp_path / "plain"))
    yield b, p
    for batch in b.committed_batches():
        spark.sql(f"DROP TABLE IF EXISTS {b._edge_store(spark)._table(batch)}")


def test_bucketed_store_matches_plain_store(spark, stores):
    """Two incremental batches through both stores: canonical edge tables
    (incl. merged t_obs/atomic_facts lists) must be identical."""
    bst, pst = stores
    pipe = KGPipeline()
    batches = [synth_pages(spark, 40, seed=101), synth_pages(spark, 40, seed=202)]
    for pages in batches:
        pipe.run_batch(pages, bst)
        pipe.run_batch(pages, pst)
    assert bst.last_committed() == pst.last_committed() == 1
    b_ents, b_edges = bst.load(spark)
    p_ents, p_edges = pst.load(spark)
    assert sorted(map(tuple, b_edges.collect())) == sorted(
        map(tuple, p_edges.collect())
    )
    assert b_ents.count() == p_ents.count()


def test_incremental_merge_exchanges_only_batch_side(spark, stores):
    """The REAL incremental path (pipeline-built batch edges merged into the
    store) must plan exactly ONE Exchange — the batch side's canonical-key
    aggregation, reused as the join alignment — while the stored side is a
    bucketed FileScan with no exchange above it."""
    bst, _ = stores
    pipe = KGPipeline()
    pipe.run_batch(synth_pages(spark, 40, seed=101), bst)
    ents_prev, edges_prev = bst.load(spark)

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _, edges = pipe.build_graph(
            synth_pages(spark, 40, seed=202),
            ents_prev,
            edges_prev,
            existing_edges_merge="join",
        )
        edges.collect()
        plan = (
            edges._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    assert plan.count("Exchange hashpartitioning") == 1
    # the stored side is read through the registered bucketed table
    assert "kg_edges_" in plan


def test_merge_modes_equivalent_on_build_graph(spark, stores):
    """canonicalize_kg(existing_edges_merge='join') equals the union path on
    the same inputs (the equivalence merge_edges_join's docstring claims)."""
    bst, _ = stores
    pipe = KGPipeline()
    pipe.run_batch(synth_pages(spark, 30, seed=11), bst)
    ents_prev, edges_prev = bst.load(spark)
    pages = synth_pages(spark, 30, seed=22)
    _, e_join = pipe.build_graph(pages, ents_prev, edges_prev,
                                 existing_edges_merge="join")
    _, e_union = pipe.build_graph(pages, ents_prev, edges_prev,
                                  existing_edges_merge="union")
    assert sorted(map(tuple, e_join.collect())) == sorted(
        map(tuple, e_union.collect())
    )
