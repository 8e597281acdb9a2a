"""Structured-Streaming front end: micro-batches merge into the KG store via
foreachBatch; replayed epochs are idempotent."""

import os

import pyspark.sql.functions as F

from itext2kg_spark.pipeline import KGPipeline
from itext2kg_spark.sources.pages import synth_pages
from itext2kg_spark.sources.store import KGStore
from itext2kg_spark.streaming.incremental import (
    incremental_kg_stream,
    run_stream_batch,
)


def test_stream_available_now(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    synth_pages(spark, 25, seed=9).write.parquet(src)
    store = KGStore(str(tmp_path / "kg"))

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(src)
    )
    q = incremental_kg_stream(
        stream,
        store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert store.last_committed() is not None
    ents, edges = store.load(spark)
    assert edges.count() > 0


def test_stream_batch_idempotent_replay(spark, tmp_path):
    store = KGStore(str(tmp_path / "kg2"))
    pipe = KGPipeline()
    pages = synth_pages(spark, 10, seed=4)

    assert run_stream_batch(pages, 0, store, pipe) is True
    _, edges1 = store.load(spark)
    n1 = edges1.count()
    # replay of the same epoch after a simulated restart: no-op
    assert run_stream_batch(pages, 0, store, pipe) is False
    assert store.last_committed() == 0
    _, edges2 = store.load(spark)
    assert edges2.count() == n1
    # empty next batch: no-op, nothing committed
    empty = pages.limit(0)
    assert run_stream_batch(empty, 1, store, pipe) is False
    # per-partition lineage recorded with the micro-batch snapshot
    lin = store.load_lineage(spark, 0)
    assert lin.count() > 0
    assert set(lin.columns) >= {"partition_id", "rows", "batch_id"}
    assert sum(r["rows"] for r in lin.collect()) == 10


def test_stream_epochs_independent_of_batch_ids(spark, tmp_path):
    """Round-1 regression: the replay filter compared epoch_id against
    snapshot BATCH ids, so (a) a stream attached to a store pre-populated by
    run_batch dropped its first N micro-batches, and (b) a stream restarted
    with a fresh checkpoint dir (epoch reset to 0) dropped everything below
    the old mark. Epochs are now tracked per stream_key."""
    store = KGStore(str(tmp_path / "kg3"))
    pipe = KGPipeline()

    # pre-populate via two BATCH commits (batch ids 0 and 1)
    pipe.run_batch(synth_pages(spark, 8, seed=1), store)
    pipe.run_batch(synth_pages(spark, 8, seed=2), store)
    assert store.last_committed() == 1

    # a NEW stream starting at epoch 0 must still apply
    pages = synth_pages(spark, 8, seed=3)
    assert run_stream_batch(pages, 0, store, pipe, stream_key="ckptA") is True
    assert store.last_committed() == 2  # snapshot id allocated, not epoch

    # replay of the same epoch on the SAME stream: filtered
    assert run_stream_batch(pages, 0, store, pipe, stream_key="ckptA") is False

    # a different stream (fresh checkpoint dir) at epoch 0: applies
    assert (
        run_stream_batch(
            synth_pages(spark, 8, seed=5), 0, store, pipe, stream_key="ckptB"
        )
        is True
    )
    assert store.last_stream_epoch("ckptA") == 0
    assert store.last_stream_epoch("ckptB") == 0
    assert store.last_stream_epoch("nope") is None


def test_stream_watermark_is_o1_and_crash_safe(spark, tmp_path):
    """The per-stream high-water file makes last_stream_epoch O(1): it only
    scans snapshots NEWER than the cached batch_id. Crash semantics: the
    cache is written AFTER the commit marker, so a crash between the two
    leaves it stale-low and the bounded catch-up scan (or, if the cache is
    missing entirely, the full scan) still finds the committed epoch —
    replay-only, never skip."""
    import json

    store = KGStore(str(tmp_path / "kg4"))
    pipe = KGPipeline()
    pages = synth_pages(spark, 8, seed=7)
    for epoch in (0, 1, 2):
        assert run_stream_batch(pages, epoch, store, pipe, stream_key="s") is True
    hw_path = store._stream_hw_path("s")
    assert os.path.exists(hw_path)
    with open(hw_path) as f:
        hw = json.load(f)
    assert hw["stream_epoch"] == 2 and hw["batch_id"] == 2

    # O(1): with the cache current, no snapshot _COMMITTED json is opened
    opened = []
    orig = store.snapshot_metrics
    store.snapshot_metrics = lambda b: (opened.append(b), orig(b))[1]
    assert store.last_stream_epoch("s") == 2
    assert opened == []

    # simulated crash window: marker committed, cache stale at epoch 1
    with open(hw_path + ".tmp", "w") as f:
        json.dump({"stream_key": "s", "stream_epoch": 1, "batch_id": 1}, f)
    os.replace(hw_path + ".tmp", hw_path)
    assert store.last_stream_epoch("s") == 2  # catch-up scan finds epoch 2
    assert opened == [2]  # and read exactly the one newer snapshot

    # cache deleted entirely (pre-upgrade store): full scan still correct
    os.remove(hw_path)
    assert store.last_stream_epoch("s") == 2
    # and the replay filter stays correct through all of it
    assert run_stream_batch(pages, 2, store, pipe, stream_key="s") is False
    assert run_stream_batch(pages, 3, store, pipe, stream_key="s") is True
