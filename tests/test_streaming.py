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
