"""Structured-Streaming front end for incremental KG construction.

The reference has no streaming — its incrementality is a batch loop over
observation dates with pickle checkpoints (evaluation/latency/testing_atom.py:
294-526). The natural Spark expression is `readStream` over the pages source
with `foreachBatch` invoking the same batch merge used everywhere else
(KGPipeline.run_batch → canonicalize → snapshot commit). No stateful
streaming operators are needed: late pages simply merge in a later batch and
their warc_ts lands in the edge's t_obs list (SURVEY.md §2.8 — the t_obs-
ordered batch loop IS the stream semantics).

On a cluster the sink is Iceberg MERGE INTO per micro-batch; here the
KGStore parquet-snapshot contract stands in. Exactly-once: foreachBatch can
replay a batch after failure — `run_stream_batch` makes the commit idempotent
by skipping batch ids at-or-below the store's last committed id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from itext2kg_spark.pipeline import KGPipeline
from itext2kg_spark.sources.store import KGStore


def incremental_kg_stream(
    pages_stream: DataFrame,
    store: KGStore,
    pipeline: KGPipeline | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Attach the incremental KG merge to a streaming pages DataFrame.

    Returns the started StreamingQuery. `pages_stream` must be a streaming
    DataFrame with the pages schema (url, warc_ts, html, text, lang) — e.g.
    `spark.readStream.schema(PAGES_SCHEMA).parquet(dir)`.
    """
    pipe = pipeline or KGPipeline()

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        run_stream_batch(batch_df, epoch_id, store, pipe)

    writer = pages_stream.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_batch(
    batch_df: DataFrame, epoch_id: int, store: KGStore, pipe: KGPipeline
) -> bool:
    """Idempotent micro-batch merge; returns True if the batch was applied."""
    last = store.last_committed()
    if last is not None and epoch_id <= last:
        return False  # replayed batch after restart — already merged
    if batch_df.isEmpty():
        return False
    spark = batch_df.sparkSession
    existing = store.load(spark)
    ents_prev, edges_prev = existing if existing else (None, None)
    entities, edges = pipe.build_graph(batch_df, ents_prev, edges_prev)
    store.write_snapshot(
        int(epoch_id), entities, edges, metrics={"epoch_id": int(epoch_id)}
    )
    return True
