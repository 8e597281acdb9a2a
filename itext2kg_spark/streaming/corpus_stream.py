"""Structured-Streaming front end for incremental corpus preparation.

The corpus analog of streaming/incremental.py: `readStream` over a documents
source with `foreachBatch` invoking the same cross-batch dedup used by the
batch path (corpus.incremental_survivors against the CorpusStore's survivor
history) — no stateful streaming operators. The alternative, a stateful
`dropDuplicates` over the stream, holds every fingerprint ever seen in
executor state and cannot be queried between triggers; the survivor-store
anti-join keeps the state as a queryable append-only table whose size is the
SURVIVOR corpus (far smaller than the raw stream at web duplication rates),
which is the design that stands at 100 TB.

Exactly-once: epoch replay detection via the store's per-stream high-water
mark (sources/stream_hw.py — keyed by checkpoint location, independent of
store batch ids). The crash window between delta commit and high-water write
is additionally safe-by-dedup: replaying an already-applied corpus batch
finds every document's fingerprint (or near-dup cluster) already in the
survivor history, so the replayed delta is empty — verified by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from itext2kg_spark.corpus import CorpusStore


def incremental_corpus_stream(
    docs_stream: DataFrame,
    store: CorpusStore,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    **dedup_kwargs,
):
    """Attach incremental corpus dedup to a streaming documents DataFrame.

    Returns the started StreamingQuery. `docs_stream` must be a streaming
    DataFrame with at least (doc_id, text) — e.g.
    `spark.readStream.schema(...).parquet(dir)`. Extra kwargs feed
    `incremental_survivors` (langs, min_tokens, near_dup_threshold, ...).
    """
    stream_key = checkpoint_dir or "default"

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        run_corpus_stream_batch(
            batch_df, epoch_id, store, stream_key=stream_key, **dedup_kwargs
        )

    writer = docs_stream.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_corpus_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    store: CorpusStore,
    stream_key: str = "default",
    **dedup_kwargs,
) -> bool:
    """Idempotent micro-batch dedup-and-append; True if the batch applied."""
    last = store.last_stream_epoch(stream_key)
    if last is not None and epoch_id <= last:
        return False  # replayed micro-batch after restart — already merged
    if batch_df.isEmpty():
        return False
    batch_id, _delta = store.run_batch_with_id(
        batch_df,
        metrics={"stream_key": stream_key, "stream_epoch": int(epoch_id)},
        **dedup_kwargs,
    )
    # record the high-water mark against the id run_batch actually allocated
    # (committed_batches()[-1] is only equal under single-writer — ADVICE r5)
    store._write_stream_hw(stream_key, int(epoch_id), batch_id)
    return True
