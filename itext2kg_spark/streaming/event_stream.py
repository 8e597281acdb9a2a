"""Native stateful Structured Streaming: watermarked tumbling-window
aggregation over an events stream.

The KG and corpus streams (streaming/incremental.py, corpus_stream.py) use
foreachBatch because their state — the canonical graph / survivor corpus —
must live in a queryable store, not in executor state. Windowed telemetry
aggregation is the opposite case: bounded keyed state with an event-time
expiry is exactly what Spark's native watermark + window operator manages,
including late-data handling and state eviction, so here we use it
directly rather than re-implementing it.

The window frame is the SAME tumbling bucketing as the batch
functions/sessions.py:windowed_counts (F.window aligns tumbling windows at
the epoch, i.e. window_start = floor(epoch/dur)*dur) — pinned by a
batch-vs-stream equality test, so a lineage consumer can mix batch
backfills with streaming updates and get identical frames.

Watermark semantics (tested): in append mode a window emits only once the
watermark (max event time seen minus `watermark_s`) passes its end, and
events arriving later than the watermark are dropped from state — the
standard bounded-state trade; pick `watermark_s` from the source's real
disorder bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hopping_counts_stream(
    events_stream: DataFrame,
    window_s: int = 300,
    slide_s: int = 100,
    watermark_s: int = 600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming (window_start_us, event_type, n_events, sum_value) — the
    streaming twin of functions/sessions.py:hopping_counts, via F.window's
    native slideDuration (epoch-aligned slide enumeration, the same frames
    the batch explode-to-starts formulation computes — pinned by a
    batch-vs-stream equality test). Watermark semantics are identical to
    windowed_counts_stream; each event occupies window_s/slide_s windows of
    state until the watermark passes each window's end."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    return (
        events_stream.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(
            F.window(
                F.col(ts_col), f"{window_s} seconds", f"{slide_s} seconds"
            ),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_stream(
    events_stream: DataFrame,
    window_s: int = 300,
    watermark_s: int = 600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming (window_start_us, event_type, n_events, sum_value) —
    the streaming twin of functions/sessions.py:windowed_counts."""
    return (
        events_stream.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(
            F.window(F.col(ts_col), f"{window_s} seconds"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            type_col,
            "n_events",
            "sum_value",
        )
    )
