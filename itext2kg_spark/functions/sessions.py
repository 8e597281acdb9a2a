"""Event sessionization and event-time windowed aggregation — pure Catalyst.

Crawl/ingest telemetry (the events table: event_id, ts, user_id,
event_type, value) needs the two classic time operators:

- `sessionize`: split each user's event stream into sessions at inactivity
  gaps > `gap` (the standard lag-ts + cumulative-sum-of-breaks pattern).
  Shape at scale: ONE shuffle on user_id; both window functions run inside
  the same sort within that partition (lag and the running sum share the
  (user_id, ts, event_id) ordering), so sessionization is a single
  exchange + single sort regardless of corpus size. Skewed users (bots)
  are bounded by their own event counts; a per-user cap belongs upstream.

- `windowed_counts`: tumbling event-time windows per event_type (count +
  sum(value)). Expressed with floor-division bucketing rather than
  F.window so the contract is portable SQL (epoch arithmetic), and so the
  same frame definition serves the batch oracle and the streaming path
  (streaming/event_stream.py wires the native watermark+window variant and
  pins it against this batch definition).

Timestamps are compared in epoch microseconds (no timezone arithmetic —
cross-engine safe; the session pins UTC anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(ts) -> F.Column:
    # epoch microseconds as bigint via unix_micros (TIMESTAMP cast to long
    # would truncate to seconds). The cast lifts TIMESTAMP_NTZ (how plain
    # parquet timestamps load) to TIMESTAMP; the engine pins the session to
    # UTC, so the lift is the identity the SQL oracle's epoch_us assumes.
    return F.unix_micros(ts.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a session_id to every event: sessions break where the gap to
    the previous event of the same user exceeds `gap_s` seconds.

    Returns the input columns plus (session_seq, session_id) where
    session_seq is the per-user session ordinal (0-based) and session_id =
    user_id * 1_000_000 + session_seq (stable, joinable; callers with >1M
    sessions per user have a bot, not a session)."""
    w_order = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    us = _us(F.col(ts_col))
    prev_us = F.lag(us).over(w_order)
    is_break = F.when(
        prev_us.isNull() | (us - prev_us > gap_s * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = (F.sum(is_break).over(w_run) - 1).cast("long")
    return events.select(
        "*",
        seq.alias("session_seq"),
        (F.col(user_col).cast("long") * 1_000_000 + seq).alias("session_id"),
    )


def session_stats(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per session: (user_id, session_seq, n_events, start_us,
    end_us, duration_s). The groupBy reuses the sessionize exchange (same
    user_id partitioning), so the whole operator is one shuffle + one
    partial-agg combine."""
    s = sessionize(events, gap_s, user_col, ts_col, id_col)
    us = _us(F.col(ts_col))
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_s"),
    )


def hopping_counts(
    events: DataFrame,
    window_s: int = 300,
    slide_s: int = 100,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hopping (sliding) event-time windows: every event lands in
    window_s / slide_s overlapping windows. Same epoch-floor arithmetic as
    `windowed_counts` — each event explodes to its window starts
    (floor(t/slide)*slide - k*slide for k in 0..n-1, matching F.window's
    epoch-aligned slide enumeration exactly, negative-start windows
    included) and one groupBy aggregates. The explode factor is the
    overlap count (a small constant); everything stays codegen.
    `window_s` must be a multiple of `slide_s` (same restriction keeps the
    SQL-oracle enumeration exact)."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    n = window_s // slide_s
    slide_us = slide_s * 1_000_000
    us = _us(F.col(ts_col))
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda k: (F.floor(us / slide_us) * slide_us - k * slide_us).cast(
            "long"
        ),
    )
    return (
        events.select(
            F.explode(starts).alias("window_start_us"),
            F.col(type_col),
            F.col(value_col),
        )
        .groupBy("window_start_us", type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )


def session_stats_native(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup via Spark's NATIVE session_window operator:
    (user_id, start_us, n_events). Works identically in batch and
    Structured Streaming (with a watermark), which is its reason to exist
    next to `sessionize`: the lag+cumsum formulation cannot run under the
    streaming engine (no unbounded windows over streams), this one can.

    Boundary contract vs `sessionize` (pinned by test, including the
    exact-gap edge): both merge an event at EXACTLY prev + gap into the
    running session (Spark extends a session window through events with
    diff <= gap; `sessionize` breaks only on diff > gap), so the two
    formulations agree event-for-event and are freely interchangeable
    between batch backfills and streaming jobs."""
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(
            F.session_window(ts, f"{gap_s} seconds"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            "n_events",
        )
    )


def windowed_counts(
    events: DataFrame,
    window_s: int = 300,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows: (window_start_us, event_type, n_events,
    sum_value) with window_start_us = floor(epoch_us / window_us) *
    window_us. One groupBy with map-side combine; output cardinality is
    (time range / window) x types — aggregate-side tiny at any corpus
    size."""
    window_us = window_s * 1_000_000
    start = (F.floor(_us(F.col(ts_col)) / window_us) * window_us).cast("long")
    return events.groupBy(
        start.alias("window_start_us"), F.col(type_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
    )
