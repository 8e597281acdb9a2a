"""Custom stateful streaming: sessionization via applyInPandasWithState.

The third streaming tier. foreachBatch twins (incremental.py,
corpus_stream.py) put state in a queryable store; native watermark+window
(event_stream.py) covers fixed frames; SESSIONS — variable-length,
gap-closed, per-key — need custom keyed state with an event-time expiry,
which is exactly what `applyInPandasWithState` provides (Arrow-batched,
one state object per user, timeout driven by the watermark).

Semantics match the batch pair functions/sessions.py sessionize /
session_stats EXACTLY (equality-tested): sessions break where the gap
between consecutive events of a user exceeds `gap_s`; output is one row
per CLOSED session — (user_id, session_seq, n_events, start_us, end_us,
duration_s). A session closes when a later in-stream event of the same
user exceeds the gap, or when the watermark passes last_ts + gap_s
(event-time timeout — the open session can provably never be extended,
because any event that could extend it would be later than the watermark
and hence dropped).

State per user is four numbers + the session ordinal — O(keys), evicted
on timeout; this is the bounded-state contract that lets the operator run
forever on an unbounded stream. Late events older than the watermark are
dropped by Spark before the function sees them (standard watermark
trade).

Replayable-flush idiom for availableNow/batch-parity runs: append one
far-future sentinel row (`event_type = '__flush__'`, any user) as a LAST
file — it advances the global watermark past every open session's
timeout, so all sessions emit; the sentinel itself is excluded from
sessionization. Production streams don't need it (the watermark advances
with real traffic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLUSH_TYPE = "__flush__"

OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "start_us long, end_us long, duration_s double"
)
STATE_SCHEMA = "seq long, n long, start_us long, end_us long"


def sessionize_stream(
    events_stream: DataFrame,
    gap_s: int = 1800,
    watermark_s: int = 600,
) -> DataFrame:
    """Streaming twin of functions/sessions.py session_stats over an
    events stream with columns (event_id, ts, user_id, event_type). One
    output row per closed session."""
    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            seq, n, start_us, end_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id], "session_seq": [seq],
                    "n_events": [n], "start_us": [start_us],
                    "end_us": [end_us],
                    "duration_s": [(end_us - start_us) / 1_000_000.0],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows["event_type"] != FLUSH_TYPE]
        if len(rows) == 0:
            return
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000  # pandas ns -> us
        if state.exists:
            seq, n, start_us, end_us = state.get
        else:
            seq, n, start_us, end_us = -1, 0, None, None
        out = []
        for t in ts_us:
            t = int(t)
            if n == 0:
                seq, n, start_us, end_us = seq + 1, 1, t, t
            elif t - end_us > gap_us:
                out.append((seq, n, start_us, end_us))
                seq, n, start_us, end_us = seq + 1, 1, t, t
            else:
                n += 1
                end_us = t
        state.update((seq, n, start_us, end_us))
        # event-time timeout: the open session dies when the watermark
        # passes its last event + gap (timestamp in MILLIS)
        state.setTimeoutTimestamp(end_us // 1000 + gap_s * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_seq": [o[0] for o in out],
                    "n_events": [o[1] for o in out],
                    "start_us": [o[2] for o in out],
                    "end_us": [o[3] for o in out],
                    "duration_s": [
                        (o[3] - o[2]) / 1_000_000.0 for o in out
                    ],
                }
            )

    from pyspark.sql import functions as F

    # lift TIMESTAMP_NTZ (plain parquet) to TIMESTAMP — watermarks require
    # it; the engine pins the session to UTC so the lift is the identity
    # (same contract as functions/sessions.py _us)
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
