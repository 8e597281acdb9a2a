"""Sessionization + windowed counts: semantics, plan shape, and the native
watermarked streaming twin (batch equality, late-data drop)."""

import datetime as dt

import pyspark.sql.functions as F

from itext2kg_spark.functions.sessions import (
    session_stats,
    sessionize,
    windowed_counts,
)
from itext2kg_spark.streaming.event_stream import windowed_counts_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, t, v)
         for i, (s, u, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_sessionize_breaks_on_gap(spark):
    ev = _ev(spark, [
        (0, 1, "view", 1.0),
        (100, 1, "click", 1.0),
        (100 + 1800, 1, "view", 1.0),      # exactly gap: same session
        (100 + 1800 + 1801, 1, "view", 1.0),  # gap exceeded: new session
        (50, 2, "view", 1.0),              # other user: own sessions
    ])
    out = sessionize(ev, gap_s=1800).orderBy("event_id").collect()
    assert [r["session_seq"] for r in out] == [0, 0, 0, 1, 0]
    assert out[0]["session_id"] == 1_000_000
    assert out[3]["session_id"] == 1_000_001
    assert out[4]["session_id"] == 2_000_000


def test_session_stats(spark):
    ev = _ev(spark, [
        (0, 1, "view", 1.0),
        (10, 1, "click", 1.0),
        (4000, 1, "view", 1.0),
    ])
    out = {(r["user_id"], r["session_seq"]): r
           for r in session_stats(ev, gap_s=1800).collect()}
    assert out[(1, 0)]["n_events"] == 2
    assert out[(1, 0)]["duration_s"] == 10.0
    assert out[(1, 1)]["n_events"] == 1
    assert out[(1, 1)]["duration_s"] == 0.0


def test_session_stats_single_shuffle(spark):
    """The per-session groupBy must reuse the sessionize window's user_id
    exchange (hash(user_id) clusters (user_id, session_seq)) — exactly one
    shuffle in the whole plan."""
    ev = _ev(spark, [(i, 1 + i % 3, "view", 1.0) for i in range(30)])
    out = session_stats(ev, gap_s=60)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in final


def test_native_session_window_agrees_off_boundary(spark):
    """Away from exact-gap boundaries the native session_window rollup
    equals the sessionize-derived one (same (user, session-start, count)
    triples) — the interop contract that lets a streaming session job and
    a batch backfill coexist."""
    from itext2kg_spark.functions.sessions import session_stats_native

    ev = _ev(spark, [
        (0, 1, "view", 1.0), (500, 1, "view", 1.0),        # one session
        (500 + 1801, 1, "view", 1.0),                       # gap exceeded
        (40, 2, "view", 1.0), (40 + 3601, 2, "view", 1.0),
    ])
    native = sorted(
        (r["user_id"], r["start_us"], r["n_events"])
        for r in session_stats_native(ev, gap_s=1800).collect()
    )
    derived = sorted(
        (r["user_id"], r["start_us"], r["n_events"])
        for r in session_stats(ev, gap_s=1800).collect()
    )
    assert native == derived and len(native) == 4


def test_native_session_window_boundary_agreement(spark):
    """The exact-gap edge MERGES in both formulations (diff <= gap -> same
    session; diff just over -> split) — verified so the interop claim
    covers the boundary, not just the interior."""
    from itext2kg_spark.functions.sessions import session_stats_native

    at_gap = _ev(spark, [(0, 1, "view", 1.0), (1800, 1, "view", 1.0)])
    assert session_stats_native(at_gap, gap_s=1800).count() == 1
    assert session_stats(at_gap, gap_s=1800).count() == 1
    over = _ev(spark, [(0, 1, "view", 1.0), (1801, 1, "view", 1.0)])
    assert session_stats_native(over, gap_s=1800).count() == 2
    assert session_stats(over, gap_s=1800).count() == 2


def test_native_session_window_streams(spark, tmp_path):
    """The native operator's purpose: the SAME rollup runs under the
    streaming engine (where the lag+cumsum formulation cannot)."""
    from itext2kg_spark.functions.sessions import session_stats_native

    ev = _ev(spark, [
        (0, 1, "view", 1.0), (10, 1, "view", 1.0), (5000, 1, "view", 1.0),
        (7, 2, "view", 1.0),
    ])
    src = str(tmp_path / "sess_in")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        session_stats_native(stream.withWatermark("ts", "600 seconds"),
                             gap_s=1800)
        .writeStream.format("memory")
        .queryName("sess_native")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("sess_native").collect())
    want = sorted(tuple(r) for r in session_stats_native(ev, gap_s=1800).collect())
    assert got == want and len(got) == 3


def test_windowed_counts_buckets(spark):
    ev = _ev(spark, [
        (0, 1, "view", 1.5),
        (299, 2, "view", 2.5),
        (300, 1, "view", 4.0),   # next tumbling bucket
        (301, 1, "click", 8.0),
    ])
    out = {(r["window_start_us"], r["event_type"]): r
           for r in windowed_counts(ev, window_s=300).collect()}
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert out[(base, "view")]["n_events"] == 2
    assert out[(base, "view")]["sum_value"] == 4.0
    assert out[(base + 300_000_000, "view")]["n_events"] == 1
    assert out[(base + 300_000_000, "click")]["sum_value"] == 8.0


def test_hopping_counts_equal_native_sliding_window(spark):
    """The epoch-floor hopping enumeration equals F.window's native
    slideDuration windows frame-for-frame (the interop contract that makes
    the SQL oracle's arithmetic the same thing the streaming engine would
    compute)."""
    from itext2kg_spark.functions.sessions import hopping_counts

    ev = _ev(spark, [
        (s, 1 + s % 5, ("view", "click")[s % 2], float(s % 7))
        for s in range(0, 1500, 11)
    ])
    got = sorted(
        tuple(r) for r in hopping_counts(ev, window_s=300, slide_s=100).collect()
    )
    native = (
        ev.groupBy(F.window("ts", "300 seconds", "100 seconds"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type", "n_events", "sum_value",
        )
    )
    want = sorted(tuple(r) for r in native.collect())
    assert got == want and len(got) > 0
    # every event appears in exactly window/slide = 3 windows
    total = sum(r[2] for r in got)
    assert total == ev.count() * 3


def test_hopping_counts_rejects_nonmultiple(spark):
    import pytest

    from itext2kg_spark.functions.sessions import hopping_counts

    ev = _ev(spark, [(0, 1, "view", 1.0)])
    with pytest.raises(ValueError):
        hopping_counts(ev, window_s=300, slide_s=77)


def test_stream_windows_equal_batch(spark, tmp_path):
    """The native watermark+window streaming operator produces exactly the
    batch windowed_counts frames over the same data (complete mode drains
    every window under availableNow)."""
    ev = _ev(spark, [
        (s, 1 + s % 5, ("view", "click")[s % 2], float(s % 7))
        for s in range(0, 2000, 13)
    ])
    src = str(tmp_path / "events_in")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_counts_stream(stream, window_s=300, watermark_s=600)
        .writeStream.format("memory")
        .queryName("win_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.table("win_eq").collect()
    )
    want = sorted(tuple(r) for r in windowed_counts(ev, window_s=300).collect())
    assert got == want and len(got) > 0


def test_stream_watermark_drops_late_event(spark, tmp_path):
    """Append mode + watermark across restarts (checkpointed state): a
    micro-batch whose max event time advances the watermark past an old
    window finalizes and emits it; an event arriving AFTER that — older
    than the watermark — is dropped, never merged or re-emitted. (The
    memory sink truncates per restart, so each phase asserts its own
    emissions.)"""
    src = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def run_once():
        # foreachBatch sink (the memory sink cannot recover a checkpoint);
        # in append mode it receives only windows finalized by the watermark
        emitted = []

        def sink(batch_df, _epoch):
            emitted.extend(batch_df.collect())

        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_counts_stream(stream, window_s=300, watermark_s=300)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["window_start_us"], r["event_type"]): r for r in emitted}

    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # phase 1: two events in the first window; watermark stays below its
    # end, so nothing is emitted yet
    _ev(spark, [(0, 1, "view", 1.0), (100, 1, "view", 1.0)]).write.mode(
        "append"
    ).parquet(src)
    out1 = run_once()
    assert (base, "view") not in out1
    # phase 2: a far-future event advances the watermark to 4700s; the
    # first window finalizes and emits with exactly its two events
    _ev(spark, [(5000, 2, "view", 9.0)]).write.mode("append").parquet(src)
    out2 = run_once()
    first = out2[(base, "view")]
    assert first["n_events"] == 2 and first["sum_value"] == 2.0
    # phase 3: an event 4690s older than the watermark targets the
    # finalized window — dropped from state, window NOT re-emitted
    _ev(spark, [(10, 1, "view", 100.0)]).write.mode("append").parquet(src)
    out3 = run_once()
    assert (base, "view") not in out3


def test_stream_hopping_equal_batch(spark, tmp_path):
    """F.window(slideDuration) under the streaming engine produces exactly
    the batch hopping_counts frames over the same data (VERDICT r5 ask #6;
    the batch path enumerates epoch-aligned slide starts by explode, the
    stream uses the native sliding window — same frames, same aggregates)."""
    from itext2kg_spark.functions.sessions import hopping_counts
    from itext2kg_spark.streaming.event_stream import hopping_counts_stream

    ev = _ev(spark, [
        (s, 1 + s % 5, ("view", "click")[s % 2], float(s % 7))
        for s in range(0, 2000, 13)
    ])
    src = str(tmp_path / "hop_in")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        hopping_counts_stream(stream, window_s=300, slide_s=100,
                              watermark_s=600)
        .writeStream.format("memory")
        .queryName("hop_eq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("hop_eq").collect())
    want = sorted(
        tuple(r)
        for r in hopping_counts(ev, window_s=300, slide_s=100).collect()
    )
    assert got == want and len(got) > 0


def test_stream_hopping_watermark_drops_late_event(spark, tmp_path):
    """Append-mode hopping stream: a watermark advance finalizes ALL slides
    covering an old event; a later-than-watermark event is dropped, no
    finalized slide re-emits (mirror of the tumbling-twin late-drop test)."""
    from itext2kg_spark.streaming.event_stream import hopping_counts_stream

    src = str(tmp_path / "hop_late_in")
    ckpt = str(tmp_path / "hop_late_ckpt")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")

    def run_once():
        emitted = []

        def sink(batch_df, _epoch):
            emitted.extend(batch_df.collect())

        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            hopping_counts_stream(stream, window_s=300, slide_s=100,
                                  watermark_s=300)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["window_start_us"], r["event_type"]): r for r in emitted}

    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    slide_us = 100 * 1_000_000
    # phase 1: one event at t=150 -> occupies slides starting at -100, 0,
    # +100; watermark below every slide end, nothing emitted
    _ev(spark, [(150, 1, "view", 2.0)]).write.mode("append").parquet(src)
    out1 = run_once()
    assert not out1
    # phase 2: far-future event advances the watermark; all three slides
    # finalize with the event counted once each
    _ev(spark, [(5000, 2, "view", 9.0)]).write.mode("append").parquet(src)
    out2 = run_once()
    for k in (-1, 0, 1):
        row = out2[(base + k * slide_us, "view")]
        assert row["n_events"] == 1 and row["sum_value"] == 2.0
    # phase 3: an event older than the watermark targets those finalized
    # slides — dropped, nothing re-emitted for them
    _ev(spark, [(160, 1, "view", 100.0)]).write.mode("append").parquet(src)
    out3 = run_once()
    for k in (-1, 0, 1):
        assert (base + k * slide_us, "view") not in out3
