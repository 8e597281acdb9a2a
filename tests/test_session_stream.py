"""Custom stateful streaming sessionization (streaming/session_stream.py,
applyInPandasWithState) — equality vs the batch session_stats twin."""

import datetime as dt

from itext2kg_spark.streaming.session_stream import FLUSH_TYPE, sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double")


def _rows(spec):
    return [
        (i, T0 + dt.timedelta(seconds=s), u, t, v)
        for i, (s, u, t, v) in enumerate(spec)
    ]


def _run(spark, tmp_path, files, gap_s=600, watermark_s=300):
    src = str(tmp_path / "sess_in")
    ckpt = str(tmp_path / "sess_ckpt")
    emitted = []
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def sink(batch_df, _epoch):
        emitted.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=gap_s, watermark_s=watermark_s)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return emitted


def test_stream_sessions_equal_batch(spark, tmp_path):
    """Every session the batch op finds must stream out identically once a
    far-future flush sentinel advances the watermark past all timeouts."""
    from itext2kg_spark.functions.sessions import session_stats

    spec = [
        (s, 1 + (s * 7) % 4, ("view", "click")[s % 2], 1.0)
        for s in range(0, 5000, 37)
    ] + [(9, 9, "view", 1.0)]  # single-event user
    data = _rows(spec)
    sentinel = [(10_000_000, T0 + dt.timedelta(days=30), 999, FLUSH_TYPE, 0.0)]
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["start_us"], r["end_us"], r["duration_s"]
        )
        for r in _run(spark, tmp_path, [data, sentinel], gap_s=600)
    }
    batch = spark.createDataFrame(data, SCHEMA)
    want = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["start_us"], r["end_us"], r["duration_s"]
        )
        for r in session_stats(batch, gap_s=600).collect()
    }
    assert got == want and len(want) > 1


def test_stream_sessions_close_in_stream_and_by_timeout(spark, tmp_path):
    """A gap WITHIN the stream closes a session without any timeout; the
    final open session only emits when the watermark passes its gap."""
    f1 = _rows([(0, 1, "view", 1.0), (100, 1, "view", 1.0),
                (100 + 601, 1, "view", 1.0)])  # gap>600 closes session 0
    got1 = _run(spark, tmp_path, [f1], gap_s=600)
    keys1 = {(r["user_id"], r["session_seq"]) for r in got1}
    assert keys1 == {(1, 0)}  # session 1 still open, no watermark past it
    assert got1[0]["n_events"] == 2


def test_stream_sessions_state_is_per_user(spark, tmp_path):
    f1 = _rows([(0, 1, "view", 1.0), (0, 2, "view", 1.0),
                (50, 2, "view", 1.0)])
    sentinel = [(10_000_000, T0 + dt.timedelta(days=30), 999, FLUSH_TYPE, 0.0)]
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in _run(spark, tmp_path, [f1, sentinel], gap_s=600)
    }
    assert got == {(1, 0): 1, (2, 0): 2}
