"""Real Structured Streaming drive of the stateful sessionizer:
rate source → applyInPandasWithState (event-time timeout) → memory sink."""

import time

import pytest
from pyspark.sql import functions as F

from emiproc_spark.streaming.streams import sessionize_stream


def test_sessionize_stream(spark):
    # rate ticks → 3 users round-robin; each user's events come in runs
    # of 5 one minute apart, then a 2-hour jump opens the next session
    rate = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    sidx = (F.col("value") / 3).cast("long")
    ts = (
        F.lit("2024-01-01 00:00:00").cast("timestamp")
        + F.make_interval(hours=(sidx / 5).cast("int") * 2)
        + F.make_interval(mins=(sidx % 5).cast("int"))
    )
    events = rate.select(
        (F.col("value") % 3).alias("user_id"),
        ts.alias("ts"),
        F.lit(1.0).alias("value"),
    )
    sessions = sessionize_stream(events, gap="30 minutes", watermark_delay="1 minute")
    assert sessions.isStreaming
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessionize_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("sessionize_test").count() >= 3:
                break
            time.sleep(1)
        rows = spark.table("sessionize_test").collect()
        assert len(rows) >= 3
        for r in rows:
            # every closed session: 5 events, one minute apart, sum 5.0
            assert r["n_events"] == 5
            assert r["sum_value"] == pytest.approx(5.0)
            span = r["session_end"] - r["session_start"]
            assert span.total_seconds() == 4 * 60
        assert {r["user_id"] for r in rows} <= {0, 1, 2}
    finally:
        q.stop()


def test_sessionize_batch_fallback_matches_window_semantics(spark):
    """Round-5 review: the module contract says batch frames work too;
    sessionize_stream on a batch frame now runs the lag/cumsum path."""
    import datetime as dt

    from emiproc_spark.streaming.streams import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (t0, 1, 1.0),
        (t0 + dt.timedelta(minutes=10), 1, 2.0),
        (t0 + dt.timedelta(hours=2), 1, 4.0),     # new session
        (t0, 2, 8.0),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = sessionize_stream(ev, gap="30 minutes").collect()
    got = {(r["user_id"], r["n_events"], r["sum_value"]) for r in out}
    assert got == {(1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)}


def test_sessionize_stream_late_event_not_absorbed(spark, tmp_path):
    """A late event predating the open session's start by more than the
    gap must form its own session — the old min(start) merge produced
    one session spanning an internal super-gap."""
    import datetime as dt
    import uuid

    from emiproc_spark.streaming.streams import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # batch 1: open session 10:00-10:10; batch 2: late 08:30 + sentinel
    b1 = [(t0, 1, 1.0), (t0 + dt.timedelta(minutes=10), 1, 2.0)]
    b2 = [
        (t0 - dt.timedelta(minutes=90), 1, 4.0),          # late, > gap before start
        (t0 + dt.timedelta(hours=6), 1, 0.0),             # sentinel closes all
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(b1, "ts timestamp, user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    name = f"late_sess_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema("ts timestamp, user_id long, value double").parquet(src)
    out = sessionize_stream(stream, gap="30 minutes", watermark_delay="4 hours")
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    spark.createDataFrame(b2, "ts timestamp, user_id long, value double").coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    rows = spark.table(name).collect()
    sessions = {(r["n_events"], r["sum_value"]) for r in rows}
    # the late 08:30 event is its own 1-event session, NOT merged into
    # the 10:00 session
    assert (1, 4.0) in sessions
    assert (3, 7.0) not in sessions


def test_sessionize_null_values_match_batch_sum(spark, tmp_path):
    """A NULL value inside a session counts toward n_events but not
    sum_value (the batch F.sum semantics); a session whose values are
    ALL NULL sums to NULL — previously the stream poisoned the sum to
    NaN while the batch skipped the NULL, a silent parity break."""
    import uuid

    from emiproc_spark.streaming.streams import run_available_now, sessionize_stream

    schema = "ts timestamp, user_id long, value double"
    rows = [
        # user 1: one NULL among real values, one session
        (1.0, 1, 10.0), (2.0, 1, None), (3.0, 1, 5.0),
        # user 2: all-NULL session
        (1.0, 2, None), (2.0, 2, None),
    ]
    df = spark.createDataFrame(
        [(float(t), u, v) for t, u, v in rows], "tsf double, user_id long, value double"
    ).select(
        F.timestamp_seconds(F.col("tsf")).alias("ts"), "user_id", "value"
    )
    want = {1: (3, 15.0), 2: (2, None)}

    batch = sessionize_stream(df, gap="30 seconds")
    got_b = {
        r["user_id"]: (r["n_events"], r["sum_value"]) for r in batch.collect()
    }
    assert got_b == want

    # stream: close sessions via the event-time timeout (a far-future
    # watermark-advancing event for an unrelated key)
    src = str(tmp_path / "in")
    df.unionByName(
        spark.createDataFrame([(99,)], "user_id long").select(
            F.timestamp_seconds(F.lit(10_000.0)).alias("ts"),
            "user_id",
            F.lit(0.0).alias("value"),
        )
    ).coalesce(1).write.parquet(src)
    out = sessionize_stream(
        spark.readStream.schema(schema).parquet(src),
        gap="30 seconds",
        watermark_delay="1 second",
    )
    res = run_available_now(
        out, f"sess_null_{uuid.uuid4().hex[:8]}", "append", timeout=120
    )
    got_s = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in res.collect()
        if r["user_id"] != 99
    }
    assert got_s == want
