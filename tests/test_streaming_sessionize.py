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
