"""Real Structured Streaming drive of the stateful funnel:
file source → applyInPandasWithState (sentinel flush) → memory sink."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from emiproc_spark.streaming.streams import funnel_stream


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_funnel_stream_file_source(spark, tmp_path):
    rows = [
        # user 1 converts all three steps in order
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2: purchase BEFORE click — chain stops at click
        (2, _ts(1), "view"),
        (2, _ts(2), "purchase"),
        (2, _ts(3), "click"),
        # user 3: never views
        (3, _ts(1), "click"),
        # sentinels flush every user's final state
        (1, _ts(30), "__flush__"),
        (2, _ts(30), "__flush__"),
        (3, _ts(30), "__flush__"),
    ]
    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(
        rows, schema="user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(src)
    out = funnel_stream(stream, ["view", "click", "purchase"])
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {r["user_id"]: r for r in spark.table("funnel_stream_test").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["step1_ts"] == _ts(1)
    assert got[1]["step2_ts"] == _ts(2)
    assert got[1]["step3_ts"] == _ts(3)
    assert got[2]["step2_ts"] == _ts(3)
    assert got[2]["step3_ts"] is None  # purchase preceded the click
    assert got[3]["step1_ts"] is None


def test_funnel_stream_batch_fallback(spark):
    ev = spark.createDataFrame(
        [(1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(30), "__flush__")],
        schema="user_id long, ts timestamp, event_type string",
    )
    row = funnel_stream(ev, ["view", "click"]).collect()[0]
    # flush sentinels are stripped, semantics = funnel_user_steps
    assert row["step1_ts"] == _ts(1)
    assert row["step2_ts"] == _ts(2)


def test_funnel_stream_validations(spark):
    ev = spark.createDataFrame(
        [(1, _ts(1), "view")], schema="user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError, match="at least one step"):
        funnel_stream(ev, [])
    with pytest.raises(ValueError, match="flush_type"):
        funnel_stream(ev, ["view"], flush_type="view")


def test_funnel_stream_repeated_step_name(spark, tmp_path):
    """A 'second visit' funnel ['view', 'view'] must fill BOTH stages
    from two distinct views, like the batch window chain."""
    rows = [
        (1, _ts(1), "view"),
        (1, _ts(2), "view"),
        (1, _ts(30), "__flush__"),
    ]
    src = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(
        rows, schema="user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(src)
    q = (
        funnel_stream(stream, ["view", "view"])
        .writeStream.format("memory")
        .queryName("funnel_repeat_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    row = spark.table("funnel_repeat_test").collect()[0]
    assert row["step1_ts"] == _ts(1)
    assert row["step2_ts"] == _ts(2)


def test_funnel_stream_null_key_not_dropped(spark, tmp_path):
    """pandas groupby drops NaN groups by default; the sharded fold
    must keep the NULL-key funnel (Spark's groupBy kept it)."""
    import uuid

    from emiproc_spark.streaming.streams import funnel_stream

    schema = "ts timestamp, user_id long, event_type string"
    rows = [("2024-01-01 00:00:01", None, "view"),
            ("2024-01-01 00:00:02", None, "click"),
            ("2024-01-01 00:00:03", 5, "view"),
            ("2024-01-01 00:01:00", None, "__flush__"),
            ("2024-01-01 00:01:00", 5, "__flush__")]
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime.fromisoformat(t), u, e) for t, u, e in rows],
        schema,
    )
    d = str(tmp_path / "in")
    df.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    out = funnel_stream(stream, ["view", "click"])
    name = f"funnel_null_{uuid.uuid4().hex[:8]}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["user_id"]: (r["step1_ts"], r["step2_ts"])
           for r in spark.table(name).collect()}
    assert set(got) == {None, 5}
    assert got[None][0] is not None and got[None][1] is not None
    assert got[5][0] is not None and got[5][1] is None


def test_funnel_forced_equal_ts_batch_matches_stream(spark, tmp_path):
    """Forced-tie contract: equal-timestamp events must produce the
    SAME step stamps in the batch min-chain and the stream fold (the
    fold compares only ts values against strict > bounds; the
    (ts, event_id) sort pins its iteration order)."""
    import uuid

    from emiproc_spark.operators.behavior import funnel_user_steps

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    rows = [
        # user 1: view and click at the SAME second — strict order
        # means the click cannot convert; a later click does
        (1, _ts(1), 11, "view"),
        (1, _ts(1), 10, "click"),   # event_id puts the click FIRST
        (1, _ts(2), 12, "click"),
        # user 2: two views at the same second, repeated-step funnel
        # ['view', 'click'] — only one view matters; tie on click too
        (2, _ts(1), 20, "view"),
        (2, _ts(1), 21, "view"),
        (2, _ts(3), 22, "click"),
        # user 3: everything at one instant — chain stops at step 1
        (3, _ts(5), 30, "view"),
        (3, _ts(5), 31, "click"),
    ]
    steps = ["view", "click"]
    df = spark.createDataFrame(rows, schema)
    # ONE call site serves both paths: funnel_stream on a batch frame
    # dispatches to funnel_user_steps, passing tb_col through (where it
    # is deliberately ignored — the min-chain orders nothing)
    batch = {
        r["user_id"]: (r["step1_ts"], r["step2_ts"])
        for r in funnel_stream(df, steps, tb_col="event_id").collect()
    }
    assert batch == {
        r["user_id"]: (r["step1_ts"], r["step2_ts"])
        for r in funnel_user_steps(df, steps, tb_col="event_id").collect()
    }
    flushes = [(u, _ts(30), 99, "__flush__") for u in (1, 2, 3)]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows + flushes, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    name = f"funnel_ties_{uuid.uuid4().hex[:8]}"
    q = (
        funnel_stream(stream, steps)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    streamed = {
        r["user_id"]: (r["step1_ts"], r["step2_ts"])
        for r in spark.table(name).collect()
    }
    assert streamed == batch
    assert batch[1] == (_ts(1), _ts(2))
    assert batch[2] == (_ts(1), _ts(3))
    assert batch[3] == (_ts(5), None)


def test_derive_shards_floor_and_scaling(spark):
    """Shard default = max(floor, defaultParallelism x per_core): the
    floor dominates on this local master; a big-cluster parallelism
    scales linearly without manual tuning."""
    from emiproc_spark.streaming.streams import derive_shards

    df = spark.range(1)
    par = spark.sparkContext.defaultParallelism
    assert derive_shards(df, 4096) == max(4096, par * 4)
    assert derive_shards(df, 1) == par * 4
    assert derive_shards(df, 10**6) == 10**6


def test_derive_shards_conf_pin(spark):
    """spark.emiproc.stream.shards pins the count EXACTLY (no floor —
    a pin exists for checkpoint stability across resizes, so silently
    raising it to the floor would defeat it); unset restores the
    derived default."""
    from emiproc_spark.streaming.streams import SHARDS_CONF_KEY, derive_shards

    df = spark.range(1)
    try:
        spark.conf.set(SHARDS_CONF_KEY, "7")
        assert derive_shards(df, 4096) == 7
        assert derive_shards(df, 1) == 7
        spark.conf.set(SHARDS_CONF_KEY, "0")
        with pytest.raises(ValueError, match="must be >= 1"):
            derive_shards(df, 4096)
        spark.conf.set(SHARDS_CONF_KEY, "junk")
        with pytest.raises(ValueError):
            derive_shards(df, 4096)
    finally:
        spark.conf.unset(SHARDS_CONF_KEY)
    par = spark.sparkContext.defaultParallelism
    assert derive_shards(df, 4096) == max(4096, par * 4)


def test_shards_conf_pin_reaches_stream_plan(spark, tmp_path):
    """The conf pin must land in the actual stream's grouping
    expression — the shard literal inside pmod(xxhash64(key), N) — not
    just in the helper's return value."""
    import os

    from emiproc_spark.streaming.streams import SHARDS_CONF_KEY

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, _ts(1), "view")], "user_id long, ts timestamp, event_type string"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(src)
    try:
        spark.conf.set(SHARDS_CONF_KEY, "7")
        out = funnel_stream(stream, ["view"])
    finally:
        spark.conf.unset(SHARDS_CONF_KEY)
    import re

    plan = out._jdf.queryExecution().analyzed().toString()
    assert re.search(
        r"pmod\(xxhash64\(user_id#\d+L?, 42\), cast\(7 as bigint\)\)", plan
    ), plan
    del os
