"""changelog_state_stream: streaming MERGE state (latest-wins upserts +
deletes) must be arrival-order independent and match the batch
apply_changelog answer over the same feed."""

import pytest
from pyspark.sql import functions as F

from emiproc_spark.streaming.streams import changelog_state_stream


def _drain(out, spark, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_cdc_out_of_order_batches(spark, tmp_path):
    # micro-batches arrive in REVERSE event-time order; the fold is a
    # max so the final state must not care
    rows_late = [(1, 30, 3, "b", 3.0, "upsert"), (2, 31, 4, "z", 9.0, "delete")]
    rows_early = [(1, 10, 1, "a", 1.0, "upsert"), (1, 20, 2, "x", 2.0, "delete"),
                  (2, 11, 5, "y", 8.0, "upsert")]
    schema = "user_id long, tsn long, event_id long, event_type string, value double, op string"
    d = str(tmp_path / "in")
    spark.createDataFrame(rows_late, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(rows_early, schema).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        res = _drain(changelog_state_stream(stream), spark, "t_cdc_ooo")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    final = (
        res.withColumn("mx", F.max("ver").over(w))
        .where(F.col("ver") == F.col("mx"))
    )
    live = {
        r["k"]: (r["sv"], r["dv"])
        for r in final.where(F.col("op") != "delete").collect()
    }
    # user 1: latest change (ts 30) is an upsert AFTER a delete -> alive
    # user 2: latest change (ts 31) is a delete -> gone
    assert live == {1: ("b", 3.0)}


def test_stream_cdc_null_value_stays_null(spark, tmp_path):
    # a NULL change value must survive the fold as NULL, not NaN
    # (float(None) -> NaN diverged from batch apply_changelog)
    rows = [(1, 10, 1, "a", None, "upsert"), (2, 11, 2, "b", 5.0, "upsert")]
    schema = "user_id long, tsn long, event_id long, event_type string, value double, op string"
    d = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    res = _drain(changelog_state_stream(stream), spark, "t_cdc_null")
    got = {r["k"]: r["dv"] for r in res.collect()}
    assert got[1] is None and got[2] == 5.0


def test_stream_cdc_null_key_forms_its_own_group(spark, tmp_path):
    """Spark's groupBy keeps NULL keys (matching the batch operator's
    PARTITION BY user_id), so the sharded fold must carry a NULL-key
    map entry instead of crashing on int(NaN) or dropping the rows."""
    rows = [(None, 10, 1, "a", 1.0, "upsert"), (None, 20, 2, "b", 2.0, "upsert"),
            (7, 11, 3, "c", 3.0, "upsert")]
    schema = "user_id long, tsn long, event_id long, event_type string, value double, op string"
    d = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    res = _drain(changelog_state_stream(stream), spark, "t_cdc_nullkey")
    got = {r["k"]: (r["sv"], r["dv"]) for r in res.collect()}
    assert got[None] == ("b", 2.0)  # latest-wins fold ran for the NULL key
    assert got[7] == ("c", 3.0)


def test_changelog_null_stamps_lose_and_dont_crash(spark, tmp_path):
    """A NULL (ts, tiebreak) change must LOSE to any concrete-stamped
    change for the same key (the batch DESC NULLS LAST) and win only
    for keys that never saw a stamped change — and must never crash
    the fold with int(NaN).  Batch fallback and stream must agree."""
    import uuid

    from emiproc_spark.streaming.streams import (
        changelog_state_stream,
        run_available_now,
    )

    schema = (
        "user_id long, tsn long, event_id long, event_type string, "
        "value double, op string"
    )
    rows = [
        (1, None, None, "null_stamp", 9.0, "upsert"),  # loses to below
        (1, 10, 100, "real", 1.0, "upsert"),
        (2, None, 200, "tb_only", 2.0, "upsert"),      # NULL ts, real tb
        (2, None, 201, "tb_only_hi", 3.0, "upsert"),   # higher tb wins
        (3, None, None, "only_null", 4.0, "upsert"),   # alone: survives
    ]
    df = spark.createDataFrame(rows, schema)
    want = {1: ("real", 1.0), 2: ("tb_only_hi", 3.0), 3: ("only_null", 4.0)}

    batch = changelog_state_stream(df)
    assert batch.columns == ["k", "sv", "dv", "op", "ver"]
    got_b = {r["k"]: (r["sv"], r["dv"]) for r in batch.collect()}
    assert got_b == want

    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    out = changelog_state_stream(
        spark.readStream.schema(schema).parquet(src), n_buckets=3
    )
    res = run_available_now(
        out, f"cdc_null_{uuid.uuid4().hex[:8]}", "update", timeout=120
    )
    final = (
        res.groupBy("k")
        .agg(F.max_by(F.struct("sv", "dv"), "ver").alias("s"))
        .select("k", "s.sv", "s.dv")
    )
    assert {r["k"]: (r["sv"], r["dv"]) for r in final.collect()} == want


def test_changelog_string_keys_pass_through(spark, tmp_path):
    """Non-numeric keys (e.g. string user ids) must ride the fold and
    come back typed — the old fold hardcoded 'k long' and crashed at
    int('u_42')."""
    import uuid

    from emiproc_spark.streaming.streams import (
        changelog_state_stream,
        run_available_now,
    )

    schema = (
        "user_id string, tsn long, event_id long, event_type string, "
        "value double, op string"
    )
    rows = [
        ("u_1", 10, 1, "a", 1.0, "upsert"),
        ("u_1", 20, 2, "b", 2.0, "upsert"),
        ("u_2", 5, 3, "c", 3.0, "delete"),
    ]
    df = spark.createDataFrame(rows, schema)
    want = {"u_1": ("b", "upsert"), "u_2": ("c", "delete")}

    batch = changelog_state_stream(df)
    assert dict(batch.dtypes)["k"] == "string"
    assert {r["k"]: (r["sv"], r["op"]) for r in batch.collect()} == want

    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    out = changelog_state_stream(
        spark.readStream.schema(schema).parquet(src), n_buckets=3
    )
    res = run_available_now(
        out, f"cdc_str_{uuid.uuid4().hex[:8]}", "update", timeout=120
    )
    assert {r["k"]: (r["sv"], r["op"]) for r in res.collect()} == want
