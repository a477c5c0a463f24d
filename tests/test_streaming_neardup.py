"""Real Structured Streaming drive of the stateful LSH near-dup
operator: rate source → stateless map-only signatures → banded buckets
→ applyInPandasWithState pair emission → memory sink."""

import time

from pyspark.sql import functions as F

from emiproc_spark.streaming.streams import near_dup_stream, run_available_now


def _docs_from_rate(rate):
    """20 distinct synthetic texts, repeated as the stream advances —
    same value%20 ⇒ identical text ⇒ guaranteed near-dup."""
    tpl = F.col("value") % 20
    text = F.concat_ws(
        " ",
        F.lit("alpha"),
        F.concat(F.lit("w"), tpl.cast("string")),
        F.lit("beta gamma"),
        F.concat(F.lit("x"), tpl.cast("string")),
        F.lit("delta epsilon zeta"),
    )
    return rate.select(F.col("value").alias("doc_id"), text.alias("text"))


def test_near_dup_stream_emits_cross_batch_pairs(spark):
    rate = spark.readStream.format("rate").option("rowsPerSecond", 40).load()
    pairs = near_dup_stream(_docs_from_rate(rate))
    assert pairs.isStreaming
    q = (
        pairs.writeStream.format("memory")
        .queryName("neardup_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("neardup_test").count() >= 40:
                break
            time.sleep(1)
        rows = spark.table("neardup_test").collect()
        assert len(rows) >= 40
        for r in rows:
            assert r["doc_a"] < r["doc_b"]
            # identical-template docs only: no false cross-template pair
            assert r["doc_a"] % 20 == r["doc_b"] % 20
    finally:
        q.stop()


def test_near_dup_batch_path_matches_lsh(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha w{i % 3} beta gamma x{i % 3} delta epsilon zeta") for i in range(9)],
        "doc_id long, text string",
    )
    out = near_dup_stream(docs)
    # batch fallback emits the same columns as the streaming path
    assert out.columns == ["doc_a", "doc_b", "bucket"]
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    expected = {
        (a, b)
        for a in range(9)
        for b in range(a + 1, 9)
        if a % 3 == b % 3
    }
    assert got == expected


def test_near_dup_non_numeric_ids_raise(spark):
    import pytest

    docs = spark.createDataFrame(
        [
            ("u-1", "alpha beta gamma delta epsilon zeta eta theta"),
            ("u-2", "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="non-numeric doc_id|CAST_INVALID_INPUT"):
        near_dup_stream(docs).collect()


def test_near_dup_null_ids_dropped_both_paths(spark, tmp_path):
    """A NULL doc_id must not crash the stateful operator (int(NaN))
    nor differ between the batch and streaming paths — both drop it."""
    import uuid

    from emiproc_spark.streaming.streams import near_dup_stream

    rows = [(None, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch = near_dup_stream(docs, n=3, k=8, bands=4).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in batch} == {(1, 2)}

    src = str(tmp_path / "in")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = near_dup_stream(stream, n=3, k=8, bands=4, state_ttl="1 hour")
    name = f"nd_null_{uuid.uuid4().hex[:8]}"
    res = run_available_now(out, name, "append", no_data_batches=False, timeout=120)
    assert {(r["doc_a"], r["doc_b"]) for r in res.collect()} == {(1, 2)}


def test_near_dup_batch_fallback_honors_max_bucket(spark):
    """The batch fallback applies the same rank-cap as the stream: pair
    (a, b) only when a's in-bucket id-rank is <= max_bucket (an
    unguarded self-join would go quadratic on stop-shingle buckets)."""
    from emiproc_spark.streaming.streams import near_dup_stream

    docs = spark.createDataFrame(
        [(i, "same same same text everywhere") for i in range(6)],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_stream(docs, n=3, k=8, bands=4, max_bucket=2).collect()
    }
    # members are ids 0 and 1; every later id pairs only against them
    want = {(0, 1)} | {(0, i) for i in range(2, 6)} | {(1, i) for i in range(2, 6)}
    assert pairs == want


def test_run_available_now_terminates_naturally_and_clean(spark, tmp_path, capfd):
    """ProcessingTimeTimeout state would keep an availableNow run
    cycling no-data cleanup batches until the TTL; with
    no_data_batches=False the run ends by itself after the last data
    batch — no stop() racing a state commit, so the JVM stderr carries
    no error-level state lines.  With the default (True) the same run
    never terminates and the helper's timeout turns that into a
    TimeoutError instead of a silent hang."""
    import uuid

    import pytest

    rows = [(i, f"alpha w{i % 3} beta gamma x{i % 3} delta epsilon zeta")
            for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "in")
    docs.coalesce(2).write.parquet(src)

    def _stream():
        s = (spark.readStream.schema("doc_id long, text string")
             .option("maxFilesPerTrigger", "1").parquet(src))
        return near_dup_stream(s, n=3, k=8, bands=4, state_ttl="1 hour")

    capfd.readouterr()
    res = run_available_now(
        _stream(), f"nd_clean_{uuid.uuid4().hex[:8]}", "append",
        no_data_batches=False, timeout=120,
    )
    got = {(r["doc_a"], r["doc_b"]) for r in res.collect()}
    expected = {(a, b) for a in range(9) for b in range(a + 1, 9) if a % 3 == b % 3}
    assert got == expected
    err = capfd.readouterr().err
    bad = [ln for ln in err.splitlines()
           if "failedToCommitStateFileError" in ln or " ERROR " in ln]
    assert not bad, f"error-level log lines during the drain: {bad[:3]}"

    with pytest.raises(TimeoutError, match="no_data_batches=False"):
        run_available_now(
            _stream(), f"nd_hang_{uuid.uuid4().hex[:8]}", "append",
            no_data_batches=True, timeout=8,
        )
    # the conf is restored either way
    assert spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", None
    ) is None


def test_near_dup_stream_members_span_arrow_chunks(spark, tmp_path):
    """The member set must be the first max_bucket SORTED ids of the
    whole micro-batch even when a bucket's rows straddle Arrow chunk
    boundaries — the fold unions chunks before admitting members
    (per-chunk folding would let a high id in an early chunk steal a
    member slot)."""
    import uuid

    rows = [(i, "same same same text everywhere") for i in (7, 6, 5, 4, 3, 2, 1, 0)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "in")
    docs.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        out = near_dup_stream(stream, n=3, k=8, bands=4, max_bucket=2)
        name = f"nd_chunks_{uuid.uuid4().hex[:8]}"
        res = run_available_now(
            out, name, "append", no_data_batches=False, timeout=120
        )
        pairs = {(r["doc_a"], r["doc_b"]) for r in res.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    # members are ids 0 and 1 (batch-wide sorted), exactly like the
    # batch fallback's rank cap
    want = {(0, 1)} | {(0, i) for i in range(2, 8)} | {(1, i) for i in range(2, 8)}
    assert pairs == want


def test_near_dup_batch_fallback_bootstrap_live_overlap(spark, tmp_path):
    """A doc_id appearing BOTH bootstrap-flagged and live in one frame
    must emit nothing (the fold's seen-set admits the flagged copy and
    dedups the live one) — before the r11 fix the batch rank-join let
    the live copy pair against the other bootstrap members, re-emitting
    historical pairs.  Both paths are driven with the identical frame
    and must agree."""
    import uuid

    text = "alpha w0 beta gamma x0 delta epsilon zeta"
    rows = [(i, text, True) for i in range(4)]  # bootstrap corpus
    rows += [(1, text, False)]                  # overlap: also live
    rows += [(10, text, False)]                 # genuinely new doc
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, __bootstrap boolean"
    )
    want = {(i, 10) for i in range(4)}  # only the new doc pairs

    batch = near_dup_stream(docs, n=3, k=8, bands=4)
    got_batch = {(r["doc_a"], r["doc_b"]) for r in batch.collect()}
    assert got_batch == want

    src = str(tmp_path / "in")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, __bootstrap boolean"
    ).parquet(src)
    out = near_dup_stream(stream, n=3, k=8, bands=4, state_ttl="1 hour")
    name = f"nd_overlap_{uuid.uuid4().hex[:8]}"
    res = run_available_now(
        out, name, "append", no_data_batches=False, timeout=120
    )
    assert {(r["doc_a"], r["doc_b"]) for r in res.collect()} == want
