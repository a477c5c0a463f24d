"""Map-only curation operators compose with Structured Streaming
unchanged: the same quality_filter / chunk_documents / scrub_pii plans
run over a file-source stream and equal their batch results."""

import os

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.packing import chunk_documents
from emiproc_spark.operators.text import quality_filter, scrub_pii


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_docs"))
    rows = [
        (i, " ".join(f"w{(i + j) % 97}" for j in range(10 + i % 60)))
        for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _run_stream(spark, doc_dir, transform, sink):
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(doc_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def test_quality_filter_streams(spark, doc_dir):
    fn = lambda df: quality_filter(df, min_tokens=30, max_tokens=60)  # noqa: E731
    got = _run_stream(spark, doc_dir, fn, "qf_sink").select(
        "doc_id", "keep", "reason"
    )
    want = fn(spark.read.parquet(doc_dir)).select("doc_id", "keep", "reason")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_chunking_streams(spark, doc_dir):
    fn = lambda df: chunk_documents(df, size=16, stride=12)  # noqa: E731
    got = _run_stream(spark, doc_dir, fn, "ck_sink")
    want = fn(spark.read.parquet(doc_dir))
    assert got.count() == want.count()
    g = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in got.collect()}
    w = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in want.collect()}
    assert g == w


def test_pii_scrub_streams(spark, doc_dir):
    fn = lambda df: scrub_pii(  # noqa: E731
        df.withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" mail me a@b.co or 415-555-0123")),
        )
    ).select("doc_id", "n_emails", "n_phones", "scrubbed")
    got = _run_stream(spark, doc_dir, fn, "pii_sink")
    want = fn(spark.read.parquet(doc_dir))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
