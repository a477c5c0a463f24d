"""Round-5h driver queries: streaming behavioral analytics.

- ``stream_funnel``: the ordered event funnel executed as a REAL
  Structured Streaming job (streaming/streams.funnel_stream —
  applyInPandasWithState, per-key step-timestamp state, sentinel
  flush) and compared against the batch window-chain funnel in SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark import fixtures as fx

_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One availableNow micro-batch over a parquet fixture (a quarter
    of the users — state groups, not volume, dominate the stateful
    stage); each user gets a ``__flush__`` sentinel an hour after the
    global max timestamp, which emits that user's final funnel row.
    Timestamps ride at µs resolution end-to-end, so the oracle's
    epoch_ns // 1000 matches exactly."""
    from emiproc_spark.driver_queries_r3b import _run_stream
    from emiproc_spark.streaming.streams import funnel_stream

    ev = (
        fx.events(spark, sf_dir)
        .where(F.col("user_id") % 4 == 0)
        .select(
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
            "user_id",
            "event_type",
        )
    )
    cutoff = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = (
        ev.select("user_id")
        .distinct()
        .select(
            F.timestamp_micros(
                F.unix_micros(F.lit(cutoff).cast("timestamp"))
                + F.lit(3_600_000_000)
            ).alias("ts"),
            "user_id",
            F.lit("__flush__").alias("event_type"),
        )
    )
    d = tempfile.mkdtemp(prefix="emiproc_funnel_stream_")
    src = os.path.join(d, "in")
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_type string"
    ).parquet(src)
    out = funnel_stream(stream, _FUNNEL_STEPS)
    res = _run_stream(out, "r5h_stream_funnel", "append")
    return res.select(
        "user_id",
        F.unix_micros("step1_ts").alias("step1_us"),
        F.unix_micros("step2_ts").alias("step2_us"),
        F.unix_micros("step3_ts").alias("step3_us"),
    )


SQL_STREAM_FUNNEL = """
    WITH ev AS (
        SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
        FROM events WHERE user_id % 4 = 0
    ),
    w1 AS (
        SELECT user_id, ts_us, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts_us END)
                   OVER (PARTITION BY user_id) AS s1
        FROM ev
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > s1
                           THEN ts_us END) OVER (PARTITION BY user_id) AS s2
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > s2
                           THEN ts_us END) OVER (PARTITION BY user_id) AS s3
        FROM w2
    )
    SELECT user_id, MIN(s1) AS step1_us, MIN(s2) AS step2_us,
           MIN(s3) AS step3_us
    FROM w3 GROUP BY user_id
"""


QUERIES_R5H = {
    "stream_funnel": q_stream_funnel,
}

ORACLES_R5H = {
    "stream_funnel": SQL_STREAM_FUNNEL,
}
