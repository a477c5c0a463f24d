"""SparkSession factory tuned for the engine.

Defaults chosen for scale-out behavior (they are also correct on
``local[*]``): AQE on (runtime re-planning, skew-join splitting,
partition coalescing), broadcast threshold generous enough that
dimension/mapping tables (grids, weights for small targets, speciation
tables) broadcast instead of shuffling, Arrow enabled for the pandas-UDF
geometry kernel.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "emiproc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, ``master``/executor sizing come from spark-submit;
    everything set here is orthogonal to deployment mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        # PySpark 4 wraps EVERY DataFrame/Column API call with Python
        # call-site capture for error context: a conf.get round-trip,
        # PySparkCurrentOrigin.set/clear py4j calls and a Python stack
        # walk per call.  Measured here: a Column op costs 7.2 ms with
        # it on vs 0.6 ms off; query CONSTRUCTION (driver-side, serial
        # on any cluster) dominated several dimension-sized queries.
        # Costs only the file:line origin decoration on error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
