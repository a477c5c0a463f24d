"""Real Structured Streaming drive of the hourly emission stream:
rate source → stream-static broadcast join → memory sink."""

import time

import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import EMISSIONS, TPROFILE
from emiproc_spark.streaming.streams import hourly_emission_stream


def test_hourly_emission_stream(spark):
    emissions = spark.createDataFrame(
        [(0, "A", "CO2", 8784.0), (1, "B", "CO2", 2.0 * 8784)], schema=EMISSIONS
    )
    daily = [(h + 1) / 300.0 for h in range(24)]
    profiles = spark.createDataFrame([(0, "daily", daily)], schema=TPROFILE)
    index = spark.createDataFrame(
        [("A", "CO2", 0)], schema="category string, substance string, profile_id int"
    )
    stream = hourly_emission_stream(
        spark, emissions, index, profiles, rows_per_second=10
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("hourly_stream_test")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("hourly_stream_test").count()
            if n >= 4:
                break
            time.sleep(1)
        rows = spark.table("hourly_stream_test").collect()
        assert len(rows) >= 4
        by_key = {}
        for r in rows:
            by_key[(r["hour_index"], r["category"])] = r["value_kg_h"]
        # hour 0: A scaled by daily sf = (1/300)*24; B constant
        if (0, "A") in by_key:
            assert by_key[(0, "A")] == pytest.approx(8784.0 / 8784 * (1 / 300 * 24))
        if (0, "B") in by_key:
            assert by_key[(0, "B")] == pytest.approx(2.0)
        # simulation timestamps advance one hour per tick
        ts = sorted({str(r["sim_ts"]) for r in rows})
        assert ts[0].startswith("2024-01-01 00:00")
    finally:
        q.stop()


def test_hourly_stream_guard_scales_with_combos_not_year(spark):
    """The stream's per-micro-batch sf table is combos × the few ticks
    in that batch, so the budget applies to the combos-sized static
    side — an inventory above budget/year_hours combos (which the r11
    batch-style guard would have rejected) must still BUILD; a
    genuinely combo-explosive one must raise by combos alone."""
    import pytest

    from emiproc_spark.operators.temporal import SF_DIM_MAX_ROWS_CONF
    from emiproc_spark.streaming.streams import hourly_emission_stream

    idx = spark.createDataFrame(
        [], "category string, substance string, profile_id int"
    )
    profs = spark.createDataFrame(
        [], "profile_id int, ptype string, ratios array<double>"
    )

    def inventory(n_combos):
        return spark.range(n_combos).select(
            F.lit(0).alias("cell_id"),
            F.concat(F.lit("c"), F.col("id")).alias("category"),
            F.lit("CH4").alias("substance"),
            F.lit(1.0).alias("value_kg_y"),
        )

    # 3000 combos x 8784 h = 26.4M > the 20M default budget, but the
    # per-batch table is 3000 x ~1 — must build
    out = hourly_emission_stream(spark, inventory(3000), idx, profs)
    assert out.isStreaming
    # combos alone past the budget still raises, loudly
    spark.conf.set(SF_DIM_MAX_ROWS_CONF, "1000")
    try:
        with pytest.raises(ValueError, match="hourly_emission_stream.*2000"):
            hourly_emission_stream(spark, inventory(2000), idx, profs)
    finally:
        spark.conf.unset(SF_DIM_MAX_ROWS_CONF)
