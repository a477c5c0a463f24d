import os
import tempfile

import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import EMISSIONS
from emiproc_spark.exports.writers import (
    add_totals,
    export_hourly_parquet,
    export_raster_parquet,
    nc_cf_attributes,
    regionize,
    tz_shifted_ratios,
    with_flux_units,
)
from emiproc_spark.grids import regular_grid
from emiproc_spark.sources.readers import convert_units, from_wide, to_wide
from emiproc_spark.streaming.streams import dedup_stream, windowed_event_stats


@pytest.fixture(scope="module")
def emissions(spark):
    rows = [(c, "cat", "CO2", float(c + 1)) for c in range(4)]
    return spark.createDataFrame(rows, schema=EMISSIONS).cache()


@pytest.fixture(scope="module")
def grid(spark):
    return regular_grid(spark, 0.0, 0.0, 2, 2, 1.0, 1.0, with_geometry=False).cache()


def test_flux_units(emissions, grid):
    out = with_flux_units(emissions, grid).collect()[0]
    assert out["flux_kg_m2_s"] == pytest.approx(
        out["value_kg_y"] / 1.0 / (365.25 * 24 * 3600)
    )


def test_add_totals(emissions):
    rows = {(r["substance"], r["category"]): r["total_kg_y"] for r in add_totals(emissions).collect()}
    assert rows[("CO2", "cat")] == 10.0
    assert rows[("CO2", "__total__")] == 10.0


def test_raster_and_hourly_exports(emissions, grid, spark):
    with tempfile.TemporaryDirectory() as d:
        export_raster_parquet(emissions, grid, f"{d}/raster")
        back = spark.read.parquet(f"{d}/raster")
        assert back.count() == 4
        assert "lon" in back.columns and "cat__CO2" in back.columns
        hourly = emissions.withColumn("hour_index", F.col("cell_id") % 2)
        export_hourly_parquet(hourly, f"{d}/hourly")
        assert len([p for p in os.listdir(f"{d}/hourly") if p.startswith("hour_index=")]) == 2


def test_regionize(spark):
    cell_tz = spark.createDataFrame(
        [(0, "Europe/Zurich"), (1, "Europe/Zurich"), (2, "Europe/Paris")],
        schema="cell_id long, tzid string",
    )
    idx = spark.createDataFrame([(0, 5), (1, 5), (2, 5)], schema="cell_id long, profile_id int")
    out = regionize(cell_tz, idx)
    regions = {r["cell_id"]: r["region_id"] for r in out.collect()}
    assert regions[0] == regions[1] != regions[2]


def test_tz_shifted_ratios(spark):
    prof = spark.createDataFrame(
        [(0, "daily", [float(h) for h in range(24)])],
        schema="profile_id int, ptype string, ratios array<double>",
    )
    shift = spark.createDataFrame([(2,)], schema="shift_h int")
    out = tz_shifted_ratios(prof, shift).collect()[0]["ratios_local"]
    assert out[0] == 2.0 and out[23] == 1.0


def test_nc_cf_attributes():
    attrs = nc_cf_attributes("test", ["CO2", "CH4"], 2024)
    assert attrs["Conventions"] == "CF-1.10"
    assert attrs["substances"] == "CH4,CO2"


def test_wide_roundtrip(spark, emissions):
    w = to_wide(emissions)
    back = from_wide(w)
    assert back.agg(F.sum("value_kg_y")).collect()[0][0] == pytest.approx(10.0)


def test_convert_units(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "v double, area_m2 double")
    assert convert_units(df, "v", "t/y").collect()[0]["value_kg_y"] == 2000.0
    assert convert_units(df, "v", "kg/m2/y").collect()[0]["value_kg_y"] == 6.0
    with pytest.raises(ValueError):
        convert_units(df, "v", "furlongs")


def test_windowed_event_stats_batch(spark):
    rows = [
        ("2024-01-01 00:10:00", "a", 1.0),
        ("2024-01-01 00:50:00", "a", 2.0),
        ("2024-01-01 01:10:00", "a", 4.0),
    ]
    ev = spark.createDataFrame(rows, schema="ts string, event_type string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {str(r["window_start"]): r["sum_value"] for r in windowed_event_stats(ev).collect()}
    assert len(out) == 2
    assert 3.0 in out.values() and 4.0 in out.values()


def test_dedup_stream_batch(spark):
    ev = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], schema="event_id long, payload string"
    )
    assert dedup_stream(ev, ["event_id"]).count() == 2


def test_streaming_end_to_end(spark):
    """Real Structured Streaming smoke: rate source → windowed agg →
    memory sink with availableNow trigger."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    ev = rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 3).cast("string").alias("event_type"),
        F.col("value").cast("double").alias("value"),
    )
    agg = windowed_event_stats(ev, window_duration="10 seconds", watermark_delay="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    spark.table("stream_smoke")  # table exists; rows may be withheld by watermark
    assert not q.isActive


def test_asof_enrich_stream_real_run(spark, tmp_path):
    """Stream-stream time-interval left-outer join through a real
    availableNow run: matched clicks carry every view in the window,
    unmatched clicks flush with NULLs once the sentinel advances the
    watermark."""
    import pyspark.sql.functions as F

    from emiproc_spark.streaming.streams import asof_enrich_stream

    us = 1_000_000
    base = 1_700_000_000 * us
    far = base + 7200 * us  # sentinel past every window
    clicks = [(1, base + 600 * us, 7), (2, base + 4000 * us, 7),
              (3, base + 650 * us, 8), (-1, far, -1)]
    views = [(10, base + 500 * us, 7), (11, base + 550 * us, 7),
             (12, base, 7), (-1, far, -1)]
    for rows, name in ((clicks, "clicks"), (views, "views")):
        spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long"
        ).select(
            "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(str(tmp_path / name))
    schema = "event_id long, ts timestamp, user_id long"
    c = spark.readStream.schema(schema).parquet(str(tmp_path / "clicks"))
    v = (spark.readStream.schema(schema).parquet(str(tmp_path / "views"))
         .withColumnRenamed("event_id", "view_id"))
    out = asof_enrich_stream(c, v, tolerance="10 minutes", value_cols=["view_id"])
    q = (out.writeStream.format("memory").queryName("asof_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("asof_t").where(F.col("user_id") >= 0).collect()
    by_click = {}
    for r in rows:
        by_click.setdefault(r["event_id"], set()).add(r["view_id"])
    # click 1 (user 7, t+600s): views at t+500 and t+550 in window; the
    # view at t+0 is 10 min + 0s BEFORE? 600s - 0s = 600s = window edge
    assert by_click[1] == {10, 11, 12}
    assert by_click[2] == {None}  # user 7 but views long stale
    assert by_click[3] == {None}  # user 8 has no views at all


def test_heavy_hitters_stream_multi_batch_decay(spark, tmp_path):
    """Streaming Misra-Gries with capacity BELOW the shard cardinality:
    across 3 micro-batches the sketch decays, yet every true heavy
    value survives to the final version (the MG admission bound), and
    state stays bounded at capacity counters per bucket."""
    from emiproc_spark.streaming.streams import heavy_hitters_stream

    # 1 bucket, capacity 8, 40 distinct values; values 0/1/2 are hot
    # (120, 90, 60 occurrences), the other 37 appear 3x each
    rows = []
    for i, n in [(0, 120), (1, 90), (2, 60)] + [(i, 3) for i in range(3, 40)]:
        rows += [(i,)] * n
    # deterministic interleave so heavy values span all batches
    rows.sort(key=lambda r: hash((r[0], len(rows))) % 7)
    import pandas as pd

    src = tmp_path / "in"
    src.mkdir()
    third = len(rows) // 3
    for b in range(3):
        chunk = rows[b * third : None if b == 2 else (b + 1) * third]
        pd.DataFrame({"v": [r[0] for r in chunk]}).to_parquet(
            src / f"part{b}.parquet"
        )

    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = heavy_hitters_stream(stream, "v", capacity=8, n_buckets=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_stream_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("hh_stream_test").toPandas()
    assert res["ver"].max() == 3  # three real micro-batches
    final = res[res["ver"] == res["ver"].max()]
    assert len(final) <= 8  # state bounded at capacity
    survivors = set(final["v"].astype(int))
    assert {0, 1, 2} <= survivors  # heavy values always survive decay

    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_stream(stream, "v", capacity=0)


def test_heavy_hitters_stream_empty_string_state_survives(spark, tmp_path):
    """A sketch whose only survivor is the empty-string value packs
    vs == '' — state restore must key on the counts string, or the
    count resets every micro-batch."""
    from emiproc_spark.streaming.streams import heavy_hitters_stream

    import pandas as pd

    src = tmp_path / "in"
    src.mkdir()
    for b in range(2):
        pd.DataFrame({"v": [""] * 3}).to_parquet(src / f"p{b}.parquet")
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = heavy_hitters_stream(stream, "v", capacity=4, n_buckets=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_empty_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.table("hh_empty_state").toPandas()
    final = res[res["ver"] == res["ver"].max()]
    assert res["ver"].max() == 2
    assert final["wt"].tolist() == [6]  # 3 + 3 across both batches
