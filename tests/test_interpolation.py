import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.interpolation import (
    hour_of_year_to_cycles,
    profile_to_hour_of_year,
    resolve_daytype,
)


def test_daily_step_resample_repeats(spark):
    prof = spark.createDataFrame(
        [(0, [(h + 1) / 300.0 for h in range(24)])],
        schema="profile_id int, ratios array<double>",
    )
    out = profile_to_hour_of_year(prof, "daily", 8760, interpolate=False)
    rows = {r["hour"]: r["sf"] for r in out.where(F.col("hour") < 50).collect()}
    assert rows[0] == pytest.approx(1 / 300 * 24)
    assert rows[25] == pytest.approx(2 / 300 * 24)  # repeats next day
    # mean over year = 1
    mean = out.agg(F.avg("sf")).collect()[0][0]
    assert mean == pytest.approx(1.0)


def test_daily_interpolated_mean_one(spark):
    prof = spark.createDataFrame(
        [(0, [(h + 1) / 300.0 for h in range(24)])],
        schema="profile_id int, ratios array<double>",
    )
    out = profile_to_hour_of_year(prof, "daily", 8760, interpolate=True)
    mean = out.agg(F.avg("sf")).collect()[0][0]
    assert mean == pytest.approx(1.0, rel=1e-9)
    # uniform profile stays exactly 1 everywhere
    uni = spark.createDataFrame(
        [(1, [1.0 / 24] * 24)], schema="profile_id int, ratios array<double>"
    )
    u = profile_to_hour_of_year(uni, "daily", 8760)
    assert u.agg(F.min("sf")).collect()[0][0] == pytest.approx(1.0)
    assert u.agg(F.max("sf")).collect()[0][0] == pytest.approx(1.0)


def test_monthly_interpolation_smooth(spark):
    prof = spark.createDataFrame(
        [(0, [(m + 1) / 78.0 for m in range(12)])],
        schema="profile_id int, ratios array<double>",
    )
    out = profile_to_hour_of_year(prof, "monthly", 8760, interpolate=True)
    # adjacent hours differ by at most the per-hour slope between months
    vals = [r["sf"] for r in out.orderBy("hour").limit(2000).collect()]
    max_jump = max(abs(a - b) for a, b in zip(vals, vals[1:]))
    assert max_jump < 0.01


def test_roundtrip_cycles(spark):
    prof = spark.createDataFrame(
        [(0, [(h + 1) / 300.0 for h in range(24)])],
        schema="profile_id int, ratios array<double>",
    )
    hourly = profile_to_hour_of_year(prof, "daily", 8760, interpolate=False)
    cycles = hour_of_year_to_cycles(hourly)
    daily = {
        r["pos"]: r["ratio"]
        for r in cycles.where(F.col("ptype") == "daily").collect()
    }
    for h in range(24):
        assert daily[h] == pytest.approx((h + 1) / 300.0)
    weekly = cycles.where(F.col("ptype") == "weekly").collect()
    assert all(r["ratio"] == pytest.approx(1 / 7) for r in weekly)


def test_resolve_daytype(spark):
    wk = [1.0 / 24] * 24
    we = [0.0] * 12 + [1.0 / 12] * 12
    prof = spark.createDataFrame(
        [(0, "weekday", wk), (0, "weekend", we)],
        schema="profile_id int, day_type string, ratios array<double>",
    )
    out = resolve_daytype(prof).collect()[0]
    assert out["ptype"] == "hour_of_week"
    r = out["ratios"]
    assert len(r) == 168
    assert sum(r) == pytest.approx(1.0)
    # Saturday morning (day 5, hour 0) is zero; Monday is uniform
    assert r[5 * 24 + 0] == 0.0
    assert r[0] == pytest.approx((1.0 / 24) / 7.0)


def test_profile_da_monthly_midpoints(spark):
    from emiproc_spark.operators.interpolation import profile_da

    prof = spark.createDataFrame(
        [(0, [(m + 1) / 78.0 for m in range(12)])],
        schema="profile_id int, ratios array<double>",
    )
    rows = profile_da(prof, 2023, "monthly").orderBy("ts").collect()
    # prepended stamp + 12 month starts + inclusive next-year start
    assert len(rows) == 14
    # first stamp: Jan 1 − 30 d = Dec 2 2022, +15 d offset → Dec 17
    assert str(rows[0]["ts"]).startswith("2022-12-17")
    assert rows[0]["pos"] == 11 and rows[0]["ratio"] == 12 / 78.0
    # Feb start + 15 d offset → Feb 16, pos = 1
    assert str(rows[2]["ts"]).startswith("2023-02-16")
    assert rows[2]["pos"] == 1


def test_profile_da_weekly_and_noncyclic(spark):
    from emiproc_spark.operators.interpolation import profile_da

    wk = spark.createDataFrame(
        [(0, [(d + 1) / 28.0 for d in range(7)])],
        schema="profile_id int, ratios array<double>",
    )
    rows = profile_da(wk, 2024, "weekly").orderBy("ts").collect()
    assert len(rows) == 368  # prepended + 366 + inclusive end
    # 2024-01-01 is a Monday; first (prepended) stamp is Sunday Dec 31
    assert rows[0]["pos"] == 6
    assert str(rows[0]["ts"]).startswith("2023-12-31 12:00")
    assert rows[1]["pos"] == 0 and rows[1]["ratio"] == 1 / 28.0

    hoy = spark.createDataFrame(
        [(0, [float(h) for h in range(8784)])],
        schema="profile_id int, ratios array<double>",
    )
    rows = profile_da(hoy, 2024, "hour_of_leap_year").orderBy("ts").collect()
    # non-cyclic: no prepended stamp, no year+1 endpoint
    assert len(rows) == 8784
    assert str(rows[0]["ts"]).startswith("2024-01-01 00:30")
    assert rows[0]["pos"] == 0 and rows[-1]["pos"] == 8783


def test_profile_da_leap_mismatch_raises(spark):
    from emiproc_spark.operators.interpolation import profile_da

    prof = spark.createDataFrame(
        [(0, [1.0 / 8760] * 8760)], "profile_id int, ratios array<double>"
    )
    with pytest.raises(ValueError, match="hour_of_leap_year"):
        profile_da(prof, 2024, "hour_of_year")  # 2024 is leap


def test_resolve_daytype_rejects_partial_cover(spark):
    prof = spark.createDataFrame(
        [(0, "weekday", [1.0 / 24] * 24)],
        "profile_id int, day_type string, ratios array<double>",
    )
    with pytest.raises(ValueError, match="exactly once"):
        resolve_daytype(prof, {"weekday": [0, 1, 2, 3, 4]})


def test_hour_of_year_weekly_anchor_roundtrip(spark):
    """profile_to_hour_of_year(year_start_weekday=2) then
    hour_of_year_to_cycles(year_start_weekday=2) recovers the weekly
    ratios — the anchored round-trip that was previously asymmetric."""
    from emiproc_spark.operators.interpolation import (
        hour_of_year_to_cycles,
        profile_to_hour_of_year,
    )

    wk = [(d + 1) / 28.0 for d in range(7)]
    prof = spark.createDataFrame(
        [(0, wk)], "profile_id int, ratios array<double>"
    )
    hourly = profile_to_hour_of_year(
        prof, "weekly", year_hours=8760, interpolate=False, year_start_weekday=2
    )
    back = hour_of_year_to_cycles(
        hourly.select("profile_id", "hour", "sf"), year_start_weekday=2
    )
    got = {
        r["pos"]: r["ratio"]
        for r in back.where(F.col("ptype") == "weekly").collect()
    }
    # the trailing partial week biases the plain mean slightly; the
    # anchored cycles must still put the LARGEST share on Sunday (pos 6)
    # and preserve strict ordering — a 2-day shift would rotate it
    order = [got[p] for p in range(7)]
    assert order == sorted(order)
