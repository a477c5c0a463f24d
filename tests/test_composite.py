import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import TPROFILE
from emiproc_spark.operators.composite import (
    broadcast_to_types,
    check_valid_profiles,
    composite_scaling_factor,
    concatenate_profiles,
    ensure_specific_days_consistency,
    make_composite_profiles,
)


def test_make_composite_profiles(spark):
    rows = [
        ("A", "CO2", "daily", 0),
        ("A", "CO2", "weekly", 2),
        ("B", "CO2", "daily", 0),
        ("B", "CO2", "weekly", 2),
        ("C", "CO2", "daily", 1),
    ]
    a = spark.createDataFrame(rows, schema="category string, substance string, ptype string, profile_id int")
    composite, index = make_composite_profiles(a)
    m = {r["category"]: r["comp_id"] for r in index.collect()}
    assert m["A"] == m["B"] != m["C"]  # same combo → same composite id
    combo_a = {
        (r["ptype"], r["profile_id"])
        for r in composite.where(F.col("comp_id") == m["A"]).collect()
    }
    assert combo_a == {("daily", 0), ("weekly", 2)}


def test_concatenate_profiles(spark):
    a = spark.createDataFrame([(0, "daily", [0.5, 0.5])], schema=TPROFILE)
    b = spark.createDataFrame([(0, "daily", [0.25, 0.75])], schema=TPROFILE)
    merged, _ = concatenate_profiles(a, b)
    ids = sorted(r["profile_id"] for r in merged.collect())
    assert ids == [0, 1]


def test_broadcast_to_types(spark):
    comp = spark.createDataFrame(
        [(0, "daily", 3)], schema="comp_id int, ptype string, profile_id int"
    )
    wide = broadcast_to_types(comp, ["daily", "weekly", "monthly"])
    rows = {r["ptype"]: r["profile_id"] for r in wide.collect()}
    assert rows == {"daily": 3, "weekly": -1, "monthly": -1}


def test_broadcast_to_types_keeps_all_constant_composite(spark):
    """A composite with NO sub-profile rows (every type constant) must
    widen to all-(−1) rows when the comp_id universe is supplied."""
    comp = spark.createDataFrame(
        [(0, "daily", 3)], schema="comp_id int, ptype string, profile_id int"
    )
    universe = spark.createDataFrame([(0,), (1,)], "comp_id int")
    wide = broadcast_to_types(comp, ["daily", "weekly"], comp_ids=universe)
    rows = {(r["comp_id"], r["ptype"]): r["profile_id"] for r in wide.collect()}
    assert rows == {
        (0, "daily"): 3, (0, "weekly"): -1,
        (1, "daily"): -1, (1, "weekly"): -1,
    }


def test_composite_scaling_factor_product(spark):
    daily = [(h + 1) / 300.0 for h in range(24)]
    weekly = [(d + 1) / 28.0 for d in range(7)]
    subs = spark.createDataFrame(
        [(0, "daily", daily), (0, "weekly", weekly)],
        schema="comp_id int, ptype string, ratios array<double>",
    )
    ts = F.lit("2024-01-01 13:00:00").cast("timestamp_ntz")  # Monday 13h
    sf = composite_scaling_factor(ts, subs).collect()[0]["sf"]
    assert sf == pytest.approx((14 / 300 * 24) * (1 / 28 * 7))


def test_specific_days(spark):
    wk = [1.0 / 24] * 24
    sat = [0.5 / 24] * 24
    gen = [2.0 / 24] * 24
    prof = spark.createDataFrame(
        [(0, "weekday", wk), (0, "sat", sat)],
        schema="profile_id int, day_type string, ratios array<double>",
    )
    general = spark.createDataFrame(
        [(0, gen)], schema="profile_id int, ratios array<double>"
    )
    out = {r["dow"]: r["ratios"][0] for r in
           ensure_specific_days_consistency(prof, general).collect()}
    assert out[0] == pytest.approx(1 / 24)   # weekday
    assert out[5] == pytest.approx(0.5 / 24)  # specific sat wins
    assert out[6] == pytest.approx(2 / 24)   # gap → general


def test_check_valid_profiles(spark):
    good = (0, "daily", [0.5, 0.5])
    bad_sum = (1, "daily", [0.5, 0.6])
    bad_neg = (2, "daily", [1.5, -0.5])
    df = spark.createDataFrame([good, bad_sum, bad_neg], schema=TPROFILE)
    bad = {r["profile_id"] for r in check_valid_profiles(df).collect()}
    assert bad == {1, 2}


def test_specific_days_pid_without_general_survives(spark):
    """A pid fully covered by specific days but absent from general
    must not vanish; a partially covered pid without a general row gets
    the uniform fallback (reference's default SpecificDayProfile)."""
    prof = spark.createDataFrame(
        [(7, d, [float(i + 1)]) for i, d in enumerate(
         ("monday", "tuesday", "wednesday", "thursday", "friday",
          "saturday", "sunday"))]
        + [(8, "weekend", [0.5, 0.5])],
        schema="profile_id int, day_type string, ratios array<double>",
    )
    general = spark.createDataFrame(
        [(9, [2.0, 2.0])], schema="profile_id int, ratios array<double>"
    )
    out = ensure_specific_days_consistency(prof, general).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["profile_id"], {})[r["dow"]] = r["ratios"]
    assert set(by_pid) == {7, 8, 9}
    assert by_pid[7][0] == [1.0] and by_pid[7][6] == [7.0]
    # pid 8: weekend specific, weekdays fall back to uniform [0.5, 0.5]
    assert by_pid[8][5] == [0.5, 0.5]
    assert by_pid[8][0] == pytest.approx([0.5, 0.5])
    # pid 9: general only, all 7 days
    assert all(by_pid[9][d] == [2.0, 2.0] for d in range(7))


def test_check_valid_profiles_flags_nulls(spark):
    df = spark.createDataFrame(
        [(0, "daily", [0.5, 0.5]), (1, "daily", [0.5, None]), (2, "daily", None)],
        schema=TPROFILE,
    )
    bad = {r["profile_id"] for r in check_valid_profiles(df).collect()}
    assert bad == {1, 2}


def test_composite_dedupes_duplicate_assignment_rows(spark):
    from emiproc_spark.operators.composite import make_composite_profiles

    a = spark.createDataFrame(
        [("A", "daily", 0), ("A", "daily", 0), ("B", "daily", 0)],
        "key string, ptype string, profile_id int",
    )
    composite, index = make_composite_profiles(a)
    ids = {r["key"]: r["comp_id"] for r in index.collect()}
    assert ids["A"] == ids["B"]  # identical logical combos share an id
    rows = composite.collect()
    assert len(rows) == 1  # one (daily, 0) sub-profile row, not two
