import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import TPROFILE
from emiproc_spark.operators.profiles import (
    add_constant_profile_to_missing_cells,
    combine_profiles,
    country_to_cells,
    country_to_cells_majority,
    dedup_profiles,
    merge_indexes,
    remap_profiles,
)
from emiproc_spark.operators.vertical import resample_vertical_profiles


@pytest.fixture(scope="module")
def tprofiles(spark):
    daily_a = [(h + 1) / 300.0 for h in range(24)]
    daily_b = [1.0 / 24] * 24
    weekly = [(d + 1) / 28.0 for d in range(7)]
    return spark.createDataFrame(
        [(0, "daily", daily_a), (1, "daily", daily_b), (2, "weekly", weekly)],
        schema=TPROFILE,
    ).cache()


def test_combine_identical_profiles_is_identity(spark, tprofiles):
    # two index rows pointing at the same profile, any weights
    idx = spark.createDataFrame(
        [("A", 0, 5.0), ("B", 0, 3.0)], schema="category string, profile_id int, weight double"
    )
    out = combine_profiles(idx.withColumn("grp", F.lit("g")), tprofiles, ["grp"]).collect()
    assert len(out) == 1
    expected = [(h + 1) / 300.0 for h in range(24)]
    assert out[0]["ratios"] == pytest.approx(expected)


def test_combine_weighted_average(spark, tprofiles):
    idx = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 1, 3.0)], schema="grp string, profile_id int, weight double"
    )
    out = combine_profiles(idx, tprofiles, ["grp"]).collect()[0]["ratios"]
    expected = [(1 * (h + 1) / 300.0 + 3 * 1.0 / 24) / 4.0 for h in range(24)]
    assert out == pytest.approx(expected)


def test_combine_skips_minus_one(spark, tprofiles):
    idx = spark.createDataFrame(
        [("g", 0, 1.0), ("g", -1, 100.0)], schema="grp string, profile_id int, weight double"
    )
    out = combine_profiles(idx, tprofiles, ["grp"]).collect()[0]["ratios"]
    assert out == pytest.approx([(h + 1) / 300.0 for h in range(24)])


def test_dedup_profiles(spark):
    rows = [
        ("A", "daily", [0.5, 0.5]),
        ("B", "daily", [0.5, 0.5]),
        ("C", "daily", [0.25, 0.75]),
    ]
    df = spark.createDataFrame(rows, schema="category string, ptype string, ratios array<double>")
    store, index = dedup_profiles(df)
    assert store.count() == 2
    m = {r["category"]: r["profile_id"] for r in index.collect()}
    assert m["A"] == m["B"] != m["C"]


def test_dedup_profiles_ids_are_lexicographic_rank(spark):
    """ids must be the dense 0..n-1 lexicographic rank of (ptype,
    ratios) even when the distinct store spans many range partitions
    (the JVM-side offset arithmetic replacing rdd.zipWithIndex)."""
    import random

    rng = random.Random(7)
    rows = [
        (f"k{i}", ptype, [float(i), rng.random()])
        for i in range(200)
        for ptype in ("daily", "weekly")
    ]
    df = spark.createDataFrame(
        rows, schema="category string, ptype string, ratios array<double>"
    ).repartition(16)
    store, index = dedup_profiles(df)
    got = [
        (r["ptype"], tuple(r["ratios"]), r["profile_id"])
        for r in store.collect()
    ]
    expected_order = sorted((p, rt) for p, rt, _ in got)
    assert sorted(pid for _, _, pid in got) == list(range(len(got)))
    for p, rt, pid in got:
        assert expected_order[pid] == (p, rt)
    # index maps every input row to its vector's id
    idx = {r["category"]: r["profile_id"] for r in index.where("ptype = 'daily'").collect()}
    rank_of = {(p, rt): pid for p, rt, pid in got}
    for i in [0, 7, 199]:
        key = ("daily", tuple(next(r[2] for r in rows if r[0] == f"k{i}" and r[1] == "daily")))
        assert idx[f"k{i}"] == rank_of[key]


def test_country_to_cells_fraction_blend(spark, tprofiles):
    cidx = spark.createDataFrame(
        [("X", 0), ("Y", 1)], schema="country string, profile_id int"
    )
    cc = spark.createDataFrame(
        [(0, "X", 0.6), (0, "Y", 0.4), (1, "X", 1.0)],
        schema="cell_id long, country string, fraction double",
    )
    out = {r["cell_id"]: r["ratios"] for r in country_to_cells(cidx, tprofiles, cc).collect()}
    exp0 = [(0.6 * (h + 1) / 300.0 + 0.4 / 24) for h in range(24)]
    assert out[0] == pytest.approx(exp0)
    assert out[1] == pytest.approx([(h + 1) / 300.0 for h in range(24)])


def test_country_to_cells_majority(spark):
    cidx = spark.createDataFrame([("X", 0), ("Y", 1)], schema="country string, profile_id int")
    cc = spark.createDataFrame(
        [(0, "X", 0.6), (0, "Y", 0.4)], schema="cell_id long, country string, fraction double"
    )
    out = country_to_cells_majority(cidx, cc).collect()
    assert out[0]["profile_id"] == 0


def test_remap_profiles_single_donor_identity(spark, tprofiles):
    cell_idx = spark.createDataFrame([(0, 0), (1, 1)], schema="cell_id long, profile_id int")
    weights = spark.createDataFrame(
        [(0, 10, 1.0), (1, 11, 1.0)], schema="src_id long, dst_id long, weight double"
    )
    out = {r["cell_id"]: r["ratios"] for r in remap_profiles(cell_idx, tprofiles, weights).collect()}
    assert out[10] == pytest.approx([(h + 1) / 300.0 for h in range(24)])
    assert out[11] == pytest.approx([1.0 / 24] * 24)


def test_add_constant_profile_missing_cells(spark):
    idx = spark.createDataFrame([(0, 7)], schema="cell_id long, profile_id int")
    grid = spark.createDataFrame([(0,), (1,), (2,)], schema="cell_id long")
    out = {r["cell_id"]: r["profile_id"] for r in
           add_constant_profile_to_missing_cells(idx, grid).collect()}
    assert out == {0: 7, 1: -1, 2: -1}


def test_merge_indexes_specificity(spark):
    key = spark.createDataFrame(
        [("A", "CO2"), ("A", "CH4"), ("B", "CO2")], schema="category string, substance string"
    )
    by_cat = spark.createDataFrame([("A", 1)], schema="category string, profile_id int")
    by_cat_sub = spark.createDataFrame(
        [("A", "CO2", 2)], schema="category string, substance string, profile_id int"
    )
    out = merge_indexes([by_cat, by_cat_sub], key)
    m = {(r["category"], r["substance"]): r["profile_id"] for r in out.collect()}
    assert m == {("A", "CO2"): 2, ("A", "CH4"): 1, ("B", "CO2"): -1}


def test_vertical_rebin_conservative(spark):
    vp = spark.createDataFrame(
        [(0, [50.0, 100.0, 200.0], [0.5, 0.3, 0.2])],
        schema="profile_id int, heights_top_m array<double>, ratios array<double>",
    )
    out = resample_vertical_profiles(vp, [100.0, 200.0]).collect()[0]
    assert out["ratios"] == pytest.approx([0.8, 0.2])
    assert sum(out["ratios"]) == pytest.approx(1.0)
    # finer target: split layer [0,50) in half
    out2 = resample_vertical_profiles(vp, [25.0, 100.0, 200.0]).collect()[0]
    assert out2["ratios"] == pytest.approx([0.25, 0.55, 0.2])


def test_merge_indexes_null_dims_raise(spark):
    from emiproc_spark.operators.profiles import merge_indexes

    key = spark.createDataFrame(
        [("A", "CO2"), ("B", "CO2")], "category string, substance string"
    )
    bad = spark.createDataFrame(
        [(None, "CO2", 3)], "category string, substance string, profile_id int"
    )
    with pytest.raises(Exception, match="omitting the column"):
        merge_indexes([bad], key).collect()
    # the documented convention: omit the wildcard column instead
    wild = spark.createDataFrame([("CO2", 3)], "substance string, profile_id int")
    out = {r["category"]: r["profile_id"] for r in merge_indexes([wild], key).collect()}
    assert out == {"A": 3, "B": 3}


def test_vertical_rebin_degenerate_layer_raises(spark):
    from emiproc_spark.operators.vertical import resample_vertical_profiles

    vp = spark.createDataFrame(
        [(0, [50.0, 50.0, 100.0], [0.3, 0.4, 0.3])],
        "profile_id int, heights_top_m array<double>, ratios array<double>",
    )
    with pytest.raises(Exception, match="strictly increasing"):
        resample_vertical_profiles(vp, [60.0, 100.0]).collect()
