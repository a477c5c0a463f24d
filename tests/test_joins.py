"""asof_join / range_join / point_in_range_join (operators/joins.py)."""

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.joins import (
    asof_join,
    point_in_range_join,
    range_join,
)


@pytest.fixture()
def lr(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d")],
        "k int, ts long, lab string",
    )
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 20, 2.0), (1, 12, 3.0), (3, 1, 9.0)],
        "k int, ts long, v double",
    )
    return left, right


def test_asof_backward_semantics(spark, lr):
    left, right = lr
    rows = {
        r["lab"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()
    }
    assert rows["c"] == (None, None)  # nothing at or before ts=5
    assert rows["a"] == (1.0, 8)  # latest of {8} <= 10
    assert rows["b"] == (2.0, 20)  # exact-ts right row matches (<=)
    assert rows["d"] == (None, None)  # key 2 has no right rows
    # every left row is preserved
    assert asof_join(left, right, "ts", ["k"], ["v"]).count() == left.count()


def test_asof_tolerance_nulls_stale_matches(spark, lr):
    left, right = lr
    rows = {
        r["lab"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, "ts", ["k"], ["v"], tolerance=1).collect()
    }
    assert rows["a"] == (None, None)  # Δ=2 > 1 → stale, row kept
    assert rows["b"] == (2.0, 20)  # Δ=0 within tolerance


def test_asof_right_ts_tie_is_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts long")
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 8, 5.0), (1, 8, 3.0)], "k int, ts long, v double"
    )
    for _ in range(3):
        [r] = asof_join(left, right, "ts", ["k"], ["v"]).collect()
        assert r["v"] == 5.0  # max payload wins ties, not partition layout


def test_asof_value_col_collision_raises(spark, lr):
    left, right = lr
    right2 = right.withColumnRenamed("v", "lab")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right2, "ts", ["k"], ["lab"])
    with pytest.raises(ValueError, match="no column"):
        asof_join(left, right, "ts", ["k"], ["missing"])


def test_range_join_overlaps_once_each(spark):
    l = spark.createDataFrame(
        [(1, 0, 10, "L1"), (1, 25, 30, "L2")],
        "k int, start long, end long, lab string",
    )
    r = spark.createDataFrame(
        [(1, 5, 26, "R1"), (1, 9, 12, "R2"), (1, 40, 50, "R3"), (2, 0, 100, "R4")],
        "k int, start long, end long, lab string",
    )
    # bucket smaller than the intervals: pairs span several shared
    # buckets and must still be emitted exactly once
    got = [
        (row["lab"], row["r_lab"])
        for row in range_join(l, r, ["k"], bucket=3).collect()
    ]
    assert sorted(got) == [("L1", "R1"), ("L1", "R2"), ("L2", "R1")]
    # half-open: [0,10) does not overlap [10,20)
    r2 = spark.createDataFrame([(1, 10, 20, "R5")], "k int, start long, end long, lab string")
    assert range_join(l, r2, ["k"], bucket=7).count() == 0


def test_range_join_bucket_invariance(spark):
    l = spark.createDataFrame(
        [(1, i * 7, i * 7 + 13) for i in range(40)], "k int, start long, end long"
    )
    r = spark.createDataFrame(
        [(1, i * 11 + 3, i * 11 + 9) for i in range(30)], "k int, start long, end long"
    )
    base = None
    for bucket in (2, 13, 64):
        got = sorted(
            (row["start"], row["r_start"])
            for row in range_join(l, r, ["k"], bucket=bucket).collect()
        )
        if base is None:
            base = got
        assert got == base


def test_range_join_rejects_bad_bucket(spark):
    l = spark.createDataFrame([(1, 0, 1)], "k int, start long, end long")
    with pytest.raises(ValueError, match="bucket"):
        range_join(l, l, ["k"], bucket=0)


def test_point_in_range_join(spark):
    points = spark.createDataFrame(
        [(1, 6), (1, 26), (1, 30), (2, 6)], "k int, ts long"
    )
    ranges = spark.createDataFrame(
        [(1, 5, 26, "R1"), (1, 25, 31, "R2")],
        "k int, start long, end long, lab string",
    )
    got = sorted(
        (row["ts"], row["lab"])
        for row in point_in_range_join(points, ranges, ["k"], bucket=7).collect()
    )
    # 6 ∈ R1; 26 ∈ R2 only (R1 end-exclusive); 30 ∈ R2; key 2 no ranges
    assert got == [(6, "R1"), (26, "R2"), (30, "R2")]


def test_asof_forward_and_nearest(spark, lr):
    left, right = lr
    fwd = {
        r["lab"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, "ts", ["k"], ["v"], direction="forward").collect()
    }
    # earliest right at-or-after: a(10)→12, b(20)→20 exact, c(5)→8
    assert fwd["a"] == (3.0, 12)
    assert fwd["b"] == (2.0, 20)
    assert fwd["c"] == (1.0, 8)
    assert fwd["d"] == (None, None)

    near = {
        r["lab"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, "ts", ["k"], ["v"], direction="nearest").collect()
    }
    # a(10): back 8 (Δ2) vs fwd 12 (Δ2) — tie prefers backward
    assert near["a"] == (1.0, 8)
    assert near["b"] == (2.0, 20)
    assert near["c"] == (1.0, 8)  # only forward exists

    # nearest + tolerance: each side gated BEFORE choosing
    near_tol = {
        r["lab"]: r["ts_right"]
        for r in asof_join(
            left, right, "ts", ["k"], ["v"], direction="nearest", tolerance=2
        ).collect()
    }
    assert near_tol["a"] == 8  # both in tolerance, tie → backward
    assert near_tol["c"] is None  # Δ3 forward is out of tolerance

    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "ts", ["k"], ["v"], direction="sideways")


def test_asof_interval_tolerance_on_timestamps(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
        "k int, s string",
    ).select("k", F.col("s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00", 1.0), (1, "2024-01-01 10:30:00", 2.0)],
        "k int, s string, v double",
    ).select("k", F.col("s").cast("timestamp").alias("ts"), "v")
    rows = {
        str(r["ts"]): r["v"]
        for r in asof_join(
            left, right, "ts", ["k"], ["v"], tolerance="10 minutes"
        ).collect()
    }
    assert rows["2024-01-01 10:00:00"] == 1.0  # 5 min back, in tolerance
    assert rows["2024-01-01 12:00:00"] is None  # 90 min back, stale


def test_range_join_auto_bucket(spark):
    l = spark.createDataFrame(
        [(1, i * 7, i * 7 + 13) for i in range(40)], "k int, start long, end long"
    )
    r = spark.createDataFrame(
        [(1, i * 11 + 3, i * 11 + 9) for i in range(30)], "k int, start long, end long"
    )
    manual = sorted(
        (row["start"], row["r_start"])
        for row in range_join(l, r, ["k"], bucket=13).collect()
    )
    auto = sorted(
        (row["start"], row["r_start"])
        for row in range_join(l, r, ["k"]).collect()
    )
    assert auto == manual
    with pytest.raises(ValueError, match="bucket"):
        range_join(l, r, ["k"], bucket="huge")


def test_range_join_inverted_interval_raises(spark):
    l = spark.createDataFrame([(1, 10, 5)], "k int, start long, end long")
    r = spark.createDataFrame([(1, 4, 12)], "k int, start long, end long")
    with pytest.raises(Exception, match="inverted interval"):
        range_join(l, r, ["k"], bucket=5).collect()
    with pytest.raises(ValueError, match="bucket"):
        point_in_range_join(l.select("k", F.col("start").alias("ts")), r, ["k"], bucket=0)


def test_asof_null_timestamp_raises(spark, lr):
    left, right = lr
    left_null = left.unionByName(
        spark.createDataFrame([(1, None, "z")], "k int, ts long, lab string")
    )
    with pytest.raises(Exception, match="NULL ts"):
        asof_join(left_null, right, "ts", ["k"], ["v"]).collect()
    right_null = right.unionByName(
        spark.createDataFrame([(1, None, 9.9)], "k int, ts long, v double")
    )
    with pytest.raises(Exception, match="NULL ts"):
        asof_join(left, right_null, "ts", ["k"], ["v"]).collect()


def test_merge_intervals_islands(spark):
    from emiproc_spark.operators.joins import merge_intervals

    iv = spark.createDataFrame(
        [
            # key 1: [0,10) [5,15) [15,20) chain into one island (touching
            # merges); [30,35) stands alone
            (1, 0, 10), (1, 5, 15), (1, 15, 20), (1, 30, 35),
            # key 2: containment — [0,100) swallows [10,20) and [50,60)
            (2, 0, 100), (2, 10, 20), (2, 50, 60),
            # key 3: duplicate intervals
            (3, 5, 7), (3, 5, 7),
        ],
        "k long, start long, end long",
    )
    out = {(r["k"], r["island_start"]): r for r in
           merge_intervals(iv, ["k"]).collect()}
    assert set(out) == {(1, 0), (1, 30), (2, 0), (3, 5)}
    assert out[(1, 0)]["island_end"] == 20 and out[(1, 0)]["n_intervals"] == 3
    assert out[(1, 30)]["island_end"] == 35
    assert out[(2, 0)]["island_end"] == 100 and out[(2, 0)]["n_intervals"] == 3
    assert out[(3, 5)]["n_intervals"] == 2

    # result is independent of physical partitioning
    again = {(r["k"], r["island_start"]): r["island_end"] for r in
             merge_intervals(iv.repartition(7), ["k"]).collect()}
    assert again == {k: r["island_end"] for k, r in out.items()}

    with pytest.raises(Exception, match="inverted interval"):
        merge_intervals(
            spark.createDataFrame([(1, 10, 5)], "k long, start long, end long"),
            ["k"],
        ).collect()
    with pytest.raises(Exception, match="NULL interval bound"):
        merge_intervals(
            spark.createDataFrame([(1, None, 5)], "k long, start long, end long"),
            ["k"],
        ).collect()
