"""Unit tests for changelog/state operators (operators/history.py),
Z-order layout (operators/layout.py) and the salted skew join."""

import duckdb
import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.history import (
    latest_snapshot,
    resample_locf,
    scd2_compact,
)
from emiproc_spark.operators.layout import (
    cluster_by_zorder,
    layout_extents,
    zorder_key,
    zorder_key_sql,
)
from emiproc_spark.operators.joins import salted_join


# ---------------------------------------------------------------- scd2
def _changelog(spark):
    rows = [
        # (user, ts, state, seq)
        (1, 10, "a", 0),
        (1, 20, "a", 1),  # unchanged -> collapses into v1
        (1, 30, "b", 2),  # change -> v2
        (1, 40, None, 3),  # change to NULL -> v3
        (1, 50, None, 4),  # unchanged NULL -> collapses
        (1, 60, "b", 5),  # NULL -> 'b' is a change -> v4
        (2, 15, "x", 6),  # second key, single version
    ]
    return spark.createDataFrame(rows, "user_id int, ts long, state string, seq int")


def test_scd2_compact_versions(spark):
    out = scd2_compact(
        _changelog(spark), ["user_id"], "ts", ["state"], tiebreak=["seq"]
    )
    got = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("a", 10, 30, False),
        (1, 2): ("b", 30, 40, False),
        (1, 3): (None, 40, 60, False),
        (1, 4): ("b", 60, None, True),
        (2, 1): ("x", 15, None, True),
    }


def test_scd2_compact_equal_ts_tiebreak(spark):
    # two updates at the same timestamp: seq decides the final state
    rows = [(1, 10, "a", 0), (1, 10, "b", 1), (1, 10, "c", 2)]
    df = spark.createDataFrame(rows, "user_id int, ts long, state string, seq int")
    out = scd2_compact(df, ["user_id"], "ts", ["state"], tiebreak=["seq"])
    current = [r for r in out.collect() if r.is_current]
    assert len(current) == 1 and current[0].state == "c"


def test_scd2_requires_state_cols(spark):
    with pytest.raises(ValueError, match="state_cols"):
        scd2_compact(_changelog(spark), ["user_id"], "ts", [])


def test_latest_snapshot(spark):
    df = _changelog(spark)
    out = latest_snapshot(df, ["user_id"], ["ts", "seq"])
    got = {(r.user_id): (r.ts, r.state) for r in out.collect()}
    assert got == {1: (60, "b"), 2: (15, "x")}


# -------------------------------------------------------------- resample
def test_resample_locf_gaps_and_boundaries(spark):
    # bucket width 10; key 1 observations in buckets 0, 0, 3 (gap 1-2)
    rows = [
        (1, 0, 1.0, 0),   # bucket 0
        (1, 9, 2.0, 1),   # bucket 0, later -> wins bucket 0
        (1, 30, 3.0, 2),  # bucket 3 (ts exactly on the boundary)
        (2, 25, 7.0, 3),  # single-bucket key
    ]
    df = spark.createDataFrame(rows, "k int, ts long, v double, e int")
    out = resample_locf(df, ["k"], "ts", "v", 10, tiebreak=["e"])
    got = {
        (r.k, r.bucket_start): (r.value_locf, r.is_gap) for r in out.collect()
    }
    assert got == {
        (1, 0): (2.0, False),
        (1, 10): (2.0, True),
        (1, 20): (2.0, True),
        (1, 30): (3.0, False),
        (2, 20): (7.0, False),
    }


def test_resample_locf_epoch_nanos_precision(spark):
    # epoch-nanos exceed 2^53: float division would misplace boundary
    # timestamps; ts = k*H and k*H - 1 must land in buckets k and k-1
    h = 3_600_000_000_000
    k = 473_000
    rows = [(1, k * h, 1.0, 0), (1, k * h - 1, 2.0, 1)]
    df = spark.createDataFrame(rows, "u int, ts long, v double, e int")
    out = resample_locf(df, ["u"], "ts", "v", h, tiebreak=["e"])
    got = {r.bucket_start: r.value_locf for r in out.collect()}
    assert got == {(k - 1) * h: 2.0, k * h: 1.0}


def test_resample_locf_same_ts_tiebreak(spark):
    rows = [(1, 5, 1.0, 0), (1, 5, 9.0, 1)]
    df = spark.createDataFrame(rows, "u int, ts long, v double, e int")
    out = resample_locf(df, ["u"], "ts", "v", 10, tiebreak=["e"]).collect()
    assert len(out) == 1 and out[0].value_locf == 9.0


def test_resample_locf_rejects_bad_bucket(spark):
    df = spark.createDataFrame([(1, 5, 1.0)], "u int, ts long, v double")
    with pytest.raises(ValueError, match="bucket_ns"):
        resample_locf(df, ["u"], "ts", "v", 0)


# --------------------------------------------------------------- zorder
def test_zorder_key_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (255, 255)], "x int, y int"
    )
    out = df.select(zorder_key("x", "y", 8).alias("z")).collect()
    # interleave(x=2=0b10, y=3=0b11) = x0<<0|y0<<1|x1<<2|y1<<3 = 0|2|4|8
    assert [r.z for r in out] == [0, 1, 2, 3, 14, 65535]


def test_zorder_key_sql_matches_spark(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(
        (r.x, r.y, r.z)
        for r in df.select("x", "y", zorder_key("x", "y", 6).alias("z")).collect()
    )
    sql = zorder_key_sql("x", "y", 6)
    want = sorted(
        duckdb.sql(
            f"SELECT x, y, {sql} AS z FROM (SELECT UNNEST($pts, recursive := true)) t(x, y)",
            params={"pts": [{"x": x, "y": y} for x, y in pts]},
        ).fetchall()
    )
    assert got == want


def test_zorder_key_bits_bound():
    with pytest.raises(ValueError, match="bits"):
        zorder_key("x", "y", 0)


def test_layout_extents_tiles(spark):
    # full 32x32 lattice, prefix_shift 4 -> each prefix is a 4x4 tile
    df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("int").alias("y")
    )
    keyed = df.withColumn("z", zorder_key("x", "y", 5))
    ext = layout_extents(keyed, "x", "y", "z", 4).collect()
    assert len(ext) == 64
    for r in ext:
        assert r.n_rows == 16
        assert r.x_max - r.x_min == 3 and r.y_max - r.y_min == 3


def test_cluster_by_zorder_locality(spark):
    # same lattice, 16 range partitions: z-clustering keeps each
    # partition's bbox area far below the row-major layout's
    df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("int").alias("y")
    )
    clustered = cluster_by_zorder(df, "x", "y", 5, 16)
    bbox = (
        clustered.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).alias(
                "area"
            ),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert sum(r.n for r in bbox) == 1024
    # each z partition covers ~64 cells; a perfect tile is area 64, row
    # ranges of 64 cells span area 32*2=64 too BUT row-major partitions
    # of 64 rows cover x-extent 32 always; z tiles bound BOTH axes
    for r in bbox:
        assert r.area <= 4 * r.n, (r.p, r.area, r.n)


# ---------------------------------------------------------- salted join
def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(customer, ["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, customer, ["o_custkey"], n_salts=7)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_nulls(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, pay string")
    dim = spark.createDataFrame([(1, "d1")], "k int, attr string")
    out = salted_join(fact, dim, ["k"], n_salts=4, how="left").collect()
    assert len(out) == 3  # unmatched fact rows appear exactly once
    got = {r.k: r.attr for r in out}
    assert got == {1: "d1", 2: None, 3: None}


def test_salted_join_rejects_outer(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], 4, how="full")
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(df, df, ["k"], 0)


def test_apply_changelog_merge_semantics(spark):
    from emiproc_spark.operators.history import apply_changelog

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    chg = spark.createDataFrame(
        [
            (2, "b2", 21.0, 5, "upsert"),
            (2, "b3", 22.0, 6, "upsert"),  # latest for key 2 wins
            (3, "c", 30.0, 7, "delete"),   # key 3 removed
            (4, "d", 40.0, 8, "upsert"),
            (4, "d", 41.0, 9, "delete"),
            (4, "dd", 42.0, 10, "upsert"),  # insert-after-delete survives
        ],
        "k long, name string, v double, ts long, op string",
    )
    out = sorted(
        (r["k"], r["name"], r["v"])
        for r in apply_changelog(snap, chg, ["k"], ["ts"]).collect()
    )
    assert out == [(1, "a", 10.0), (2, "b3", 22.0), (4, "dd", 42.0)]

    with pytest.raises(ValueError, match="lacks column"):
        apply_changelog(snap, chg.drop("name"), ["k"], ["ts"])


def test_resample_interp_linear_gaps(spark):
    from emiproc_spark.operators.history import resample_interp

    ev = spark.createDataFrame(
        [(1, 0, 0.0), (1, 35, 70.0), (1, 10, 20.0)],
        "k long, ts long, v double",
    )
    out = sorted(
        (r["bucket_start"], r["value_q6"], r["is_gap"])
        for r in resample_interp(ev, ["k"], "ts", "v", 10).collect()
    )
    # bucket 2 is empty: interpolate at t=20 between (10, 20) and
    # (35, 70) -> 20 + 50 * (10/25) = 40
    assert out == [
        (0, 0.0, False),
        (10, 20.0, False),
        (20, 40.0, True),
        (30, 70.0, False),
    ]
    with pytest.raises(ValueError, match="bucket_ns"):
        resample_interp(ev, ["k"], "ts", "v", 0)


def test_resample_interp_single_exchange(spark):
    # both window passes must reuse ONE partitioning: exactly one
    # exchange on the lattice side (plus the bounded bounds aggregate)
    from emiproc_spark.operators.history import resample_interp

    ev = spark.createDataFrame(
        [(1, 0, 0.0), (1, 25, 50.0)], "k long, ts long, v double"
    )
    plan = resample_interp(ev, ["k"], "ts", "v", 10)._jdf.queryExecution().executedPlan().toString()
    # obs agg (k, bucket) ×2 join sides + bounds (k) + ONE shared
    # window exchange (k) — a second per-window exchange would make 5
    assert plan.count("Exchange hashpartitioning") <= 4


def test_apply_changelog_rejects_op_in_snapshot(spark):
    from emiproc_spark.operators.history import apply_changelog

    snap = spark.createDataFrame([(1, "upsert")], "k long, op string")
    chg = spark.createDataFrame(
        [(1, "upsert", 2, "upsert")], "k long, op string, ts long, op2 string"
    )
    with pytest.raises(ValueError, match="must not contain the op column"):
        apply_changelog(snap, chg, ["k"], ["ts"])
