"""Unit tests: funnel / cohort retention (operators/behavior.py), the
KMV distinct sketch (operators/stats.py), SemDeDup
(operators/similarity.py) and maximal duplicated spans
(operators/dedup.py)."""

import re

import pytest

from pyspark.sql import functions as F

from emiproc_spark.operators.behavior import (
    cohort_retention,
    funnel_counts,
    funnel_user_steps,
)
from emiproc_spark.operators.dedup import duplicated_spans
from emiproc_spark.operators.similarity import ivf_seed_centroids, semdedup
from emiproc_spark.operators.stats import kmv_distinct

EV_SCHEMA = "user_id long, ts long, event_type string"


def test_funnel_strict_order(spark):
    ev = spark.createDataFrame(
        [
            # user 1: click BEFORE the first view must not convert;
            # purchase BEFORE the converting click must not convert
            (1, 5, "click"),
            (1, 10, "view"),
            (1, 15, "purchase"),
            (1, 20, "click"),
            # user 2: never views — whole chain stays null
            (2, 1, "click"),
            (2, 2, "purchase"),
        ],
        schema=EV_SCHEMA,
    )
    rows = {
        r["user_id"]: r
        for r in funnel_user_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert rows[1]["step1_ts"] == 10
    assert rows[1]["step2_ts"] == 20
    assert rows[1]["step3_ts"] is None  # purchase@15 precedes click@20
    assert rows[2]["step1_ts"] is None
    assert rows[2]["step2_ts"] is None


def test_funnel_counts_rollup(spark):
    ev = spark.createDataFrame(
        [(1, 1, "view"), (1, 2, "click"), (2, 3, "view")],
        schema=EV_SCHEMA,
    )
    out = {
        r["step_name"]: r["users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 2, "click": 1, "purchase": 0}


def test_funnel_requires_steps(spark):
    ev = spark.createDataFrame([(1, 1, "view")], schema=EV_SCHEMA)
    with pytest.raises(ValueError, match="at least one step"):
        funnel_user_steps(ev, [])


def test_funnel_single_exchange(spark):
    """The whole step chain + per-user collapse rides ONE hash
    partitioning on the user key."""
    ev = spark.createDataFrame(
        [(1, 1, "view"), (2, 2, "click")], schema=EV_SCHEMA
    )
    df = funnel_user_steps(ev, ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_cohort_retention_matrix(spark):
    ev = spark.createDataFrame(
        [
            (1, 0, "view"),   # cohort period 0
            (1, 5, "click"),  # still period 0 — one active row, not two
            (1, 12, "view"),  # period 1 → offset 1
            (2, 11, "view"),  # cohort period 1
        ],
        schema=EV_SCHEMA,
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r["active_users"]
        for r in cohort_retention(ev, period_ns=10).collect()
    }
    assert out == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_kmv_exact_under_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], schema="g string, v string"
    )
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["n_exact"] == 10
    assert row["kmv_estimate"] == 10.0


def test_kmv_estimator_close(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(n)], schema="g string, v string"
    )
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row["n_exact"] == n
    # (k-1)/h_k with k=256 has ~1/sqrt(254) ≈ 6% relative error
    assert abs(row["kmv_estimate"] - n) / n < 0.25


def test_kmv_ignores_nulls_and_duplicates(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", None), ("g", "b")],
        schema="g string, v string",
    )
    row = kmv_distinct(df, ["g"], "v", k=8).collect()[0]
    assert row["n_exact"] == 2
    assert row["kmv_estimate"] == 2.0


def test_kmv_validates_k(spark):
    df = spark.createDataFrame([("g", "a")], schema="g string, v string")
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_distinct(df, ["g"], "v", k=1)


def test_semdedup_planted_duplicates(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # centroid seed / cluster 0 anchor
            (1, [0.0, 1.0]),   # centroid seed / cluster 1 anchor
            (2, [1.0, 0.01]),  # near-dup of 0, same cell
            (3, [0.0, 5.0]),   # same direction as 1 → dup
            (4, [-1.0, 0.3]),  # assigned to cell 1, similar to nothing
        ],
        schema="vec_id long, embedding array<float>",
    )
    cent = ivf_seed_centroids(emb, k=2)
    out = {r["id"]: r for r in semdedup(emb, cent, threshold=0.9).collect()}
    assert not out[0]["is_dup"] and not out[1]["is_dup"]
    assert out[2]["is_dup"] and out[2]["cell"] == 0
    assert out[3]["is_dup"] and out[3]["cell"] == 1
    assert not out[4]["is_dup"]
    # dedup is cluster-bounded: a cross-cell near-dup is NOT flagged
    assert out[4]["cell"] == 1


def test_duplicated_spans_islands(spark):
    docs = spark.createDataFrame(
        [
            (1, "u1 u2 c1 c2 c3 c4 u3 u4 u5 k1 k2 k3"),
            (2, "c1 c2 c3 c4 w1 k1 k2 k3"),
            (3, "a b"),  # shorter than the shingle — no rows, no crash
            (4, "z1 z2 z3 mm nn z1 z2 z3"),  # repeats only WITHIN itself
        ],
        schema="doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=3, min_docs=2).collect()
    }
    # doc 1: c-block shingles at p=2,3 merge; k-block at p=9 is separate
    # doc 2: c-block at p=0,1; k-block at p=5
    assert spans == {(1, 2, 5), (1, 9, 11), (2, 0, 3), (2, 5, 7)}


def test_duplicated_spans_validates_n(spark):
    docs = spark.createDataFrame([(1, "a b")], schema="doc_id long, text string")
    with pytest.raises(ValueError, match=">= 1"):
        duplicated_spans(docs, n=0)


def test_duplicated_spans_adjacent_merge(spark):
    """Two dup shingles exactly n apart (adjacent, zero overlap) merge
    into one span; n+1 apart (a 1-token gap) do not."""
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 b1 b2 x c1 c2 y1 d1 d2"),
            (2, "a1 a2 b1 b2 q c1 c2 z1 d1 d2"),
        ],
        schema="doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, n=2, min_docs=2).collect()
    }
    # dup shingles per doc: p=0,1,2 (a1a2 / a2b1 / b1b2 — contiguous),
    # p=5 (c1 c2), p=8 (d1 d2): 0..2 merge; 2→5 and 5→8 gap > n split
    assert spans == {
        (1, 0, 3), (1, 5, 6), (1, 8, 9),
        (2, 0, 3), (2, 5, 6), (2, 8, 9),
    }


def test_score_buckets_deterministic_quartiles(spark):
    from emiproc_spark.operators.text import score_buckets

    scored = spark.createDataFrame(
        [("en", i, float(i)) for i in range(8)],
        schema="lang string, doc_id long, score double",
    )
    out = {
        r["bucket"]: (r["n_docs"], r["lo"], r["hi"])
        for r in score_buckets(scored, ["lang"], "score", n=4).collect()
    }
    assert out == {
        1: (2, 0.0, 1.0), 2: (2, 2.0, 3.0),
        3: (2, 4.0, 5.0), 4: (2, 6.0, 7.0),
    }


def test_score_buckets_tie_break_by_id(spark):
    from emiproc_spark.operators.text import score_buckets

    scored = spark.createDataFrame(
        [("en", i, 1.0) for i in range(4)],
        schema="lang string, doc_id long, score double",
    )
    out = {
        r["bucket"]: r["n_docs"]
        for r in score_buckets(scored, ["lang"], "score", n=2).collect()
    }
    assert out == {1: 2, 2: 2}

    with pytest.raises(ValueError, match=">= 1"):
        score_buckets(scored, ["lang"], "score", n=0)


def test_dup_token_fraction_covers_all_docs(spark):
    from emiproc_spark.operators.dedup import dup_token_fraction

    docs = spark.createDataFrame(
        [
            (1, "c1 c2 c3 c4 u1 u2 u3 u4"),  # 4 of 8 tokens duplicated
            (2, "c1 c2 c3 c4"),              # fully duplicated
            (3, "x1 x2 x3 x4 x5"),           # nothing duplicated
        ],
        schema="doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in dup_token_fraction(docs, n=3, min_docs=2).collect()
    }
    assert out[1] == (8, 4, 0.5)
    assert out[2] == (4, 4, 1.0)
    assert out[3] == (5, 0, 0.0)


def test_value_outliers_flags_planted_spike(spark):
    from emiproc_spark.operators.stats import value_outliers

    rows = [("a", 10.0)] * 20 + [("a", 11.0)] * 20 + [("a", 1000.0)]
    rows += [("b", 5.0), ("b", 5.0)]   # zero variance -> no outliers
    rows += [("c", 7.0)]               # n == 1 -> no sd, no outliers
    df = spark.createDataFrame(rows, schema="g string, v double")
    out = {
        r["g"]: (r["n"], r["n_outliers"], r["max_abs_z"])
        for r in value_outliers(df, ["g"], "v", z=3.0).collect()
    }
    assert out["a"][0] == 41 and out["a"][1] == 1 and out["a"][2] > 3.0
    assert out["b"] == (2, 0, None)
    assert out["c"] == (1, 0, None)

    with pytest.raises(ValueError, match="z must be"):
        value_outliers(df, ["g"], "v", z=0.0)


def test_dedup_keep_best_policy(spark):
    from emiproc_spark.operators.cluster import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, 5.0),    # cluster {1,2,3}: 2 has the best score
            (2, 9.0),
            (3, 9.0),    # ties 2 on score -> higher id loses
            (4, None),   # cluster {4,5}: all-NULL scores -> min id kept
            (5, None),
            (6, 1.0),    # isolated -> always kept
        ],
        schema="doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], schema="doc_a long, doc_b long"
    )
    kept = {
        r["doc_id"] for r in dedup_keep_best(docs, pairs, "score").collect()
    }
    assert kept == {2, 4, 6}


def test_dedup_keep_best_null_loses_to_scored(spark):
    from emiproc_spark.operators.cluster import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, None), (2, 0.5)], schema="doc_id long, score double"
    )
    pairs = spark.createDataFrame([(1, 2)], schema="doc_a long, doc_b long")
    kept = {
        r["doc_id"] for r in dedup_keep_best(docs, pairs, "score").collect()
    }
    assert kept == {2}


def test_cohort_retention_validates_inputs(spark):
    ev = spark.createDataFrame([(1, 5, "view")], schema=EV_SCHEMA)
    with pytest.raises(ValueError, match="period_ns"):
        cohort_retention(ev, period_ns=0)
    with pytest.raises(ValueError, match="plain identifier"):
        cohort_retention(ev, period_ns=10, ts_col="ts; drop")


def test_dedup_keep_best_string_ids(spark):
    from emiproc_spark.operators.cluster import dedup_keep_best

    docs = spark.createDataFrame(
        [("10", 1.0), ("9", 1.0), ("7", None)],
        schema="doc_id string, score double",
    )
    pairs = spark.createDataFrame(
        [("10", "9"), ("9", "7")], schema="doc_a string, doc_b string"
    )
    # numeric-string ids join the int64 component labels exactly;
    # equal scores -> smaller NUMERIC id wins (9 < 10)
    kept = {
        r["doc_id"] for r in dedup_keep_best(docs, pairs, "score").collect()
    }
    assert kept == {"9"}


def test_dedup_keep_best_rejects_non_roundtrip_ids(spark):
    """A doc id whose int64 cast does not round-trip ("07" -> 7 -> "7")
    must raise LOUDLY: a raw string==bigint join would coerce through
    DOUBLE and silently merge "07" into node 7's cluster."""
    from emiproc_spark.operators.cluster import dedup_keep_best

    docs = spark.createDataFrame(
        [("7", 1.0), ("9", 2.0), ("07", 5.0)],
        schema="doc_id string, score double",
    )
    pairs = spark.createDataFrame(
        [("7", "9")], schema="doc_a string, doc_b string"
    )
    with pytest.raises(Exception, match="round-trip"):
        dedup_keep_best(docs, pairs, "score").collect()


def test_rolling_event_features_range_frame(spark):
    from emiproc_spark.operators.behavior import rolling_event_features

    ev = spark.createDataFrame(
        [
            (1, 0, 10.0),
            (1, 50, 20.0),    # within 100ns of t=0
            (1, 200, 30.0),   # only itself in [100, 200]
            (1, 200, 40.0),   # PEER at the same ts: both rows see both
            (2, 0, 5.0),
        ],
        schema="user_id long, ts long, value double",
    )
    rows = rolling_event_features(ev, window_ns=100).collect()
    got = {(r["user_id"], r["ts"], r["value"]): (r["n_trailing"], r["v_trailing"]) for r in rows}
    assert got[(1, 0, 10.0)] == (1, 10.0)
    assert got[(1, 50, 20.0)] == (2, 30.0)
    # the two t=200 peers both count each other (RANGE frame semantics)
    assert got[(1, 200, 30.0)] == (2, 70.0)
    assert got[(1, 200, 40.0)] == (2, 70.0)
    assert got[(2, 0, 5.0)] == (1, 5.0)

    with pytest.raises(ValueError, match="window_ns"):
        rolling_event_features(ev, window_ns=-1)


def test_rolling_active_users_wau(spark):
    from emiproc_spark.operators.behavior import rolling_active_users

    ev = spark.createDataFrame(
        [
            (1, 0, "view"),    # user 1 active period 0
            (1, 5, "click"),   # same period — still one contribution
            (2, 12, "view"),   # user 2 active period 1
            (1, 31, "view"),   # user 1 active period 3
        ],
        schema=EV_SCHEMA,
    )
    out = {
        r["period"]: r["active_users"]
        for r in rolling_active_users(ev, window_periods=2, period_ns=10).collect()
    }
    # windows (trailing 2): p0 {1}, p1 {1,2}, p2 {2}, p3 {1}, p4 {1}
    assert out == {0: 1, 1: 2, 2: 1, 3: 1, 4: 1}

    with pytest.raises(ValueError, match="window_periods"):
        rolling_active_users(ev, window_periods=0)


def test_group_quantiles_exact_interpolation(spark):
    from emiproc_spark.operators.stats import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in (10, 20, 30, 40)] + [("b", 5.0)],
        schema="g string, v double",
    )
    out = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, ["g"], "v", (0.0, 0.5, 1.0)).collect()
    }
    # type-7: p = (n-1)q; a: n=4 -> median = 20 + (30-20)*0.5 = 25
    assert out[("a", 0.0)] == 10.0
    assert out[("a", 0.5)] == 25.0
    assert out[("a", 1.0)] == 40.0
    assert out[("b", 0.5)] == 5.0  # single value: every quantile is it

    with pytest.raises(ValueError, match="within"):
        group_quantiles(df, ["g"], "v", (1.5,))


def test_group_quantiles_skips_nulls(spark):
    from emiproc_spark.operators.stats import group_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("c", None)],
        schema="g string, v double",
    )
    out = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, ["g"], "v", (0.5,)).collect()
    }
    assert out == {("a", 0.5): 2.0}  # all-NULL group c vanishes


def test_group_quantiles_null_group_key(spark):
    """NULL group KEYS form their own group (null-safe joins, the
    groupBy semantics) instead of silently vanishing."""
    from emiproc_spark.operators.stats import group_quantiles

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 2.0)],
        schema="g string, v double",
    )
    out = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, ["g"], "v", (0.5,)).collect()
    }
    assert out == {(None, 0.5): 2.0, ("a", 0.5): 2.0}

    with pytest.raises(ValueError, match="distinct"):
        group_quantiles(df, ["g"], "v", (0.5, 0.5))


def test_hash_split_disjoint_exhaustive_deterministic(spark):
    from emiproc_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], schema="doc_id long"
    )
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(df, splits).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in a}
    assert sum(counts.values()) == 2000  # exhaustive
    assert set(counts) == {"train", "val", "test"}  # every split hit
    assert 0.7 < counts["train"] / 2000 < 0.9
    # keyed determinism: same assignment on re-run and any layout
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(7), splits).collect()
    }
    c = {r["doc_id"]: r["split"] for r in hash_split(df, splits).collect()}
    assert b == c

    with pytest.raises(ValueError, match="at least two"):
        hash_split(df, {"train": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, {"a": 0.5, "b": 0.4})


def test_value_outliers_null_group_key(spark):
    # NULL group keys form their own group (null-safe scoring join) —
    # the same semantics as groupBy and group_quantiles
    from emiproc_spark.operators.stats import value_outliers

    rows = [(None, float(v)) for v in [1, 2, 3, 2, 1, 2, 3, 2, 100]]
    rows += [("a", 1.0), ("a", 2.0), ("a", 3.0)]
    df = spark.createDataFrame(rows, schema="g string, v double")
    out = {
        r["g"]: (r["n"], r["n_outliers"])
        for r in value_outliers(df, ["g"], "v", z=2.0).collect()
    }
    assert set(out) == {None, "a"}
    assert out[None] == (9, 1)  # the planted 100 spike
    assert out["a"] == (3, 0)


def test_cohort_retention_floor_division_pre_1970(spark):
    # negative epoch-ns must FLOOR into period -1, not truncate into 0
    # (DuckDB // semantics) — two distinct ranges must not collapse
    p = 100
    ev = spark.createDataFrame(
        [(1, -50, "x"), (2, 50, "x")],
        schema="user_id long, ts long, event_type string",
    ).select("user_id", "ts", "event_type")
    out = {
        (r["cohort_period"], r["period_offset"]): r["active_users"]
        for r in cohort_retention(ev, period_ns=p).collect()
    }
    assert out == {(-1, 0): 1, (0, 0): 1}


def test_hash_split_null_key_raises(spark):
    from emiproc_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(1,), (None,)], schema="doc_id long")
    with pytest.raises(Exception, match="NULL doc_id"):
        hash_split(df, {"train": 0.5, "test": 0.5}).collect()


def test_group_quantiles_value_quantum(spark):
    # the continuous-value knob: quantized quantiles within quantum/2
    # of exact, and the histogram bounded by range/quantum
    from emiproc_spark.operators.stats import group_quantiles

    rows = [("g", 0.001 * i + 0.0001) for i in range(1000)]
    df = spark.createDataFrame(rows, schema="g string, v double")
    exact = {
        r["q"]: r["value"]
        for r in group_quantiles(df, ["g"], "v", (0.5,)).collect()
    }
    quant = {
        r["q"]: r["value"]
        for r in group_quantiles(
            df, ["g"], "v", (0.5,), value_quantum=0.01
        ).collect()
    }
    assert abs(quant[0.5] - exact[0.5]) <= 0.005 + 1e-12
    with pytest.raises(ValueError, match="value_quantum"):
        group_quantiles(df, ["g"], "v", (0.5,), value_quantum=0.0)


def test_robust_outliers_resists_extreme_value(spark):
    # a single huge spike must not hide itself (the value_outliers
    # failure mode robust stats exist for)
    from emiproc_spark.operators.stats import robust_outliers

    rows = [("g", float(v)) for v in [1, 2, 3, 2, 1, 2, 3, 2, 1_000_000]]
    df = spark.createDataFrame(rows, schema="g string, v double")
    out = {
        r["g"]: (r["n"], r["n_outliers"], r["med"], r["mad"])
        for r in robust_outliers(df, ["g"], "v", k=3.5).collect()
    }
    n, n_out, med, mad = out["g"]
    assert (n, n_out) == (9, 1)
    assert med == 2.0 and mad == 1.0  # deviations: 1,0,1,0,1,0,1,0,big
    with pytest.raises(ValueError, match="k must be"):
        robust_outliers(df, ["g"], "v", k=0)


def test_widen_for_fanout_gates_on_size(spark):
    """r7 contract: the widen decision reads the optimized logical
    plan's size estimate — dimension-sized inputs skip the exchange,
    mid-sized compacted inputs widen to default parallelism.  r8: past
    par×maxPartitionBytes (or on the defaultSizeInBytes stats sentinel)
    the estimate can't distinguish a well-split 100 TB scan from a
    single-split gzip or checkpoint lineage, so the gate falls back to
    the observed partition count."""
    from emiproc_spark.qhelpers import widen_for_fanout

    par = spark.sparkContext.defaultParallelism
    tiny = spark.range(100).coalesce(1)
    # ~800 bytes: below the floor — no exchange at all
    assert widen_for_fanout(tiny) is tiny
    mid = spark.range(200_000).coalesce(1)  # ~1.6 MB estimate
    assert widen_for_fanout(mid).rdd.getNumPartitions() == par
    wide = spark.range(200_000).repartition(par + 4)
    # size says "widen" but the caller already repartitioned: the
    # round-robin exchange to par partitions is still correct (never
    # fewer than the input had at scale, where size exceeds the cap)
    assert widen_for_fanout(wide, min_bytes=10**12) is wide
    # Past the cap the estimate alone can't separate a well-split scan
    # from a single-split (gzip/checkpoint) shape; the r8 fallback
    # reads the OBSERVED partition count (r7 ADVICE finding).  Drive
    # the branch by shrinking maxPartitionBytes so the 1.6 MB frame
    # counts as "huge".
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024))
    try:
        one = spark.range(200_000).coalesce(1).localCheckpoint()
        assert widen_for_fanout(one).rdd.getNumPartitions() == par
        many = spark.range(200_000, numPartitions=par).localCheckpoint()
        assert widen_for_fanout(many) is many
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_psi_drift_known_values(spark):
    import math

    from emiproc_spark.operators.stats import psi_drift

    e = spark.createDataFrame(
        [(v,) for v in [1.0, 1.0, 5.0, 5.0, 5.0, None]], "v double"
    )
    a = spark.createDataFrame([(1.0,), (1.0,), (1.0,), (5.0,)], "v double")
    out = {
        r["bin"]: (r["n_expected"], r["n_actual"], r["psi_term"])
        for r in psi_drift(e, a, "v", [3.0]).collect()
    }
    # NULL dropped: expected = {bin0: 2, bin1: 3}, actual = {bin0: 3, bin1: 1}
    assert out[0][:2] == (2, 3) and out[1][:2] == (3, 1)
    pe0, pa0 = (2 + 1) / (5 + 2), (3 + 1) / (4 + 2)
    term0 = (pa0 - pe0) * math.log(pa0 / pe0)
    assert out[0][2] == math.floor(term0 * 1e9 + 0.5) / 1e9
    with pytest.raises(ValueError, match="ascending"):
        psi_drift(e, a, "v", [5.0, 3.0])


def test_cluster_split_keeps_near_dup_clusters_atomic(spark):
    from emiproc_spark.operators.sampling import cluster_split, hash_split

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # chain 0-1, 1-2 => {0,1,2} one cluster; 50-51 another; rest isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (50, 51)], "doc_a long, doc_b long"
    )
    fr = {"train": 0.5, "test": 0.5}
    got = {
        r["doc_id"]: r["split"]
        for r in cluster_split(docs, pairs, fr).collect()
    }
    assert got[0] == got[1] == got[2]
    assert got[50] == got[51]
    # isolated docs match plain hash_split exactly (same ladder, own id)
    base = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, fr).collect()
    }
    for i in range(200):
        if i not in (1, 2, 51):  # non-representative members may move
            assert got[i] == base[i], i
