"""Property tests for the temporal joins: asof_join must agree with
pandas.merge_asof (an independent reference implementation) on random
data in every direction, and range_join with a brute-force overlap
scan.  One Spark job per example — example counts stay low."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.operators.joins import asof_join, range_join

ts = st.integers(0, 60)
key = st.integers(1, 3)
lrows = st.lists(st.tuples(key, ts), min_size=1, max_size=14, unique=True)
# unique (key, ts) on the right: at duplicate timestamps pandas keeps
# the later input row while we keep the max payload — both arbitrary,
# legitimately different tie rules
rrows = st.lists(st.tuples(key, ts), min_size=0, max_size=14, unique=True)


@given(lrows, rrows, st.sampled_from(["backward", "forward", "nearest"]),
       st.sampled_from([None, 3, 10]))
@settings(max_examples=15, deadline=None)
def test_asof_matches_pandas_merge_asof(spark, lt, rt, direction, tol):
    left_pd = pd.DataFrame(
        {"k": [k for k, _ in lt], "ts": [t for _, t in lt]}
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    right_pd = (
        pd.DataFrame(
            {"k": [k for k, _ in rt], "ts": [t for _, t in rt],
             "v": [float(k * 100 + t) for k, t in rt]}
        )
        .astype({"k": "int64", "ts": "int64", "v": "float64"})
        .sort_values("ts", kind="stable")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left_pd, right_pd, on="ts", by="k", direction=direction,
        tolerance=tol, suffixes=("", "_r"),
    )
    exp = {
        (r.k, r.ts): (None if pd.isna(r.v) else r.v)
        for r in expect.itertuples()
    }

    left = spark.createDataFrame(left_pd, "k int, ts long")
    right = spark.createDataFrame(right_pd, "k int, ts long, v double")
    got = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, "ts", ["k"], ["v"],
            tolerance=tol, direction=direction,
        ).collect()
    }
    assert got == exp


iv = st.tuples(st.integers(0, 40), st.integers(0, 15))  # (start, length)
ivrows = st.lists(st.tuples(key, iv), min_size=1, max_size=10)


@given(ivrows, ivrows, st.sampled_from([1, 4, 9]))
@settings(max_examples=15, deadline=None)
def test_range_join_matches_bruteforce(spark, li, ri, bucket):
    lrows = [(k, s, s + n) for k, (s, n) in li]
    rrows = [(k, s, s + n) for k, (s, n) in ri]
    # true overlap is max(starts) < min(ends); the two cross conditions
    # suffice only for NON-empty intervals (an empty [5,5) would pair
    # with everything containing 5) — mirror range_join's semantics
    expect = sorted(
        (lk, ls, rs)
        for (lk, ls, le) in lrows
        for (rk, rs, re) in rrows
        if lk == rk and ls < le and rs < re and ls < re and rs < le
    )
    left = spark.createDataFrame(lrows, "k int, start long, end long")
    right = spark.createDataFrame(rrows, "k int, start long, end long")
    got = sorted(
        (r["k"], r["start"], r["r_start"])
        for r in range_join(left, right, ["k"], bucket=bucket).collect()
    )
    assert got == expect
