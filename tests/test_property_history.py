"""Property tests for changelog/resample operators against independent
Python reference models on random inputs."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.operators.history import apply_changelog, resample_interp

key = st.integers(1, 4)
ts = st.integers(-40, 40)


@given(
    st.lists(st.tuples(key, st.integers(0, 99)), min_size=0, max_size=8,
             unique_by=lambda r: r[0]),
    st.lists(st.tuples(key, st.integers(0, 99), ts,
                       st.booleans()), min_size=0, max_size=16,
             unique_by=lambda r: (r[0], r[2])),
)
@settings(max_examples=12, deadline=None)
def test_apply_changelog_matches_reference_model(spark, snap_rows, chg_rows):
    # reference model: latest (ts) change per key decides; delete
    # removes; untouched snapshot keys survive
    state = {k: v for k, v in snap_rows}
    latest: dict = {}
    for k, v, t, is_del in chg_rows:
        if k not in latest or t > latest[k][0]:
            latest[k] = (t, v, is_del)
    for k, (t, v, is_del) in latest.items():
        if is_del:
            state.pop(k, None)
        else:
            state[k] = v
    snap = spark.createDataFrame(
        [(k, v) for k, v in snap_rows] or [(None, None)], "k long, v long"
    ).where("k IS NOT NULL")
    chg = spark.createDataFrame(
        [(k, v, t, "delete" if d else "upsert") for k, v, t, d in chg_rows]
        or [(None, None, None, None)],
        "k long, v long, ts long, op string",
    ).where("k IS NOT NULL")
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(snap, chg, ["k"], ["ts"]).collect()
    }
    assert got == state


@given(
    st.lists(st.tuples(st.integers(-50, 50), st.integers(-100, 100)),
             min_size=1, max_size=10, unique_by=lambda r: r[0]),
    st.sampled_from([3, 7, 10]),
)
@settings(max_examples=12, deadline=None)
def test_resample_interp_matches_reference_model(spark, obs, bucket):
    # reference: per bucket last obs; gaps linear-interpolated at the
    # bucket start between the surrounding observations
    df = spark.createDataFrame(
        [(1, t, float(v)) for t, v in obs], "k long, ts long, v double"
    )
    got = {
        r["bucket_start"]: (r["value_q6"], r["is_gap"])
        for r in resample_interp(df, ["k"], "ts", "v", bucket).collect()
    }
    by_bucket: dict = {}
    for t, v in sorted(obs):
        by_bucket[t // bucket] = (t, float(v))  # last obs (max ts) wins
    b0, b1 = min(by_bucket), max(by_bucket)
    import math

    expect = {}
    for b in range(b0, b1 + 1):
        start = b * bucket
        if b in by_bucket:
            val, gap = by_bucket[b][1], False
        else:
            # anchors are the per-bucket LAST observations (the bucket
            # representatives), matching the operator and its oracle
            pb = max(x for x in by_bucket if x < b)
            nb = min(x for x in by_bucket if x > b)
            prev, nxt = by_bucket[pb], by_bucket[nb]
            w = (start - prev[0]) / (nxt[0] - prev[0])
            val, gap = prev[1] + (nxt[1] - prev[1]) * w, True
        expect[start] = (math.floor(val * 1e6 + 0.5) / 1e6, gap)
    assert got == expect


def test_resample_interp_null_values_are_gaps(spark):
    # NULL values are not observations: they drop before bucketing, so
    # a NULL-only bucket is a gap that interpolates across (never a
    # NULL representative poisoning its neighbours — r6 advisor find),
    # and an all-NULL key disappears entirely
    rows = [(1, 0, 10.0), (1, 7, None), (1, 14, 30.0), (2, 0, None)]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    got = {
        (r["k"], r["bucket_start"]): (r["value_q6"], r["is_gap"])
        for r in resample_interp(df, ["k"], "ts", "v", 7).collect()
    }
    assert got == {
        (1, 0): (10.0, False),
        (1, 7): (20.0, True),
        (1, 14): (30.0, False),
    }


def test_resample_locf_null_values_are_not_observations(spark):
    """A NULL value sharing a bucket with a real value must not become
    the bucket representative (it out-ranked the real value by ts,
    discarding it and leaking NULL through the never-NULL guarantee at
    a key's first bucket)."""
    from pyspark.sql import functions as F

    from emiproc_spark.operators.history import resample_locf

    ns = 10
    rows = [
        (1, 5, 100, 7.0),    # bucket 0: real value...
        (1, 9, 101, None),   # ...out-ranked by a later NULL (pre-fix)
        (1, 25, 102, 3.0),   # bucket 2
        (2, 5, 103, None),   # key 2: all-NULL -> disappears
    ]
    df = spark.createDataFrame(rows, "k long, ts long, event_id long, v double")
    out = resample_locf(df, ["k"], "ts", "v", ns, tiebreak=["event_id"])
    got = {(r["k"], r["bucket_start"]): (r["value_locf"], r["is_gap"])
           for r in out.collect()}
    assert got[(1, 0)] == (7.0, False)   # the real value represents
    assert got[(1, 10)] == (7.0, True)   # carried across the true gap
    assert got[(1, 20)] == (3.0, False)
    assert all(k != 2 for k, _ in got)   # all-NULL key emits nothing
    assert all(v is not None for v, _ in got.values())


def test_resample_interp_weights_exact_at_fine_buckets(spark):
    """Interpolation weights must be computed from int64 DIFFERENCES:
    epoch-ns endpoints (~1.7e18) exceed 2^53, so casting them to double
    first (ULP 256 ns) zeroed (t_next - t_prev) for fine buckets and
    NULLed every gap value."""
    from emiproc_spark.operators.history import resample_interp

    base = 1_700_000_000_000_000_000  # epoch ns, 2023 era
    ns = 100  # bucket width below the double ULP at this magnitude
    rows = [(1, base + 5, 1, 0.0), (1, base + 305, 2, 3.0)]
    df = spark.createDataFrame(rows, "k long, ts long, event_id long, v double")
    out = resample_interp(df, ["k"], "ts", "v", ns, tiebreak=["event_id"])
    got = {r["bucket_start"] - base: (r["value_q6"], r["is_gap"])
           for r in out.collect()}
    assert set(got) == {0, 100, 200, 300}
    # buckets at +100 and +200 are gaps; weights (95/300, 195/300)
    vals = sorted((v for v, g in got.values() if g))
    assert vals == [0.95, 1.95], vals
    assert all(v is not None for v, _ in got.values())
