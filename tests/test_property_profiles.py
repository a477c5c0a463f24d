"""Property-based tests (hypothesis) for profile-algebra invariants —
SURVEY §7.5's "easy to get subtly wrong" register: weighted merges must
use masked weights, zero-sum groups must go uniform, rebinning must
conserve mass.  One Spark job per example, so example counts stay low.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import TPROFILE
from emiproc_spark.operators.profiles import combine_profiles, normalize_ratios

ratio_vec = st.lists(
    st.floats(0.0, 100.0, allow_nan=False, allow_infinity=False),
    min_size=2,
    max_size=8,
)


@given(st.lists(ratio_vec.filter(lambda v: len(v) >= 2), min_size=1, max_size=5))
@settings(max_examples=15, deadline=None)
def test_normalize_ratios_sums_to_one(spark, vecs):
    n = max(len(v) for v in vecs)
    vecs = [v + [0.0] * (n - len(v)) for v in vecs]
    df = spark.createDataFrame([(v,) for v in vecs], "ratios array<double>")
    out = df.select(normalize_ratios(F.col("ratios")).alias("r")).collect()
    for row, src in zip(out, vecs):
        total = sum(row["r"])
        assert total == pytest.approx(1.0, abs=1e-9)
        if sum(src) == 0.0:
            assert all(x == pytest.approx(1.0 / n) for x in row["r"])


@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(0.01, 10.0), min_size=4, max_size=4),
            # subnormal weights underflow w*r to 0 in BOTH engines; the
            # operator then takes its documented all-zero → uniform
            # branch while the test's reference formula yields 0/0
            st.floats(0.0, 50.0, allow_subnormal=False),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_combine_profiles_is_weighted_average(spark, members):
    """Merging N profiles with emission weights must equal the numpy
    weighted average of their normalized ratio rows (reference
    weighted_combination, profiles/operators.py:58-138)."""
    profs = [
        (i, "daily4", [x / sum(vec) for x in vec])
        for i, (vec, _w) in enumerate(members)
    ]
    tprofiles = spark.createDataFrame(profs, schema=TPROFILE)
    index = spark.createDataFrame(
        [("A", f"s{i}", i, float(w)) for i, (_v, w) in enumerate(members)],
        "category string, substance string, profile_id int, weight double",
    )
    out = combine_profiles(index, tprofiles, ["category"]).collect()
    assert len(out) == 1
    got = np.array(out[0]["ratios"])
    w = np.array([m[1] for m in members])
    r = np.array([p[2] for p in profs])
    if w.sum() == 0.0:
        expected = np.full(4, 0.25)  # zero-weight group → uniform
    else:
        expected = (r * w[:, None]).sum(axis=0) / w.sum()
        expected = expected / expected.sum()
    np.testing.assert_allclose(got, expected, atol=1e-9)


@given(
    st.lists(st.floats(0.01, 1.0), min_size=3, max_size=6),
    st.lists(st.floats(10.0, 120.0), min_size=1, max_size=4),
)
@settings(max_examples=15, deadline=None)
def test_vertical_rebin_conserves_mass(spark, raw_ratios, extra_tops):
    """Re-binning onto any target covering the source span conserves
    the ratio mass (reference vertical_profiles.py:140-218)."""
    from emiproc_spark.operators.vertical import resample_vertical_profiles

    ratios = [x / sum(raw_ratios) for x in raw_ratios]
    tops = [20.0 * (i + 1) for i in range(len(ratios))]
    vp = spark.createDataFrame(
        [(0, tops, ratios)],
        "profile_id int, heights_top_m array<double>, ratios array<double>",
    )
    target = sorted(set([t for t in extra_tops if t < max(tops)] + [max(tops)]))
    out = resample_vertical_profiles(vp, target).collect()
    assert len(out) == 1
    assert sum(out[0]["ratios"]) == pytest.approx(1.0, abs=1e-9)


# ----------------------------------------------------------------------
# ensure_specific_days_consistency precedence lattice (round 5): for ANY
# subset of specific-day types, each dow resolves to the most specific
# covering type, else the general profile — and all 7 days are emitted.
# ----------------------------------------------------------------------
_DAY_COVER = {
    "monday": [0], "tuesday": [1], "wednesday": [2], "thursday": [3],
    "friday": [4], "saturday": [5], "sunday": [6],
    "weekday_4": [0, 1, 2, 3], "weekday": [0, 1, 2, 3, 4], "weekend": [5, 6],
}
_PRIO = {t: (0 if len(c) == 1 else (1 if t == "weekday_4" else 2))
         for t, c in _DAY_COVER.items()}


@given(
    st.lists(
        st.sampled_from(sorted(_DAY_COVER)), min_size=0, max_size=5, unique=True
    )
)
@settings(max_examples=40, deadline=None)
def test_specific_days_precedence_lattice(spark, types):
    from pyspark.sql import functions as F

    from emiproc_spark.operators.composite import ensure_specific_days_consistency

    marker = {t: float(i + 1) for i, t in enumerate(sorted(types))}
    general_val = 99.0
    prof = spark.createDataFrame(
        [(0, t, [marker[t]]) for t in types] or [(0, "weekday", [0.0])],
        schema="profile_id int, day_type string, ratios array<double>",
    )
    if not types:
        prof = prof.limit(0)
    general = spark.createDataFrame(
        [(0, [general_val])], schema="profile_id int, ratios array<double>"
    )
    out = {
        r["dow"]: r["ratios"][0]
        for r in ensure_specific_days_consistency(prof, general).collect()
    }
    assert set(out) == set(range(7))
    for dow in range(7):
        covering = [t for t in types if dow in _DAY_COVER[t]]
        if covering:
            best = min(covering, key=lambda t: _PRIO[t])
            assert out[dow] == marker[best], (dow, covering, out[dow])
        else:
            assert out[dow] == general_val


# ----------------------------------------------------------------------
# scaling_factor_at: over one full cycle of hourly stamps, the mean of
# sf(t) for a normalized profile is 1 — the invariant that makes
# temporal expansion mass-conserving for daily/weekly cycles.
# ----------------------------------------------------------------------
@given(
    st.sampled_from(["daily", "weekly"]),
    st.lists(st.floats(0.01, 10.0), min_size=24, max_size=24),
)
@settings(max_examples=20, deadline=None)
def test_scaling_factor_cycle_mean_is_one(spark, ptype, raw):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from emiproc_spark.operators.temporal import scaling_factor_at, time_scaffold

    n = {"daily": 24, "weekly": 7}[ptype]
    vals = raw[:n]
    total = sum(vals)
    ratios = [v / total for v in vals]
    subs = spark.createDataFrame([(ptype, ratios)], "ptype string, ratios array<double>")
    # one full cycle of hourly stamps: 24 h (daily) / 168 h (weekly)
    hours = time_scaffold(subs, "2024-01-01 00:00:00", n * (1 if ptype == "daily" else 24))
    out = hours.crossJoin(subs).agg(
        F.avg(scaling_factor_at(F.col("ts"), F.col("ptype"), F.col("ratios"))).alias("m")
    ).collect()[0]["m"]
    assert out == _pytest.approx(1.0, rel=1e-9)
