"""Speciation + temporal-index semantics pinned by ADVICE r01:

- country-fraction blend normalizes per cell (partial coverage keeps
  full mass, reference speciation.py:211-213);
- -99 default applies only where the blended ratio sum is 0
  (speciation.py:238-258) and raises when absent with nonzero mass;
- uncovered cells are kept (left-join), not dropped;
- duplicate year/type selector rows raise instead of multiplying mass;
- speciate_inventory cross-category fan-out;
- temporally_scaled wildcard resolution + ambiguity guards;
- group_categories strict mode.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from emiproc_spark.core.schemas import CELL_COUNTRY, EMISSIONS, SPECIATION
from emiproc_spark.operators.basic import group_categories
from emiproc_spark.operators.speciation import speciate, speciate_inventory


def _collect(df):
    return {
        (r["cell_id"], r["category"], r["substance"]): r["value_kg_y"]
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def emissions(spark):
    rows = [
        (0, "heat", "NMVOC", 10.0),
        (1, "heat", "NMVOC", 20.0),
        (2, "heat", "NMVOC", 30.0),  # cell not covered by any country
        (0, "heat", "CO2", 5.0),
    ]
    return spark.createDataFrame(rows, schema=EMISSIONS)


def _spec(spark, rows):
    return spark.createDataFrame(rows, schema=SPECIATION)


def test_country_blend_normalizes_partial_coverage(spark, emissions):
    # cell 0 fully in AAA; cell 1 only 50 % covered by AAA — the
    # reference normalizes fractions per cell, so cell 1 still splits
    # its FULL mass with AAA's ratios.
    spec = _spec(
        spark,
        [
            (None, "AAA", None, None, "NMVOC", "tol", 0.25),
            (None, "AAA", None, None, "NMVOC", "xyl", 0.75),
            (None, "-99", None, None, "NMVOC", "tol", 1.0),
            (None, "-99", None, None, "NMVOC", "xyl", 0.0),
        ],
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 1.0), (1, "AAA", 0.5)], schema=CELL_COUNTRY
    )
    out = _collect(speciate(emissions, spec, cell_country=cc))
    assert out[(0, "heat", "tol")] == pytest.approx(2.5)
    assert out[(0, "heat", "xyl")] == pytest.approx(7.5)
    # cell 1: normalized fraction 0.5/0.5 = 1.0 → full mass split
    assert out[(1, "heat", "tol")] == pytest.approx(5.0)
    assert out[(1, "heat", "xyl")] == pytest.approx(15.0)
    # cell 2 uncovered → falls to the -99 default row (not dropped)
    assert out[(2, "heat", "tol")] == pytest.approx(30.0)
    assert out[(2, "heat", "xyl")] == pytest.approx(0.0)
    # CO2 has no speciation entry → passes through
    assert out[(0, "heat", "CO2")] == pytest.approx(5.0)
    # mass conserved overall for NMVOC
    tot = sum(v for (c, _, s), v in out.items() if s in ("tol", "xyl"))
    assert tot == pytest.approx(60.0)


def test_country_blend_two_countries_weighted(spark, emissions):
    spec = _spec(
        spark,
        [
            (None, "AAA", None, None, "NMVOC", "tol", 1.0),
            (None, "BBB", None, None, "NMVOC", "tol", 0.5),
            (None, "AAA", None, None, "NMVOC", "xyl", 0.0),
            (None, "BBB", None, None, "NMVOC", "xyl", 0.5),
        ],
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 0.6), (0, "BBB", 0.2)], schema=CELL_COUNTRY
    )
    out = _collect(speciate(emissions.where("cell_id = 0"), spec, cell_country=cc))
    # normalized: AAA 0.75, BBB 0.25 → tol 0.75·1+0.25·0.5=0.875
    assert out[(0, "heat", "tol")] == pytest.approx(8.75)
    assert out[(0, "heat", "xyl")] == pytest.approx(1.25)


def test_country_no_default_raises_on_uncovered_nonzero(spark, emissions):
    spec = _spec(
        spark,
        [
            (None, "AAA", None, None, "NMVOC", "tol", 1.0),
        ],
    )
    cc = spark.createDataFrame([(0, "AAA", 1.0)], schema=CELL_COUNTRY)
    with pytest.raises(Exception, match="-99|SparkRuntimeException"):
        speciate(emissions, spec, cell_country=cc).collect()


def test_duplicate_selector_rows_raise(spark, emissions):
    # two ratio sets for the same (category-wildcard, NMVOC, tol) —
    # e.g. two years left unresolved — must raise, not double mass
    spec = _spec(
        spark,
        [
            (None, None, None, 2020, "NMVOC", "tol", 0.5),
            (None, None, None, 2021, "NMVOC", "tol", 0.6),
        ],
    )
    with pytest.raises(Exception, match="selector|SparkRuntimeException"):
        speciate(emissions, spec).collect()
    # resolving via the year argument works
    out = _collect(speciate(emissions, spec, year=2020))
    assert out[(0, "heat", "tol")] == pytest.approx(5.0)


def test_type_selector_filters(spark, emissions):
    spec = _spec(
        spark,
        [
            (None, None, "gridded", None, "NMVOC", "tol", 0.5),
            (None, None, "shapped", None, "NMVOC", "tol", 0.9),
        ],
    )
    out = _collect(speciate(emissions, spec, source_type="gridded"))
    assert out[(0, "heat", "tol")] == pytest.approx(5.0)


def test_speciate_inventory_cross_category(spark, emissions):
    # (heat, CO2) fans out into a *different* category with non-normalized
    # ratios (reference speciate_inventory, speciation.py:351-436)
    d = {
        ("heat", "CO2"): {
            ("bio", "CO2_bio"): 0.3,
            ("heat", "CO2_foss"): 0.8,  # sums to 1.1 — allowed
        }
    }
    out = _collect(speciate_inventory(emissions, d))
    assert out[(0, "bio", "CO2_bio")] == pytest.approx(1.5)
    assert out[(0, "heat", "CO2_foss")] == pytest.approx(4.0)
    assert (0, "heat", "CO2") not in out
    # untouched keys pass through
    assert out[(0, "heat", "NMVOC")] == pytest.approx(10.0)
    # keep-source variant
    out2 = _collect(speciate_inventory(emissions, d, drop_speciated=False))
    assert out2[(0, "heat", "CO2")] == pytest.approx(5.0)


def test_group_categories_strict_raises(spark, emissions):
    two_cats = emissions.unionByName(
        spark.createDataFrame([(0, "road", "CO2", 1.0)], schema=EMISSIONS)
    )
    with pytest.raises(Exception, match="not covered|SparkRuntimeException"):
        group_categories(two_cats, {"grp": ["heat"]}, strict=True).collect()
    ok = group_categories(emissions, {"grp": ["heat"]}, strict=True)
    assert ok.where("category = 'grp'").count() > 0


def test_temporal_wildcard_and_ambiguity(spark):
    from emiproc_spark.core.schemas import TPROFILE, TPROFILE_INDEX
    from emiproc_spark.operators.temporal import temporally_scaled

    e = spark.createDataFrame(
        [(0, "heat", "CO2", 8760.0), (0, "road", "CO2", 8760.0)],
        schema=EMISSIONS,
    )
    # profile 1: all mass in hour 0 of the day
    ratios = [1.0] + [0.0] * 23
    store = spark.createDataFrame([(1, "daily", ratios)], schema=TPROFILE)
    # wildcard index: substance-only row applies to both categories
    idx = spark.createDataFrame(
        [(None, "CO2", None, None, None, 1)], schema=TPROFILE_INDEX
    )
    out = temporally_scaled(e, idx, store, "2024-01-01 00:00:00", 2)
    rows = {(r["category"], r["hour_index"]): r["value_kg_h"] for r in out.collect()}
    assert rows[("heat", 0)] == pytest.approx(24.0)  # sf = 1.0·24
    assert rows[("heat", 1)] == pytest.approx(0.0)
    assert rows[("road", 0)] == pytest.approx(24.0)
    # specific row overrides the wildcard
    idx2 = spark.createDataFrame(
        [(None, "CO2", None, None, None, 1), ("heat", "CO2", None, None, None, -1)],
        schema=TPROFILE_INDEX,
    )
    out2 = temporally_scaled(e, idx2, store, "2024-01-01 00:00:00", 1)
    rows2 = {(r["category"], r["hour_index"]): r["value_kg_h"] for r in out2.collect()}
    assert rows2[("heat", 0)] == pytest.approx(1.0)  # constant profile
    assert rows2[("road", 0)] == pytest.approx(24.0)
    # duplicate rows for the same key raise
    dup = spark.createDataFrame(
        [(None, "CO2", None, None, None, 1), (None, "CO2", None, None, None, 2)],
        schema=TPROFILE_INDEX,
    )
    with pytest.raises(Exception, match="ambiguous|SparkRuntimeException"):
        temporally_scaled(e, dup, store, "2024-01-01 00:00:00", 1).collect()
    # cell-keyed rows must be resolved first
    cellidx = spark.createDataFrame(
        [(None, "CO2", 0, None, None, 1)], schema=TPROFILE_INDEX
    )
    with pytest.raises(Exception, match="ambiguous|SparkRuntimeException"):
        temporally_scaled(e, cellidx, store, "2024-01-01 00:00:00", 1).collect()


def test_temporal_composite_product(spark):
    from emiproc_spark.core.schemas import TPROFILE, TPROFILE_INDEX
    from emiproc_spark.operators.temporal import temporally_scaled

    e = spark.createDataFrame([(0, "heat", "CO2", 8760.0)], schema=EMISSIONS)
    # composite profile: daily × weekly rows under one profile_id —
    # factors multiply instead of fanning out the fact table
    daily = [1.0] + [0.0] * 23
    weekly = [1.0 / 7.0] * 7
    store = spark.createDataFrame(
        [(1, "daily", daily), (1, "weekly", weekly)], schema=TPROFILE
    )
    idx = spark.createDataFrame(
        [("heat", "CO2", None, None, None, 1)], schema=TPROFILE_INDEX
    )
    out = temporally_scaled(e, idx, store, "2024-01-01 00:00:00", 1)
    rows = out.collect()
    assert len(rows) == 1  # no fan-out
    # sf = (1.0·24) · (1/7·7) = 24
    assert rows[0]["value_kg_h"] == pytest.approx(24.0)


def test_country_blend_missing_dst_resolves_to_zero_not_default(spark):
    """A dst substance only covered by countries that don't touch this
    cell must get ratio 0 (the cell's blend sum is nonzero), NOT the
    -99 default — otherwise mass inflates (review finding r3)."""
    from emiproc_spark.core.schemas import SPECIATION
    from emiproc_spark.operators.speciation import speciate

    e = spark.createDataFrame(
        [(0, "cat", "F", 100.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    spec = spark.createDataFrame(
        [
            (None, "C0", None, None, "F", "F1", 1.0),   # covers cell 0
            (None, "C1", None, None, "F", "F2", 1.0),   # does NOT cover cell 0
            (None, "-99", None, None, "F", "F1", 0.5),
            (None, "-99", None, None, "F", "F2", 0.5),
        ],
        schema=SPECIATION,
    )
    cc = spark.createDataFrame(
        [(0, "C0", 1.0)], "cell_id long, country string, fraction double"
    )
    out = {
        r["substance"]: r["value_kg_y"]
        for r in speciate(e, spec, cell_country=cc).collect()
    }
    assert out["F1"] == 100.0
    assert out.get("F2", 0.0) == 0.0  # NOT 50 from the -99 default


def test_speciate_cc_passthrough_uses_filtered_table(spark):
    """A substance whose only ratio rows fail the year selector is
    unspeciated FOR THIS CALL: it must pass through, not vanish
    (round-5 review repro: 10 kg dropped)."""
    e = spark.createDataFrame(
        [(0, "heat", "NMVOC", 10.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    spec = spark.createDataFrame(
        [(None, "AAA", None, 2020, "NMVOC", "tol", 1.0)],
        "category string, country string, type string, year int, "
        "src_substance string, dst_substance string, ratio double",
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 1.0)], "cell_id long, country string, fraction double"
    )
    out = speciate(e, spec, cell_country=cc, year=2021).collect()
    assert [(r["substance"], r["value_kg_y"]) for r in out] == [("NMVOC", 10.0)]


def test_speciate_cc_blend_is_per_category(spark):
    """Ratio rows differing only in category must not be summed in the
    country blend (round-5 review repro: 2.5x mass inflation)."""
    e = spark.createDataFrame(
        [(0, "heat", "NMVOC", 10.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    spec = spark.createDataFrame(
        [
            ("heat", "AAA", None, None, "NMVOC", "tol", 0.4),
            ("heat", "AAA", None, None, "NMVOC", "xyl", 0.6),
            ("boat", "AAA", None, None, "NMVOC", "tol", 0.6),
            ("boat", "AAA", None, None, "NMVOC", "xyl", 0.4),
        ],
        "category string, country string, type string, year int, "
        "src_substance string, dst_substance string, ratio double",
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 1.0)], "cell_id long, country string, fraction double"
    )
    out = {r["substance"]: r["value_kg_y"] for r in speciate(e, spec, cell_country=cc).collect()}
    assert out == {"tol": pytest.approx(4.0), "xyl": pytest.approx(6.0)}


def test_speciate_cc_wildcard_category_fallback_and_missing_raises(spark):
    e = spark.createDataFrame(
        [(0, "heat", "NMVOC", 10.0), (0, "boat", "NMVOC", 2.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    # specific rows for heat only + a wildcard for everything else
    spec = spark.createDataFrame(
        [
            ("heat", "AAA", None, None, "NMVOC", "tol", 1.0),
            (None, "AAA", None, None, "NMVOC", "xyl", 1.0),
        ],
        "category string, country string, type string, year int, "
        "src_substance string, dst_substance string, ratio double",
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 1.0)], "cell_id long, country string, fraction double"
    )
    out = {
        (r["category"], r["substance"]): r["value_kg_y"]
        for r in speciate(e, spec, cell_country=cc).collect()
    }
    # heat uses its specific row, boat falls back to the wildcard
    assert out == {("heat", "tol"): pytest.approx(10.0),
                   ("boat", "xyl"): pytest.approx(2.0)}

    # no wildcard: the uncovered category raises like the reference
    spec2 = spec.where(F.col("category").isNotNull())
    with pytest.raises(Exception, match="no ratio rows for category"):
        speciate(e, spec2, cell_country=cc).collect()


def test_speciate_cc_duplicate_rows_raise(spark):
    e = spark.createDataFrame(
        [(0, "heat", "NMVOC", 10.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    spec = spark.createDataFrame(
        [
            ("heat", "AAA", None, 2020, "NMVOC", "tol", 0.4),
            ("heat", "AAA", None, 2021, "NMVOC", "tol", 0.6),
        ],
        "category string, country string, type string, year int, "
        "src_substance string, dst_substance string, ratio double",
    )
    cc = spark.createDataFrame(
        [(0, "AAA", 1.0)], "cell_id long, country string, fraction double"
    )
    with pytest.raises(Exception, match="multiple ratio rows"):
        speciate(e, spec, cell_country=cc).collect()  # year unresolved
    # resolving the year disambiguates
    out = speciate(e, spec, cell_country=cc, year=2021).collect()
    assert out[0]["value_kg_y"] == pytest.approx(6.0)
