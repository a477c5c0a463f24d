import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import EMISSIONS
from emiproc_spark.operators import (
    add_inventories,
    drop,
    get_total_emissions,
    group_categories,
    group_substances,
    merge_substances,
    scale_inventory,
    speciate_nox,
    total_emissions_almost_equal,
)


@pytest.fixture(scope="module")
def emissions(spark):
    # mirrors the reference toy inventory (tests_utils/test_inventories.py:16-26)
    rows = []
    for cell in range(5):
        rows += [
            (cell, "adf", "CH4", float(cell)),
            (cell, "adf", "CO2", float(cell + 1)),
            (cell, "liku", "CO2", float(cell + 3)),
            (cell, "test", "NH3", float(2 * cell)),
            (cell, "test", "NOx", 10.0),
        ]
    return spark.createDataFrame(rows, schema=EMISSIONS)


def test_totals_rollup(emissions):
    t = get_total_emissions(emissions)
    rows = {(r["substance"], r["category"]): r["total_kg_y"] for r in t.collect()}
    assert rows[("CH4", "adf")] == sum(range(5))
    assert rows[("CO2", "__total__")] == sum(c + 1 for c in range(5)) + sum(c + 3 for c in range(5))
    assert ("NH3", "test") in rows


def test_group_categories_conserves(emissions):
    grouped = group_categories(emissions, {"all": ["adf", "liku", "test"]})
    assert total_emissions_almost_equal(
        get_total_emissions(emissions).groupBy("substance").agg(F.sum("total_kg_y").alias("total_kg_y")).withColumn("category", F.lit("x")),
        get_total_emissions(grouped).groupBy("substance").agg(F.sum("total_kg_y").alias("total_kg_y")).withColumn("category", F.lit("x")),
    )
    assert grouped.select("category").distinct().count() == 1


def test_group_categories_duplicate_member_raises(emissions):
    with pytest.raises(ValueError):
        group_categories(emissions, {"a": ["adf"], "b": ["adf"]})


def test_group_substances(emissions):
    g = group_substances(emissions, {"GHG": ["CH4", "CO2"]})
    subs = {r[0] for r in g.select("substance").distinct().collect()}
    assert subs == {"GHG", "NH3", "NOx"}


def test_scale_inventory_global(emissions):
    doubled = scale_inventory(emissions, 2.0)
    t0 = get_total_emissions(emissions).collect()
    t1 = {(r["substance"], r["category"]): r["total_kg_y"] for r in get_total_emissions(doubled).collect()}
    for r in t0:
        assert t1[(r["substance"], r["category"])] == pytest.approx(2 * r["total_kg_y"])


def test_scale_inventory_table(spark, emissions):
    factors = spark.createDataFrame(
        [("adf", "CH4", 10.0)], schema="category string, substance string, factor double"
    )
    scaled = scale_inventory(emissions, factors)
    t = {(r["substance"], r["category"]): r["total_kg_y"] for r in get_total_emissions(scaled).collect()}
    assert t[("CH4", "adf")] == 10 * sum(range(5))
    assert t[("CO2", "adf")] == sum(c + 1 for c in range(5))  # untouched


def test_drop_keep(emissions):
    kept = drop(emissions, substances=["CO2"], keep_instead_of_drop=True)
    assert {r[0] for r in kept.select("substance").distinct().collect()} == {"CO2"}
    dropped = drop(emissions, categories=["test"])
    assert "test" not in {r[0] for r in dropped.select("category").distinct().collect()}


def test_add_inventories(emissions):
    total = add_inventories(emissions, scale_inventory(emissions, 2.0))
    t = {(r["substance"], r["category"]): r["total_kg_y"] for r in get_total_emissions(total).collect()}
    assert t[("CH4", "adf")] == 3 * sum(range(5))


def test_speciate_nox(emissions):
    sp = speciate_nox(emissions, no2_fraction=0.2)
    t = {(r["substance"], r["category"]): r["total_kg_y"] for r in get_total_emissions(sp).collect()}
    assert ("NOx", "test") not in t
    assert t[("NO2", "test")] == pytest.approx(0.2 * 50.0)
    assert t[("NO", "test")] == pytest.approx(0.8 * 50.0 * 30.0 / 46.0)
    # other substances untouched
    assert t[("CH4", "adf")] == sum(range(5))


def test_merge_substances(emissions):
    m = merge_substances(emissions, {"CO2eq": ["CO2", "CH4"]})
    t = {(r["substance"], r["category"]): r["total_kg_y"] for r in get_total_emissions(m).collect()}
    assert t[("CO2eq", "adf")] == sum(range(5)) + sum(c + 1 for c in range(5))


def test_group_substances_strict_raises_on_uncovered(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql.utils import PythonException

    from emiproc_spark.operators.basic import group_substances

    e = spark.createDataFrame(
        [(0, "A", "F", 1.0), (0, "A", "XX", 2.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    with pytest.raises(Exception, match="not covered"):
        group_substances(e, {"ALL": ["F", "O"]}, strict=True).collect()
    # non-strict: uncovered substance passes through unchanged
    rows = {
        r["substance"]: r["value_kg_y"]
        for r in group_substances(e, {"ALL": ["F", "O"]}).collect()
    }
    assert rows == {"ALL": 1.0, "XX": 2.0}


def test_total_emissions_diff_and_almost_equal(spark):
    from emiproc_spark.operators.basic import (
        total_emissions_almost_equal,
        total_emissions_diff,
    )

    a = spark.createDataFrame(
        [("CO2", "traffic", 100.0), ("CO2", "__total__", 100.0)],
        "substance string, category string, total_kg_y double",
    )
    b_ok = spark.createDataFrame(
        [("CO2", "traffic", 100.0000001), ("CO2", "__total__", 100.0000001)],
        "substance string, category string, total_kg_y double",
    )
    b_bad = spark.createDataFrame(
        [("CO2", "traffic", 101.0), ("CO2", "__total__", 101.0)],
        "substance string, category string, total_kg_y double",
    )
    b_miss = spark.createDataFrame(
        [("CH4", "traffic", 100.0)],
        "substance string, category string, total_kg_y double",
    )
    assert total_emissions_almost_equal(a, b_ok)
    assert not total_emissions_almost_equal(a, b_bad)
    assert not total_emissions_almost_equal(a, b_miss)
    rows = {
        (r["substance"], r["category"]): r["within_tol"]
        for r in total_emissions_diff(a, b_miss).collect()
    }
    assert rows[("CO2", "traffic")] is False  # only in a
    assert rows[("CH4", "traffic")] is False  # only in b


def test_scale_inventory_duplicate_factor_raises(spark, emissions):
    from emiproc_spark.operators.basic import scale_inventory

    dup = spark.createDataFrame(
        [("adf", "CO2", 1.1), ("adf", "CO2", 1.1)],
        "category string, substance string, factor double",
    )
    with pytest.raises(Exception, match="several factor rows"):
        scale_inventory(emissions, dup).collect()


def test_drop_empty_keep_list_keeps_nothing(spark, emissions):
    from emiproc_spark.operators.basic import drop

    assert drop(emissions, categories=[], keep_instead_of_drop=True).count() == 0
    # empty drop-list drops nothing; None skips the filter
    assert drop(emissions, categories=[]).count() == emissions.count()
    assert drop(emissions).count() == emissions.count()


def test_total_emissions_null_category_not_conflated(spark):
    from emiproc_spark.operators.basic import get_total_emissions

    e = spark.createDataFrame(
        [(0, None, "CO2", 3.0), (1, "heat", "CO2", 4.0)],
        "cell_id long, category string, substance string, value_kg_y double",
    )
    rows = {(r["category"], r["total_kg_y"]) for r in get_total_emissions(e).collect()}
    # NULL-category data row stays distinct from the __total__ subtotal
    assert (None, 3.0) in rows
    assert ("heat", 4.0) in rows
    assert ("__total__", 7.0) in rows
