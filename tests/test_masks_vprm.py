import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import EMISSIONS
from emiproc_spark.functions.geometry import wkb_box
from emiproc_spark.grids import regular_grid
from emiproc_spark.operators.masks import (
    cell_region_fractions,
    combine_inventories,
    majority_region,
)
from emiproc_spark.operators.regrid import crop_weights_rect
from emiproc_spark.operators.vprm import (
    people_to_emissions,
    vegetation_indices,
    vprm_gee,
    vprm_respiration,
)


@pytest.fixture(scope="module")
def grid(spark):
    return regular_grid(spark, 0.0, 0.0, 2, 2, 1.0, 1.0, with_geometry=False).cache()


@pytest.fixture(scope="module")
def regions(spark):
    # region A covers left column, B covers right-bottom cell only
    rows = [
        (0, "A", wkb_box(0, 0, 1, 2), 0.0, 0.0, 1.0, 2.0, 2.0),
        (1, "B", wkb_box(1, 0, 2, 0.5), 1.0, 0.0, 2.0, 0.5, 0.5),
    ]
    return spark.createDataFrame(
        rows,
        schema="region_key long, country string, geometry binary, "
        "xmin double, ymin double, xmax double, ymax double, area double",
    )


def test_cell_region_fractions(spark, grid, regions):
    fr = {(r["cell_id"], r["country"]): r["fraction"] for r in
          cell_region_fractions(regions, grid, tile=1.0).collect()}
    # cells 0,1 (left column) fully in A
    assert fr[(0, "A")] == pytest.approx(1.0)
    assert fr[(1, "A")] == pytest.approx(1.0)
    # cell 2 (x 1-2, y 0-1) covered 50% by B
    assert fr[(2, "B")] == pytest.approx(0.5)
    assert (3, "A") not in fr and (3, "B") not in fr  # ocean


def test_majority_region(spark, grid, regions):
    fr = cell_region_fractions(regions, grid, tile=1.0)
    m = {r["cell_id"]: r["country"] for r in majority_region(fr, grid).collect()}
    assert m[0] == "A" and m[2] == "B" and m[3] == "-99"


def test_combine_inventories_conserves(spark, grid):
    e = spark.createDataFrame(
        [(c, "cat", "CO2", 10.0) for c in range(4)], schema=EMISSIONS
    )
    cw = crop_weights_rect(grid, 0.5, 0.5, 1.5, 1.5)
    out = combine_inventories(e, e, cw)
    # inside + outside of the same inventory = original totals
    tot = out.agg(F.sum("value_kg_y")).collect()[0][0]
    assert tot == pytest.approx(40.0)


def test_vegetation_indices(spark):
    df = spark.createDataFrame([(0.5, 0.2, 0.1, 0.05)], "nir double, swir double, red double, blue double")
    r = vegetation_indices(df).collect()[0]
    assert r["ndvi"] == pytest.approx((0.5 - 0.1) / (0.5 + 0.1))
    assert r["lswi"] == pytest.approx((0.5 - 0.2) / (0.5 + 0.2))


def test_vprm_gee_zero_outside_trange(spark):
    df = spark.createDataFrame(
        [(-5.0, 100.0, 0.3, 0.2), (20.0, 100.0, 0.3, 0.2)],
        "temperature_c double, rad_w_m2 double, evi double, lswi double",
    )
    out = vprm_gee(df, 0.2, 570.0).collect()
    by_t = {r["temperature_c"]: r["gee"] for r in out}
    assert by_t[-5.0] == 0.0
    assert by_t[20.0] > 0.0  # Topt → max Tscale


def test_respiration(spark):
    df = spark.createDataFrame([(-10.0,), (10.0,)], "temperature_c double")
    out = {r["temperature_c"]: r["respiration"] for r in vprm_respiration(df, 0.1, 0.5).collect()}
    assert out[-10.0] == pytest.approx(0.5)  # clamped at T_low=0
    assert out[10.0] == pytest.approx(1.5)


def test_people_to_emissions(spark):
    df = spark.createDataFrame([(100,)], "n_people long")
    r = people_to_emissions(df, 0.9, time_ratio=0.5, days_per_year=365.0).collect()[0]
    assert r["value_kg_y"] == pytest.approx(0.9 * 100 * 0.5 * 365.0)
