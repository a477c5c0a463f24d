import pytest
from pyspark.sql import functions as F

from emiproc_spark.core.schemas import EMISSIONS
from emiproc_spark.functions.geometry import wkb_linestring, wkb_point, wkb_polygon
from emiproc_spark.grids import regular_grid
from emiproc_spark.operators.regrid import (
    clip_box,
    crop_weights_rect,
    crop_with_shape,
    remap_inventory,
    weights_poly_rect,
    weights_rect_rect,
    weights_remap,
)


@pytest.fixture(scope="module")
def fine_grid(spark):
    return regular_grid(spark, 0.0, 0.0, 4, 4, 1.0, 1.0, with_geometry=False).cache()


@pytest.fixture(scope="module")
def coarse_grid(spark):
    return regular_grid(spark, 0.0, 0.0, 2, 2, 2.0, 2.0, with_geometry=False).cache()


@pytest.fixture(scope="module")
def emissions(spark, fine_grid):
    cells = [r["cell_id"] for r in fine_grid.select("cell_id").collect()]
    rows = [(c, "cat", "CO2", float(c + 1)) for c in cells]
    return spark.createDataFrame(rows, schema=EMISSIONS).cache()


def test_weights_rect_rect_partition_of_unity(fine_grid, coarse_grid):
    w = weights_rect_rect(fine_grid, coarse_grid, tile=2.0)
    per_src = w.groupBy("src_id").agg(F.sum("weight").alias("s")).collect()
    assert len(per_src) == 16
    for r in per_src:
        assert r["s"] == pytest.approx(1.0)


def test_remap_conserves_mass(emissions, fine_grid, coarse_grid):
    remapped = remap_inventory(emissions, fine_grid, coarse_grid, tile=2.0)
    assert remapped.count() == 4
    total0 = emissions.agg(F.sum("value_kg_y")).collect()[0][0]
    total1 = remapped.agg(F.sum("value_kg_y")).collect()[0][0]
    assert total1 == pytest.approx(total0)


def test_remap_misaligned_grid(spark, emissions, fine_grid):
    # coarse grid offset by 0.5 — fractional overlaps, still conservative
    target = regular_grid(spark, -0.5, -0.5, 3, 3, 2.0, 2.0, with_geometry=False)
    remapped = remap_inventory(emissions, fine_grid, target, tile=2.0)
    total0 = emissions.agg(F.sum("value_kg_y")).collect()[0][0]
    total1 = remapped.agg(F.sum("value_kg_y")).collect()[0][0]
    assert total1 == pytest.approx(total0)


def test_weights_poly_sources(spark, fine_grid):
    # polygon straddling 2 cells; point on 4-corner; line across 2 cells
    rows = [
        (0, wkb_polygon([(0.5, 0.2), (1.5, 0.2), (1.5, 0.8), (0.5, 0.8)]), 0.5, 0.2, 1.5, 0.8),
        (1, wkb_point(2.0, 2.0), 2.0, 2.0, 2.0, 2.0),
        (2, wkb_linestring([(0.5, 3.5), (3.5, 3.5)]), 0.5, 3.5, 3.5, 3.5),
    ]
    src = spark.createDataFrame(
        rows, schema="source_id long, geometry binary, xmin double, ymin double, xmax double, ymax double"
    )
    w = weights_poly_rect(src, fine_grid, tile=2.0)
    rows = w.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src_id"], {})[r["dst_id"]] = r["weight"]
    # polygon: half area in cell (0,0)=id0, half in cell (1,0)=id4
    assert by_src[0][0] == pytest.approx(0.5)
    assert by_src[0][4] == pytest.approx(0.5)
    # point on corner shared by 4 cells → 1/4 each
    assert len(by_src[1]) == 4
    for v in by_src[1].values():
        assert v == pytest.approx(0.25)
    # line: total length 3, spans x in [0.5,3.5] at y=3.5 → cells j=3, i=0..3
    assert sum(by_src[2].values()) == pytest.approx(1.0)
    assert by_src[2][3] == pytest.approx(0.5 / 3)  # i=0,j=3 → id 3
    assert by_src[2][7] == pytest.approx(1.0 / 3)


def test_crop_with_shape(emissions, fine_grid):
    cw = crop_weights_rect(fine_grid, 0.5, 0.5, 2.5, 2.5)
    cropped = crop_with_shape(emissions, cw)
    inside = crop_with_shape(emissions, cw, keep_outside=False)
    outside = crop_with_shape(emissions, cw, keep_outside=True)
    tot = emissions.agg(F.sum("value_kg_y")).collect()[0][0]
    ti = inside.agg(F.sum("value_kg_y")).collect()[0][0]
    to = outside.agg(F.sum("value_kg_y")).collect()[0][0]
    assert ti + to == pytest.approx(tot)
    assert cropped.count() == 9  # 3x3 block of cells with overlap


def test_clip_box(emissions, fine_grid):
    clipped = clip_box(emissions, fine_grid, 0.0, 0.0, 2.0, 2.0)
    assert clipped.count() == 4


def test_weights_poly_poly_triangles(spark, fine_grid):
    """Triangular destination cells (ICON-mesh analogue): two triangles
    splitting the unit square [0,2]x[0,2] diagonally."""
    from emiproc_spark.functions.geometry import wkb_polygon
    from emiproc_spark.operators.regrid import weights_poly_poly

    tri_rows = [
        (0, wkb_polygon([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0)]), 0.0, 0.0, 2.0, 2.0),
        (1, wkb_polygon([(0.0, 0.0), (2.0, 2.0), (0.0, 2.0)]), 0.0, 0.0, 2.0, 2.0),
    ]
    dst = spark.createDataFrame(
        tri_rows,
        schema="cell_id long, geometry binary, xmin double, ymin double, xmax double, ymax double",
    )
    src_rows = [(7, wkb_polygon([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]), 0.0, 0.0, 2.0, 2.0)]
    src = spark.createDataFrame(
        src_rows,
        schema="source_id long, geometry binary, xmin double, ymin double, xmax double, ymax double",
    )
    w = {r["dst_id"]: r["weight"] for r in weights_poly_poly(src, dst, tile=2.0).collect()}
    assert w[0] == pytest.approx(0.5)
    assert w[1] == pytest.approx(0.5)


def test_days_in_year(spark):
    from emiproc_spark.operators.temporal import days_in_year

    df = spark.createDataFrame([(2024,), (2023,), (1900,), (2000,)], "y int")
    out = {r["y"]: r["d"] for r in df.select("y", days_in_year(F.col("y")).alias("d")).collect()}
    assert out == {2024: 366, 2023: 365, 1900: 365, 2000: 366}
