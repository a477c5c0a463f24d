"""Degenerate-case geometry rules: boundary-point halving, line-weight
dedup, CRS reconciliation, antimeridian splitting (VERDICT r1 item 8)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from emiproc_spark.functions import crs as crsmod
from emiproc_spark.functions import geometry as geom
from emiproc_spark.grids import regular_grid
from emiproc_spark.operators.regrid import (
    crop_point_sources,
    normalize_antimeridian,
    weights_poly_rect,
)


def test_boundary_point_halving(spark):
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 10.0),   # strictly inside
         (1, 0.0, 1.0, 10.0),   # on the left boundary
         (2, 2.0, 2.0, 10.0),   # on the corner
         (3, -1.0, 1.0, 10.0)], # outside
        "source_id long, x double, y double, value_kg_y double",
    )
    inside = crop_point_sources(pts, 0.0, 0.0, 2.0, 2.0).toPandas().set_index("source_id")
    assert inside.loc[0, "value_kg_y"] == 10.0
    assert inside.loc[1, "value_kg_y"] == 5.0
    assert inside.loc[2, "value_kg_y"] == 5.0
    assert 3 not in inside.index

    outside = crop_point_sources(pts, 0.0, 0.0, 2.0, 2.0, keep_outside=True)
    o = outside.toPandas().set_index("source_id")
    assert 0 not in o.index
    assert o.loc[1, "value_kg_y"] == 5.0  # boundary present on both sides
    assert o.loc[3, "value_kg_y"] == 10.0
    # total mass conserved across the two crops
    total = inside["value_kg_y"].sum() + o["value_kg_y"].sum()
    assert total == pytest.approx(40.0)


def test_line_on_shared_edge_dedup(spark):
    """A line lying exactly on the edge between two cells is counted in
    both; the dedup rule renormalizes so its weights sum to 1."""
    line = geom.wkb_linestring([(0.0, 1.0), (2.0, 1.0)])  # along y=1 edge
    src = spark.createDataFrame(
        [(0, bytearray(line), 0.0, 1.0, 2.0, 1.0)],
        "source_id long, geometry binary, xmin double, ymin double, xmax double, ymax double",
    )
    grid = regular_grid(spark, 0.0, 0.0, 2, 2, 1.0, 1.0, with_geometry=False)
    w = weights_poly_rect(src, grid, tile=1.0).toPandas()
    # the line borders 4 cells (2 below, 2 above), each clipping half its
    # length -> raw sum = 2.0 -> normalized to 1.0
    assert w["weight"].sum() == pytest.approx(1.0)
    assert len(w) == 4
    assert np.allclose(w["weight"], 0.25)


def test_reconcile_crs_contract():
    assert crsmod.reconcile_crs(None, None) is None
    assert crsmod.reconcile_crs("EPSG:4326", "EPSG:4326") is None
    assert crsmod.reconcile_crs("EPSG:4326", None) is None
    with pytest.raises(ValueError, match="no crs"):
        crsmod.reconcile_crs(None, "EPSG:4326")
    t = crsmod.reconcile_crs(crsmod.LV95, crsmod.WGS84)
    assert t is crsmod.wgs84_to_lv95
    with pytest.raises(ValueError, match="No coordinate transform"):
        crsmod.reconcile_crs("EPSG:9999", "EPSG:31287")
    custom = lambda x, y: (x, y)
    assert crsmod.reconcile_crs("EPSG:9999", "EPSG:31287", custom) is custom


def test_lv95_roundtrip_bern():
    # swisstopo reference point: Bern (approx) 7.438632°E 46.951083°N
    # ↔ LV95 E 2600000.xx N 1199999.xx (1 m tolerance of the formulas)
    e, n = crsmod.wgs84_to_lv95(np.array([7.438632]), np.array([46.951083]))
    assert e[0] == pytest.approx(2600000.0, abs=2.0)
    assert n[0] == pytest.approx(1200000.0, abs=2.0)
    lon, lat = crsmod.lv95_to_wgs84(e, n)
    assert lon[0] == pytest.approx(7.438632, abs=1e-4)
    assert lat[0] == pytest.approx(46.951083, abs=1e-4)


def test_transform_geometries(spark):
    shift = lambda x, y: (x + 100.0, y - 50.0)
    df = spark.createDataFrame(
        [(0, bytearray(geom.wkb_polygon([(0, 0), (2, 0), (2, 2), (0, 2)])),
          0.0, 0.0, 2.0, 2.0)],
        "id long, geometry binary, xmin double, ymin double, xmax double, ymax double",
    )
    out = crsmod.transform_geometries(df, shift).toPandas()
    assert out.loc[0, "xmin"] == 100.0 and out.loc[0, "ymax"] == -48.0
    gtype, rings = geom.parse_wkb(bytes(out.loc[0, "geometry"]))
    assert rings[0][:, 0].min() == 100.0


def test_split_antimeridian_ring():
    # triangle straddling the antimeridian: lons 179, -179 (=181), 179
    ring = np.array([[179.0, 0.0], [-179.0, 0.0], [179.0, 2.0]])
    parts = geom.split_antimeridian(ring)
    assert len(parts) == 2
    areas = sorted(geom.shoelace_area(p) for p in parts)
    total = sum(areas)
    assert total == pytest.approx(2.0)  # base 2° × height 2° / 2
    for p in parts:
        assert p[:, 0].min() >= -180.0 - 1e-9
        assert p[:, 0].max() <= 180.0 + 1e-9
    # non-crossing ring passes through untouched
    same = geom.split_antimeridian(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]))
    assert len(same) == 1


def test_normalize_antimeridian_df(spark):
    ring = [(179.0, 0.0), (-179.0, 0.0), (179.0, 2.0)]
    df = spark.createDataFrame(
        [(0, bytearray(geom.wkb_polygon(ring)), 0.0, 0.0, 0.0, 0.0)],
        "cell_id long, geometry binary, xmin double, ymin double, xmax double, ymax double",
    )
    out = normalize_antimeridian(df).toPandas()
    gtype, rings = geom.parse_wkb(bytes(out.loc[0, "geometry"]))
    assert len(rings) == 2
    assert out.loc[0, "xmin"] == pytest.approx(-180.0)
    assert out.loc[0, "xmax"] == pytest.approx(180.0)
    area = sum(geom.shoelace_area(r[:-1]) for r in rings)
    assert area == pytest.approx(2.0)


def test_normalize_antimeridian_passthrough_and_multipolygon(spark):
    """Round-5 review regressions: non-polygons pass through untouched
    (the old code re-headered them as polygons, silently zeroing their
    weights), an uncrossed polygon keeps its exact bytes/bbox, and a
    MULTIPOLYGON input is split part-by-part."""
    pt = geom.wkb_point(-179.5, 10.0)
    ln = geom.wkb_linestring([(178.0, 0.0), (-178.0, 1.0)])
    plain = geom.wkb_polygon([(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)])
    wrap_mp = geom.wkb_multipolygon(
        [np.array([[179.0, 0.0], [-179.0, 0.0], [179.0, 2.0]])]
    )
    rows = [
        (0, bytearray(pt), 7.0, 7.0, 7.0, 7.0),
        (1, bytearray(ln), 1.0, 2.0, 3.0, 4.0),
        (2, bytearray(plain), 0.0, 0.0, 1.0, 1.0),
        (3, bytearray(wrap_mp), 0.0, 0.0, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "cell_id long, geometry binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    out = normalize_antimeridian(df).orderBy("cell_id").toPandas()
    assert bytes(out.loc[0, "geometry"]) == pt        # untouched
    assert out.loc[0, "xmin"] == 7.0                   # bbox untouched
    assert bytes(out.loc[1, "geometry"]) == ln
    assert bytes(out.loc[2, "geometry"]) == plain      # uncrossed: identical
    gtype, rings = geom.parse_wkb(bytes(out.loc[3, "geometry"]))
    assert gtype == geom.WKB_MULTIPOLYGON and len(rings) == 2
    assert out.loc[3, "xmin"] == pytest.approx(-180.0)
    assert out.loc[3, "xmax"] == pytest.approx(180.0)


def test_polygon_hole_subtracts_from_weights(spark):
    """A 4x4 polygon with a 1x1 interior ring has measure 15 and its
    per-cell weights exclude the hole (the old additive-ring behavior
    counted it as 17 and over-weighted the hole's cell)."""
    from emiproc_spark.operators.regrid import weights_poly_rect

    holed = geom.wkb_polygon_rings(
        [
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)],
            [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)],
        ]
    )
    src = spark.createDataFrame(
        [(0, bytearray(holed), 0.0, 0.0, 4.0, 4.0)],
        "source_id long, geometry binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    # 2x2 destination cells of size 2
    dst = spark.createDataFrame(
        [
            (i * 2 + j, 2.0 * i, 2.0 * j, 2.0 * i + 2, 2.0 * j + 2)
            for i in range(2)
            for j in range(2)
        ],
        "cell_id long, xmin double, ymin double, xmax double, ymax double",
    )
    w = {r["dst_id"]: r["weight"] for r in weights_poly_rect(src, dst, tile=2.0).collect()}
    # hole (1..2)x(1..2) sits fully in cell 0: (4-1)/15; others 4/15 each
    assert w[0] == pytest.approx(3.0 / 15.0)
    for c in (1, 2, 3):
        assert w[c] == pytest.approx(4.0 / 15.0)
    assert sum(w.values()) == pytest.approx(1.0)


def test_parse_wkb_rejects_big_endian():
    import struct

    big_endian_point = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 5.0, 6.0)
    with pytest.raises(ValueError, match="big-endian"):
        geom.parse_wkb(big_endian_point)


def test_tile_join_guard_rejects_oversized_bbox(spark):
    """One near-global bbox at a fine tile (e.g. an unsplit wrap ring)
    must fail fast with the offending extent, not OOM the explode; an
    inverted bbox likewise."""
    from emiproc_spark.operators.regrid import weights_poly_rect

    box = geom.wkb_box(-179.0, 0.0, 179.0, 1.0)
    src = spark.createDataFrame(
        [(0, bytearray(box), -179.0, 0.0, 179.0, 1.0)],
        "source_id long, geometry binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    dst = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 1.0)],
        "cell_id long, xmin double, ymin double, xmax double, ymax double",
    )
    with pytest.raises(Exception, match="tile-join guard"):
        weights_poly_rect(src, dst, tile=0.0001).collect()
    inv = spark.createDataFrame(
        [(0, 5.0, 0.0, 1.0, 1.0)],
        "cell_id long, xmin double, ymin double, xmax double, ymax double",
    )
    with pytest.raises(Exception, match="tile-join guard"):
        weights_poly_rect(src.limit(0).unionByName(src), inv, tile=1.0).collect()
