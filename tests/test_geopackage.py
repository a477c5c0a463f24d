"""GeoPackage round-trip via stdlib sqlite3: export → list → read →
MapLuft-style unpivot with line→polygon buffering."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from emiproc_spark.functions import geometry as geom
from emiproc_spark.sources.geopackage import (
    buffer_line,
    export_to_geopackage,
    from_geopackage,
    gpkg_to_wkb,
    list_layers,
    read_gpkg_layer,
    wkb_to_gpkg,
)


def test_gpkg_header_roundtrip():
    wkb = geom.wkb_point(7.5, 46.5)
    blob = wkb_to_gpkg(wkb, srs_id=4326)
    assert blob[:2] == b"GP"
    assert gpkg_to_wkb(blob) == wkb
    with pytest.raises(ValueError):
        gpkg_to_wkb(b"XX" + blob[2:])


def test_buffer_line_single_segment_rectangle():
    ring = buffer_line(np.array([[0.0, 0.0], [10.0, 0.0]]), width=2.0)
    # square caps extend 2 beyond each end; area = (10+4) × 4
    assert geom.shoelace_area(ring) == pytest.approx(14 * 4)
    assert ring[:, 0].min() == pytest.approx(-2.0)
    assert ring[:, 0].max() == pytest.approx(12.0)
    assert ring[:, 1].min() == pytest.approx(-2.0)
    assert ring[:, 1].max() == pytest.approx(2.0)


def test_buffer_line_right_angle_miter():
    ring = buffer_line(
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]), width=1.0
    )
    # right-angle miter: outer corner reaches (11, -1)
    assert any(np.allclose(p, [11.0, -1.0]) for p in ring)
    # area: two 10-long arms + caps, minus the shared corner overlap
    # = exact offset-polygon area (20+2+2 centerline, width 2) → compare
    # against the even-odd shoelace of the constructed outline ≥ arms
    assert geom.shoelace_area(ring) > 40.0


def _write_sample_gpkg(spark, path):
    rows = [
        (geom.wkb_point(float(i), float(i % 3)), f"s{i}", float(i) * 1.5, i)
        for i in range(37)
    ]
    df = spark.createDataFrame(
        rows, "geometry binary, name string, co2 double, rank long"
    )
    export_to_geopackage({"points_layer": df}, path)
    return df


def test_gpkg_export_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "inv.gpkg")
    df = _write_sample_gpkg(spark, p)
    assert list_layers(p) == ["points_layer"]

    back = read_gpkg_layer(spark, p, "points_layer", num_partitions=4)
    got = back.orderBy("rank").toPandas()
    want = df.orderBy("rank").toPandas()
    assert len(got) == 37
    assert list(got["name"]) == list(want["name"])
    assert np.allclose(got["co2"], want["co2"])
    assert bytes(got["geometry"].iloc[5]) == bytes(want["geometry"].iloc[5])
    # fid column surfaced from sqlite
    assert "fid" in got.columns

    import sqlite3

    con = sqlite3.connect(p)
    cont = con.execute(
        "SELECT table_name, data_type, min_x, max_x FROM gpkg_contents"
    ).fetchone()
    con.close()
    assert cont[0] == "points_layer" and cont[1] == "features"
    assert cont[2] == 0.0 and cont[3] == 36.0


def test_from_geopackage_mapluft_layout(spark, tmp_path):
    p = str(tmp_path / "mapluft.gpkg")
    line = geom.wkb_linestring([(0.0, 0.0), (100.0, 0.0)])
    poly = geom.wkb_polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    traffic = spark.createDataFrame(
        [(line, 100.0, 5.0, 2.5), (line, 100.0, 1.0, None)],
        "geometry binary, Shape_Length double, Emission_CO2 double, Emission_Benzol double",
    )
    industry = spark.createDataFrame(
        [(poly, 9.0)], "geometry binary, Emission_NOx double"
    )
    no_emis = spark.createDataFrame([(poly, 1.0)], "geometry binary, other double")
    export_to_geopackage(
        {"c1_traffic": traffic, "c2_industry": industry, "c3_misc": no_emis}, p
    )

    out = from_geopackage(spark, p).toPandas()
    # c3_misc skipped (no Emission_*); benzene renamed; null emission dropped
    assert set(out["category"]) == {"c1_traffic", "c2_industry"}
    assert set(out["substance"]) == {"CO2", "benzene", "NOx"}
    assert len(out[out["substance"] == "benzene"]) == 1
    # traffic lines buffered to polygons (Shape_Length marker present)
    tgeom = out[out["category"] == "c1_traffic"]["geometry"].iloc[0]
    gtype, rings = geom.parse_wkb(bytes(tgeom))
    assert gtype == geom.WKB_POLYGON
    assert geom.shoelace_area(rings[0]) == pytest.approx(120 * 20)  # w=10 square caps
    # polygons pass through untouched
    igeom = out[out["category"] == "c2_industry"]["geometry"].iloc[0]
    assert bytes(igeom) == poly

    sub = from_geopackage(spark, p, substances=["NOx"]).toPandas()
    assert set(sub["substance"]) == {"NOx"}


def test_from_geopackage_substance_filter_skips_layer(spark, tmp_path):
    p = str(tmp_path / "one.gpkg")
    poly = geom.wkb_polygon([(0, 0), (1, 0), (1, 1), (0, 1)])
    layer = spark.createDataFrame([(poly, 3.0)], "geometry binary, Emission_SO2 double")
    export_to_geopackage({"cat": layer}, p)
    with pytest.raises(ValueError, match="no layers"):
        from_geopackage(spark, p, substances=["CO2"])
