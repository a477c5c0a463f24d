"""Shapefile codec round-trip + regions-table feed into the mask
operators (Natural Earth / timezone ingest path)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from emiproc_spark.functions import geometry as geom
from emiproc_spark.operators.masks import cell_region_fractions, majority_region
from emiproc_spark.sources.shapefile import (
    read_dbf,
    read_shp,
    shapefile_to_regions,
    write_shapefile,
)

SQUARES = [
    # two countries: left half and right-bottom quarter of [0,10]²
    [np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 10.0], [0.0, 10.0]])],
    [np.array([[5.0, 0.0], [10.0, 0.0], [10.0, 5.0], [5.0, 5.0]])],
]
ATTRS = pd.DataFrame({"ISO_A3": ["CHE", "ITA"], "POP": [8.7, 59.1]})


def test_shp_dbf_roundtrip(tmp_path):
    shp, dbf = write_shapefile(str(tmp_path / "ne"), SQUARES, ATTRS)
    shapes = read_shp(open(shp, "rb").read())
    assert len(shapes) == 2
    stype, parts = shapes[0]
    assert stype == 5
    assert np.allclose(parts[0][:4], SQUARES[0][0])
    attrs = read_dbf(open(dbf, "rb").read())
    assert list(attrs["ISO_A3"]) == ["CHE", "ITA"]
    assert attrs["POP"].iloc[1] == pytest.approx(59.1)


def test_shapefile_to_regions(spark, tmp_path):
    write_shapefile(str(tmp_path / "ne"), SQUARES, ATTRS)
    regions = shapefile_to_regions(
        spark, str(tmp_path / "ne.shp"), label_field="ISO_A3"
    )
    pdf = regions.toPandas().set_index("country")
    assert pdf.loc["CHE", "area"] == pytest.approx(50.0)
    assert pdf.loc["ITA", "area"] == pytest.approx(25.0)
    assert pdf.loc["CHE", "xmax"] == 5.0
    gtype, rings = geom.parse_wkb(bytes(pdf.loc["ITA", "geometry"]))
    assert gtype == geom.WKB_POLYGON

    with pytest.raises(ValueError, match="not in .dbf"):
        shapefile_to_regions(spark, str(tmp_path / "ne.shp"), label_field="NOPE")


def test_regions_feed_masks(spark, tmp_path):
    from emiproc_spark.grids import regular_grid

    write_shapefile(str(tmp_path / "ne"), SQUARES, ATTRS)
    regions = shapefile_to_regions(
        spark, str(tmp_path / "ne.shp"), label_field="ISO_A3"
    )
    grid = regular_grid(spark, 0.0, 0.0, 2, 2, 5.0, 5.0, with_geometry=False)
    fr = cell_region_fractions(regions, grid, tile=5.0)
    got = {(r["cell_id"], r["country"]): r["fraction"] for r in fr.collect()}
    # cell 0 = [0,5]² fully CHE; cell 2 = x[5,10] y[0,5] fully ITA;
    # cell 3 = x[5,10] y[5,10] uncovered
    assert got[(0, "CHE")] == pytest.approx(1.0)
    assert got[(2, "ITA")] == pytest.approx(1.0)
    assert (3, "CHE") not in got and (3, "ITA") not in got

    maj = majority_region(fr, grid).toPandas().set_index("cell_id")["country"]
    assert maj[0] == "CHE" and maj[1] == "CHE"
    assert maj[2] == "ITA"
    assert maj[3] == "-99"


def test_get_natural_earth_archive_and_cache_hit(spark, tmp_path):
    """get_natural_earth populates the reference cache layout from a
    pre-downloaded release .zip, and a second call is a pure cache hit
    (the archive is not touched again)."""
    import zipfile

    from emiproc_spark.sources.shapefile import get_natural_earth, get_timezones

    # build a fake Natural-Earth release archive
    shp, dbf = write_shapefile(str(tmp_path / "ne_10m_admin_0_countries"), SQUARES, ATTRS)
    ne_zip = str(tmp_path / "ne.zip")
    with zipfile.ZipFile(ne_zip, "w") as zf:
        zf.write(shp, "ne_10m_admin_0_countries.shp")
        zf.write(dbf, "ne_10m_admin_0_countries.dbf")

    files = str(tmp_path / "files")
    regions = get_natural_earth(spark, files_dir=files, archive=ne_zip)
    assert {r["country"] for r in regions.select("country").collect()} == {"CHE", "ITA"}

    # cache hit: delete the archive; the call must still succeed
    import os

    os.remove(ne_zip)
    again = get_natural_earth(spark, files_dir=files, archive=ne_zip)
    assert again.count() == 2
    # and also with no archive at all (pure cache)
    assert get_natural_earth(spark, files_dir=files).count() == 2

    # cold cache without archive/download: actionable error
    with pytest.raises(FileNotFoundError, match="archive=|download"):
        get_natural_earth(spark, files_dir=str(tmp_path / "empty"))

    # timezones variant: its own layout + label field
    tz_attrs = pd.DataFrame({"tzid": ["Europe/Zurich", "Europe/Rome"]})
    shp2, dbf2 = write_shapefile(str(tmp_path / "combined-shapefile-with-oceans"), SQUARES, tz_attrs)
    tz_zip = str(tmp_path / "tz.zip")
    with zipfile.ZipFile(tz_zip, "w") as zf:
        zf.write(shp2, "combined-shapefile-with-oceans.shp")
        zf.write(dbf2, "combined-shapefile-with-oceans.dbf")
    tz = get_timezones(spark, files_dir=files, archive=tz_zip)
    assert {r["tzid"] for r in tz.select("tzid").collect()} == {
        "Europe/Zurich", "Europe/Rome",
    }
    # warm cache serves even with download=True + latest
    assert get_timezones(spark, files_dir=files, download=True).count() == 2
    with pytest.raises(ValueError, match="release"):
        get_timezones(
            spark, files_dir=str(tmp_path / "cold"), version="latest", download=True
        )
