"""TNO-layout ingest tests (reference tno.py:146-256 semantics):
area/point split by source_type_code, 1-based index decode, scatter-add
to (lon_i-1)*ny + (lat_i-1), many-to-one substance merge."""

import numpy as np
import pandas as pd
import pytest

from emiproc_spark.sources.tno import (
    scan_tno,
    tno_area_emissions,
    tno_point_sources,
    write_tno_netcdf,
)

NX, NY = 4, 5


@pytest.fixture()
def tno_file(tmp_path):
    sources = pd.DataFrame(
        {
            # two area sources in the SAME cell (scatter-add), one other
            # cell, one point source
            "source_type": ["a", "a", "a", "p"],
            "lon_index": [2, 2, 1, 1],
            "lat_index": [3, 3, 1, 1],
            "lon": [0.0, 0.0, 0.0, 8.5],
            "lat": [0.0, 0.0, 0.0, 47.3],
            "category": ["cat1", "cat1", "cat2", "cat1"],
            "co2_ff": [1.0, 2.0, 5.0, 3.0],
            "co2_bf": [10.0, 20.0, 0.0, 4.0],
        }
    )
    path = str(tmp_path / "tno_minimal.nc")
    write_tno_netcdf(path, sources, NX, NY, ["co2_ff", "co2_bf"])
    return path


def test_scan_decodes_layout(spark, tno_file):
    rows = scan_tno(spark, tno_file, drop_zero=False).toPandas()
    # 4 sources x 2 substance vars
    assert len(rows) == 8
    area = rows[rows["source_type"] == "area"]
    # cell = (lon_i-1)*ny + (lat_i-1): (2,3) -> 7, (1,1) -> 0
    assert set(area["cell_id"]) == {7, 0}
    pt = rows[rows["source_type"] == "point"]
    assert np.allclose(pt[["lon", "lat"]].drop_duplicates(), [[8.5, 47.3]])


def test_area_scatter_add_and_mapping(spark, tno_file):
    out = tno_area_emissions(
        spark, tno_file, substances_mapping={"co2_ff": "CO2", "co2_bf": "CO2"}
    ).toPandas()
    got = {
        (r.cell_id, r.category, r.substance): r.value_kg_y
        for r in out.itertuples()
    }
    assert got[(7, "cat1", "CO2")] == pytest.approx(1 + 2 + 10 + 20)
    assert got[(0, "cat2", "CO2")] == pytest.approx(5.0)
    assert len(got) == 2


def test_area_without_mapping_keeps_file_substances(spark, tno_file):
    out = tno_area_emissions(spark, tno_file).toPandas()
    got = {
        (r.cell_id, r.substance): r.value_kg_y for r in out.itertuples()
    }
    assert got[(7, "co2_ff")] == pytest.approx(3.0)
    assert got[(7, "co2_bf")] == pytest.approx(30.0)
    # zero-valued (0, co2_bf) dropped by drop_zero
    assert (0, "co2_bf") not in got


def test_point_sources(spark, tno_file):
    out = tno_point_sources(
        spark, tno_file, substances_mapping={"co2_ff": "CO2", "co2_bf": "CO2"}
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["lon"], r["lat"]) == (8.5, 47.3)
    assert r["value_kg_y"] == pytest.approx(7.0)
    assert r["category"] == "cat1"


def test_unknown_source_type_raises(spark, tmp_path):
    sources = pd.DataFrame(
        {
            "source_type": ["a"],
            "lon_index": [1],
            "lat_index": [1],
            "lon": [0.0],
            "lat": [0.0],
            "category": ["c"],
            "v": [1.0],
        }
    )
    path = str(tmp_path / "bad.nc")
    write_tno_netcdf(path, sources, 1, 1, ["v"])
    # corrupt the type codes by rewriting with a bogus code
    from emiproc_spark.functions.netcdf3 import read_netcdf, write_netcdf

    ds = read_netcdf(path)
    ds.variables["source_type_code"].data = np.array(
        [[b"x"], [b"p"]], dtype="S1"
    )
    write_netcdf(path, ds)
    with pytest.raises(Exception, match="source_type"):
        scan_tno(spark, path).collect()


def test_substance_mapping_strict_raises_on_absent_key(spark, tno_file):
    import pytest

    from emiproc_spark.sources.tno import tno_area_emissions

    with pytest.raises(ValueError, match="absent from file"):
        tno_area_emissions(
            spark, tno_file, {"co2_ff": "ALL", "co2_typo": "ALL"},
            strict_mapping=True,
        )
    # non-strict: typo'd key silently ignored (scan exposes unmapped)
    out = tno_area_emissions(spark, tno_file, {"co2_ff": "ALL", "co2_typo": "ALL"})
    assert {r["substance"] for r in out.select("substance").distinct().collect()} == {"ALL"}
