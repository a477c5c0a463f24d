"""End-to-end NetCDF ingest tests: codec-written files → distributed
scan → long emissions, pinned to the reference's layout semantics
(lon-major stacking, fillna(0), unit conversion, time-mean, per-cell
profile ratios)."""

import numpy as np
import pytest

from emiproc_spark.functions.netcdf3 import NCDataset, NCVariable, write_netcdf
from emiproc_spark.sources.netcdf import (
    SEC_PER_YR,
    from_netcdf_rasters,
    netcdf_regular_grid,
    netcdf_temporal_ratios,
    spherical_cell_areas,
    unit_scaling,
)

LON = np.array([0.5, 1.5, 2.5])
LAT = np.array([45.5, 46.5])


def _raster_nc(path, arr_by_var, units="kg/year/cell", attrs_by_var=None, time=None):
    ds = NCDataset()
    nt = 0 if time is None else len(time)
    any_arr = next(iter(arr_by_var.values()))
    if time is not None:
        ds.dims = {"time": nt, "lat": LAT.size, "lon": LON.size}
    else:
        ds.dims = {"lat": LAT.size, "lon": LON.size}
    ds.variables["lon"] = NCVariable("lon", ("lon",), LON, {"units": "degrees_east"})
    ds.variables["lat"] = NCVariable("lat", ("lat",), LAT, {"units": "degrees_north"})
    if time is not None:
        ds.variables["time"] = NCVariable(
            "time", ("time",), np.asarray(time, dtype=np.int32)
        )
    for name, arr in arr_by_var.items():
        dims = ("time", "lat", "lon") if time is not None else ("lat", "lon")
        at = {"units": units}
        at.update((attrs_by_var or {}).get(name, {}))
        ds.variables[name] = NCVariable(name, dims, arr, at)
    write_netcdf(str(path), ds)
    return str(path)


def test_ingest_lon_major_and_fillna(spark, tmp_path):
    arr = np.array([[1.0, 2.0, np.nan], [4.0, 5.0, 6.0]])  # (lat, lon)
    p = _raster_nc(tmp_path / "a.nc", {"co2_adf": arr})
    out = from_netcdf_rasters(
        spark, p, {"co2_adf": ("adf", "CO2")}
    ).toPandas().set_index("cell_id")
    # cell_id = lon_i * nlat + lat_i ; NaN -> 0 (dropped as zero)
    assert out.loc[0, "value_kg_y"] == 1.0  # lon0,lat0
    assert out.loc[1, "value_kg_y"] == 4.0  # lon0,lat1
    assert out.loc[2, "value_kg_y"] == 2.0  # lon1,lat0
    assert 4 not in out.index  # NaN cell dropped as zero
    assert out.loc[5, "value_kg_y"] == 6.0
    assert set(out["category"]) == {"adf"} and set(out["substance"]) == {"CO2"}


def test_ingest_infers_mapping_from_attrs(spark, tmp_path):
    arr = np.ones((2, 3))
    p = _raster_nc(
        tmp_path / "b.nc",
        {"v1": arr, "v2": 2 * arr},
        attrs_by_var={
            "v1": {"category": "traffic", "substance": "NOx"},
            "v2": {"category": "heating", "substance": "CO2"},
        },
    )
    out = from_netcdf_rasters(spark, p).toPandas()
    assert set(zip(out["category"], out["substance"])) == {
        ("traffic", "NOx"),
        ("heating", "CO2"),
    }
    assert len(out) == 12


def test_unit_conversion_flux_times_area(spark, tmp_path):
    arr = np.full((2, 3), 1e-9)  # kg/m2/s
    p = _raster_nc(tmp_path / "c.nc", {"v": arr}, units="kg/m2/s")
    out = (
        from_netcdf_rasters(spark, p, {"v": ("c", "s")})
        .toPandas()
        .set_index("cell_id")
    )
    areas = spherical_cell_areas(LAT, 1.0, 1.0)
    for lon_i in range(3):
        for lat_i in range(2):
            expected = 1e-9 * areas[lat_i] * SEC_PER_YR
            assert out.loc[lon_i * 2 + lat_i, "value_kg_y"] == pytest.approx(
                expected, rel=1e-12
            )


def test_time_mean_and_ratios(spark, tmp_path):
    t0 = np.array([[1.0, 0.0, 2.0], [0.0, 0.0, 0.0]])
    t1 = np.array([[3.0, 0.0, 2.0], [0.0, 0.0, 0.0]])
    p = _raster_nc(
        tmp_path / "d.nc", {"v": np.stack([t0, t1])}, time=[0, 1]
    )
    inv = (
        from_netcdf_rasters(spark, p, {"v": ("c", "s")})
        .toPandas()
        .set_index("cell_id")
    )
    assert inv.loc[0, "value_kg_y"] == 2.0  # mean(1,3)
    assert inv.loc[4, "value_kg_y"] == 2.0  # mean(2,2) at lon2,lat0
    ratios = (
        netcdf_temporal_ratios(spark, p, {"v": ("c", "s")})
        .toPandas()
        .set_index(["cell_id", "t_index"])["ratio"]
    )
    assert ratios.loc[(0, 0)] == 0.25 and ratios.loc[(0, 1)] == 0.75
    assert ratios.loc[(4, 0)] == 0.5
    # zero-total cells dropped
    assert 1 not in ratios.index.get_level_values(0)


def test_multi_file_sum(spark, tmp_path):
    arr = np.ones((2, 3))
    _raster_nc(tmp_path / "m1.nc", {"v": arr}, attrs_by_var={"v": {"category": "c", "substance": "s"}})
    _raster_nc(tmp_path / "m2.nc", {"v": arr}, attrs_by_var={"v": {"category": "c", "substance": "s"}})
    out = from_netcdf_rasters(spark, str(tmp_path) + "/m*.nc").toPandas()
    assert (out["value_kg_y"] == 2.0).all() and len(out) == 6


def test_grid_table(spark, tmp_path):
    p = _raster_nc(tmp_path / "g.nc", {"v": np.ones((2, 3))})
    g = netcdf_regular_grid(spark, p).toPandas().set_index("cell_id")
    assert len(g) == 6
    assert g.loc[0, "lon"] == 0.5 and g.loc[0, "lat"] == 45.5
    assert g.loc[0, "xmin"] == 0.0 and g.loc[0, "xmax"] == 1.0
    areas = spherical_cell_areas(LAT, 1.0, 1.0)
    assert g.loc[1, "area_m2"] == pytest.approx(areas[1])


def test_unit_scaling_table():
    assert unit_scaling("kg/year/cell") == (1.0, False)
    assert unit_scaling("kg/year/m2") == (1.0, True)
    f, by_area = unit_scaling("kg/m2/s")
    assert by_area and f == pytest.approx(365.25 * 86400)
    f, by_area = unit_scaling("PgC/yr", "CO2")
    assert not by_area and f == pytest.approx(1e12 * 44.009 / 12.01)
    with pytest.raises(ValueError):
        unit_scaling("PgC/yr", "CH4")
    with pytest.raises(NotImplementedError):
        unit_scaling("furlongs/fortnight")


# ----------------------------------------------------------------------
# pluggable container decode (NetCDF-4/HDF5 path)
# ----------------------------------------------------------------------
def test_injected_container_decoder(spark, tmp_path):
    """A custom bytes→NCDataset decoder drives the full scan plumbing
    (binaryFile → mapInPandas → long rows) regardless of container
    format — the generic-ingest mirror of the GFED4 decoder injection."""
    (tmp_path / "fake.bin").write_bytes(b"NOT-A-NETCDF")

    def decoder(content):
        assert content == b"NOT-A-NETCDF"
        ds = NCDataset()
        ds.dims = {"lat": LAT.size, "lon": LON.size}
        ds.variables["lon"] = NCVariable("lon", ("lon",), LON, {})
        ds.variables["lat"] = NCVariable("lat", ("lat",), LAT, {})
        arr = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 7.0]])
        ds.variables["co2_adf"] = NCVariable(
            "co2_adf", ("lat", "lon"), arr, {"units": "kg/year/cell"}
        )
        return ds

    out = from_netcdf_rasters(
        spark, str(tmp_path / "fake.bin"), {"co2_adf": ("adf", "CO2")},
        container_decoder=decoder,
    ).collect()
    got = {(r["cell_id"], r["value_kg_y"]) for r in out}
    # lon-major: cell = lon_i * nlat + lat_i → (0,45.5)=0, (2,46.5)=5
    assert got == {(0, 1.0), (5, 7.0)}


def test_default_decoder_magic_dispatch(tmp_path):
    from emiproc_spark.sources.netcdf import default_container_decoder

    # classic NetCDF-3 bytes decode with the built-in codec
    p = _raster_nc(tmp_path / "c.nc", {"v": np.ones((2, 3))})
    ds = default_container_decoder(open(p, "rb").read())
    assert "v" in ds.variables

    # HDF5 magic without h5py: routed to the built-in minimal codec,
    # which rejects a truncated/bogus container with a clear error
    hdf5_blob = b"\x89HDF\r\n\x1a\n" + b"\x00" * 64
    try:
        import h5py  # noqa: F401
        pytest.skip("h5py present: built-in codec path does not trigger")
    except ImportError:
        pass
    with pytest.raises(Exception, match="superblock|signature|hdf5"):
        default_container_decoder(hdf5_blob)

    with pytest.raises(ValueError, match="unrecognized"):
        default_container_decoder(b"garbage-bytes")


def test_netcdf4_roundtrip_with_h5py(spark, tmp_path):
    """Real-library path: only runs where h5py exists (not in this
    container) — writes a dimension-scaled NetCDF-4-style HDF5 file and
    ingests it through the default decoder."""
    h5py = pytest.importorskip("h5py")
    p = tmp_path / "n4.h5"
    with h5py.File(p, "w") as f:
        f["lon"] = LON
        f["lat"] = LAT
        f["lon"].make_scale("lon")
        f["lat"].make_scale("lat")
        arr = np.array([[1.0, 2.0, 0.0], [0.0, 5.0, 6.0]])
        d = f.create_dataset("co2_adf", data=arr)
        d.dims[0].attach_scale(f["lat"])
        d.dims[1].attach_scale(f["lon"])
        d.attrs["units"] = "kg/year/cell"
    out = from_netcdf_rasters(
        spark, str(p), {"co2_adf": ("adf", "CO2")}
    ).collect()
    assert {(r["cell_id"], r["value_kg_y"]) for r in out} == {
        (0, 1.0), (2, 2.0), (3, 5.0), (5, 6.0)
    }
