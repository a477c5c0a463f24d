"""Round-trip and spec-invariant tests for the pure-numpy NetCDF-3 codec."""

import struct

import numpy as np
import pytest

from emiproc_spark.functions.netcdf3 import (
    NCDataset,
    NCVariable,
    read_netcdf,
    write_netcdf,
)


def _mk(dims, variables, attrs=None, record_dim=None):
    ds = NCDataset()
    ds.dims = dict(dims)
    ds.attrs = dict(attrs or {})
    ds.record_dim = record_dim
    for v in variables:
        ds.variables[v.name] = v
    return ds


def test_roundtrip_fixed_vars(tmp_path):
    rng = np.random.default_rng(7)
    lon = np.linspace(-180, 180, 12).astype(np.float64)
    lat = np.linspace(-90, 90, 6).astype(np.float64)
    emi = rng.random((6, 12)).astype(np.float32)
    counts = rng.integers(0, 1000, (6, 12)).astype(np.int32)
    ds = _mk(
        {"lat": 6, "lon": 12},
        [
            NCVariable("lon", ("lon",), lon, {"units": "degrees_east"}),
            NCVariable("lat", ("lat",), lat, {"units": "degrees_north"}),
            NCVariable(
                "co2", ("lat", "lon"), emi, {"units": "kg m-2 s-1", "scale": 2.5}
            ),
            NCVariable("n", ("lat", "lon"), counts),
        ],
        attrs={"title": "fixture", "Conventions": "CF-1.8", "version": 3},
    )
    p = str(tmp_path / "fixed.nc")
    write_netcdf(p, ds)
    back = read_netcdf(p)
    assert back.dims == {"lat": 6, "lon": 12}
    assert back.attrs["title"] == "fixture"
    assert back.attrs["version"] == 3
    np.testing.assert_array_equal(back.variables["lon"].data, lon)
    np.testing.assert_array_equal(back.variables["co2"].data, emi)
    np.testing.assert_array_equal(back.variables["n"].data, counts)
    assert back.variables["co2"].attrs["units"] == "kg m-2 s-1"
    assert back.variables["co2"].attrs["scale"] == 2.5
    assert back.variables["co2"].dims == ("lat", "lon")


def test_roundtrip_record_vars_single_and_multi(tmp_path):
    # spec special case: exactly ONE record variable is NOT padded per
    # record; two or more are each padded to 4 bytes
    for nvars in (1, 2):
        hourly = np.arange(24 * 3, dtype=np.float32).reshape(24, 3)
        variables = [NCVariable("a", ("time", "cell"), hourly)]
        if nvars == 2:
            variables.append(
                NCVariable("t", ("time",), np.arange(24, dtype=np.int16))
            )
        ds = _mk({"time": 0, "cell": 3}, variables, record_dim="time")
        blob = write_netcdf(None, ds)
        back = read_netcdf(blob)
        assert back.dims["time"] == 24
        np.testing.assert_array_equal(back.variables["a"].data, hourly)
        if nvars == 2:
            np.testing.assert_array_equal(
                back.variables["t"].data, np.arange(24, dtype=np.int16)
            )


def test_roundtrip_char_and_scalar(tmp_path):
    names = np.array([list(b"ABC_"), list(b"DE__")], dtype="S1").reshape(2, 4)
    ds = _mk(
        {"n": 2, "strlen": 4},
        [
            NCVariable("name", ("n", "strlen"), names),
            NCVariable("answer", (), np.float64(42.0)),
        ],
    )
    back = read_netcdf(write_netcdf(None, ds))
    np.testing.assert_array_equal(back.variables["name"].data, names)
    assert back.variables["answer"].data == 42.0


def test_spec_invariants():
    """Byte-level checks straight from the classic format spec."""
    ds = _mk(
        {"x": 2},
        [NCVariable("v", ("x",), np.array([1.0, 2.0], dtype=np.float32))],
    )
    blob = write_netcdf(None, ds)
    assert blob[:4] == b"CDF\x01"
    assert struct.unpack(">I", blob[4:8])[0] == 0  # numrecs
    assert blob[8:12] == b"\x00\x00\x00\x0a"  # NC_DIMENSION tag
    # data is big-endian IEEE754 at the very end
    assert struct.unpack(">2f", blob[-8:]) == (1.0, 2.0)
    # 4-byte alignment everywhere
    assert len(blob) % 4 == 0


def test_rejects_hdf5_and_garbage(tmp_path):
    with pytest.raises(ValueError, match="HDF5"):
        read_netcdf(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_netcdf(b"not-a-netcdf-file")


def test_unaligned_short_var_padding():
    # 3 int16 values = 6 bytes -> padded to 8; following var must align
    ds = _mk(
        {"k": 3},
        [
            NCVariable("s", ("k",), np.array([1, -2, 3], dtype=np.int16)),
            NCVariable("d", ("k",), np.array([1.5, 2.5, 3.5], dtype=np.float64)),
        ],
    )
    back = read_netcdf(write_netcdf(None, ds))
    np.testing.assert_array_equal(back.variables["s"].data, [1, -2, 3])
    np.testing.assert_array_equal(back.variables["d"].data, [1.5, 2.5, 3.5])
