"""Property-based round-trip of the minimal HDF5 writer/reader
(functions/hdf5_write.py ↔ functions/hdf5.py): random dataset shapes,
dtypes, and attributes survive the OLD-layout serialization bit-exact."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.functions.hdf5 import read_hdf5
from emiproc_spark.functions.hdf5_write import write_netcdf4
from emiproc_spark.functions.netcdf3 import NCDataset, NCVariable

dim_name = st.sampled_from(["lat", "lon", "time", "level", "cell"])
dtype = st.sampled_from(["<f8", "<f4", "<i8", "<i4", "<i2", "<u1"])


@st.composite
def datasets(draw):
    names = draw(
        st.lists(dim_name, min_size=1, max_size=3, unique=True)
    )
    dims = {n: draw(st.integers(1, 6)) for n in names}
    n_vars = draw(st.integers(1, 4))
    variables = {}
    for i in range(n_vars):
        vdims = tuple(
            draw(st.lists(st.sampled_from(names), min_size=0, max_size=2))
        )
        shape = tuple(dims[d] for d in vdims)
        dt = np.dtype(draw(dtype))
        rng = np.random.default_rng(draw(st.integers(0, 2**31)))
        if dt.kind == "f":
            data = rng.standard_normal(shape).astype(dt)
        else:
            info = np.iinfo(dt)
            data = rng.integers(info.min, info.max, size=shape).astype(dt)
        attrs = {}
        if draw(st.booleans()):
            attrs["units"] = draw(st.sampled_from(["kg", "m", "s-1"]))
        if draw(st.booleans()):
            attrs["scale"] = draw(
                st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)
            )
        variables[f"v{i}"] = NCVariable(f"v{i}", vdims, data, attrs)
    return NCDataset(dims=dims, attrs={"title": "prop"}, variables=variables)


@given(datasets())
@settings(max_examples=60, deadline=None)
def test_hdf5_roundtrip_bit_exact(ds):
    back = read_hdf5(write_netcdf4(None, ds))
    assert back.dims == ds.dims
    assert back.attrs["title"] == "prop"
    for name, var in ds.variables.items():
        got = back.variables[name]
        assert got.dims == tuple(var.dims)
        a, b = np.asarray(var.data), np.asarray(got.data)
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.array_equal(a, b)
        for k, v in var.attrs.items():
            if isinstance(v, float):
                assert got.attrs[k] == v
            else:
                assert got.attrs[k] == v
