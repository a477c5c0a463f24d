"""Distributed NetCDF raster ingest (reference NetcdfRaster,
emiproc/inventories/netcdf_raster.py:112-295).

Layout semantics mirrored from the reference:

- each mapped variable is one (category, substance) slab on a regular
  lon/lat grid; ``variable_to_catsub`` may be explicit or inferred from
  per-variable ``category``/``substance`` attributes
  (netcdf_raster.py:53-110);
- cells are stacked **lon-major** (xarray ``stack(cell=(lon, lat))``,
  netcdf_raster.py:228): ``cell_id = lon_index * nlat + lat_index``;
- NaNs become 0.0 (``fillna(0.0)``, netcdf_raster.py:233);
- units convert to kg/year/cell at the edge via the reference's factor
  table (utils/units.py:11-45), multiplying by spherical cell area
  where the unit is per-m²;
- a time dimension is averaged per cell for the inventory value
  (``_array_to_series``, netcdf_raster.py:37-49), or kept to build
  per-cell temporal-profile ratios (netcdf_raster.py:236-247).

Spark plan: ``binaryFile`` datasource → one file per task →
``mapInPandas`` decoding with the pure-numpy NetCDF-3 codec
(functions/netcdf3.py) and emitting vectorized long-form batches.  At
100 TB the input is many NetCDF files; per-file tasks parallelize the
scan with zero driver involvement, and the decode is numpy-vectorized
(no per-cell Python loop).  Time-mean / ratio math stays in Spark
(groupBy / window) rather than numpy so partial aggregation and AQE
apply when files are many.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

R_EARTH = 6371000.0  # m — reference emiproc/grids.py:30
DAY_PER_YR = 365.25
SEC_PER_DAY = 86400.0
SEC_PER_YR = DAY_PER_YR * SEC_PER_DAY

# reference emiproc/utils/constants.py MOLAR_MASSES_
MOLAR_MASSES = {"CH4": 16.04, "CO2": 44.009, "N2O": 44.013, "C": 12.01}


def unit_scaling(unit: str, substance: str | None = None) -> tuple[float, bool]:
    """(scaling factor, multiply_by_area) to reach kg/year/cell —
    reference get_scaling_factor_to_emiproc, utils/units.py:11-45."""
    if unit == "kg/m2/s":
        return SEC_PER_YR, True
    if unit == "kg/year/m2":
        return 1.0, True
    if unit in ("kg/y/cell", "kg y-1 cell-1", "kg/year/cell", "kg year-1 cell-1"):
        return 1.0, False
    if unit in ("kg m-2 s-1",):  # CF spelling written by the exporter
        return SEC_PER_YR, True
    if unit == "PgC/yr":
        if substance != "CO2":
            raise ValueError("PgC/yr unit can only be used for CO2 substance.")
        return 1e12 * (MOLAR_MASSES["CO2"] / MOLAR_MASSES["C"]), False
    if unit == "micromol/m2/s":
        if substance not in MOLAR_MASSES:
            raise ValueError(f"unknown molar mass for substance {substance!r}")
        return 1e-3 * MOLAR_MASSES[substance] * 1e-6 * SEC_PER_YR, True
    raise NotImplementedError(f"Unit {unit!r} not supported")


def spherical_cell_areas(lat_centers: np.ndarray, dlon_deg: float, dlat_deg: float) -> np.ndarray:
    """Cell areas (m²) per latitude row on a regular lon/lat grid:
    ``R² · Δλ · |sin φ_top − sin φ_bot|`` (the lat/lon-grid area rule the
    reference applies, grids.py:791-803)."""
    lat_top = np.deg2rad(lat_centers + dlat_deg / 2.0)
    lat_bot = np.deg2rad(lat_centers - dlat_deg / 2.0)
    return R_EARTH * R_EARTH * np.deg2rad(dlon_deg) * np.abs(np.sin(lat_top) - np.sin(lat_bot))


def _centers_to_edges(centers: np.ndarray) -> tuple[float, float]:
    """(origin_min, step) from equally spaced centers — reference
    RegularGrid.from_centers, grids.py:429-480 (raises when uneven)."""
    centers = np.asarray(centers, dtype=np.float64)
    if centers.size == 1:
        raise ValueError("cannot infer cell size from a single center")
    steps = np.diff(centers)
    step = float(steps[0])
    if not np.allclose(steps, step):
        raise ValueError("The centers are not equally spaced.")
    return float(centers[0] - step / 2.0), step


def _resolve_mapping(ds, var_to_catsub, lon_name, lat_name):
    """Explicit mapping, else infer from substance/category attrs — the
    reference's _read_variable_to_catsub_mapping (netcdf_raster.py:53-110).
    Classic files carry a category *dimension* + char label variable in
    place of an xarray coord; both spellings are handled."""
    if var_to_catsub is not None:
        return [(v, cat, sub) for v, (cat, sub) in var_to_catsub.items()]
    out = []
    for name, v in ds.variables.items():
        if lon_name not in v.dims or lat_name not in v.dims:
            continue
        sub = v.attrs.get("substance")
        cat = v.attrs.get("category")
        if sub and cat:
            out.append((name, cat, sub))
        elif "category" in v.dims and "category" in ds.variables:
            labels = _char_labels(ds.variables["category"].data)
            for cat in labels:
                out.append((name, cat, sub or name))
    if not out:
        raise ValueError(
            "variable_to_catsub is None and could not be inferred: need "
            "variables with lon/lat dims and category+substance attributes"
        )
    return out


def _char_labels(arr: np.ndarray) -> list[str]:
    arr = np.asarray(arr)
    if arr.ndim == 1:
        return [b"".join(arr).decode().rstrip("\x00 ")]
    return [b"".join(row).decode().rstrip("\x00 ") for row in arr]


SCAN_SCHEMA = (
    "file string, t_index int, cell_id long, category string, "
    "substance string, value_kg_y double"
)

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def read_netcdf4_bytes(content: bytes):
    """NetCDF-4/HDF5 container → in-memory :class:`NCDataset` via h5py
    (executor-side import, gated with an actionable error — the same
    pluggable-decode pattern as sources/gfed.py:35).

    Root-level datasets become variables; dimension names resolve from
    attached HDF5 dimension scales (how the netCDF-4 library stores
    them), falling back to ``phony_dim_<axis>``.  Dimension-scale
    coordinate variables (lon/lat/time vectors) are kept as variables
    too, which is all the generic raster ingest needs.  Reference reads
    both container formats through xarray (netcdf_raster.py:112-295).
    """
    try:
        import h5py
    except ImportError:
        # no h5py: the built-in minimal pure-numpy HDF5 codec handles
        # the subset netcdf-c writes for ordinary data files
        # (functions/hdf5.py); it raises an actionable HDF5Error naming
        # h5py for the exotic features it does not cover
        from emiproc_spark.functions.hdf5 import read_hdf5

        ds = read_hdf5(content)
        for v in ds.variables.values():
            fill = v.attrs.get("_FillValue")
            if fill is not None and getattr(v.data, "dtype", None) is not None:
                if v.data.dtype.kind == "f":
                    fv = fill[0] if isinstance(fill, (list, np.ndarray)) else fill
                    v.data = np.where(v.data == fv, np.nan, v.data)
        return ds
    import io

    from emiproc_spark.functions.netcdf3 import NCDataset, NCVariable

    ds = NCDataset()
    with h5py.File(io.BytesIO(content), "r") as f:
        ds.attrs = {
            k: (v.decode() if isinstance(v, bytes) else v)
            for k, v in f.attrs.items()
        }
        for name, d in f.items():
            if not isinstance(d, h5py.Dataset):
                continue  # generic raster layout is flat (no groups)
            dims = []
            for axis in range(d.ndim):
                scales = list(d.dims[axis])
                if scales:
                    dims.append(scales[0].name.lstrip("/"))
                elif d.attrs.get("CLASS") == b"DIMENSION_SCALE":
                    dims.append(name)
                else:
                    dims.append(f"phony_dim_{axis}")
            data = np.asarray(d)
            attrs = {}
            for k, v in d.attrs.items():
                if k in ("DIMENSION_LIST", "CLASS", "NAME", "REFERENCE_LIST",
                         "_Netcdf4Dimid", "_Netcdf4Coordinates"):
                    continue
                if isinstance(v, bytes):
                    v = v.decode()
                elif isinstance(v, np.ndarray) and v.size == 1:
                    v = v.item()
                attrs[k] = v
            fill = attrs.get("_FillValue")
            if fill is not None and data.dtype.kind == "f":
                data = np.where(data == fill, np.nan, data)
            ds.variables[name] = NCVariable(name, tuple(dims), data, attrs)
            for dim, size in zip(dims, d.shape):
                ds.dims.setdefault(dim, size)
    return ds


def default_container_decoder(content: bytes):
    """Sniff the container magic: classic NetCDF-3 decodes with the
    pure-numpy codec; HDF5 (NetCDF-4) routes through
    :func:`read_netcdf4_bytes`."""
    from emiproc_spark.functions.netcdf3 import read_netcdf

    if content[:3] == b"CDF":
        return read_netcdf(content)
    if content[: len(_HDF5_MAGIC)] == _HDF5_MAGIC:
        return read_netcdf4_bytes(content)
    raise ValueError(
        "unrecognized NetCDF container (neither classic CDF magic nor "
        "HDF5 signature)"
    )


def scan_netcdf(
    spark: SparkSession,
    path: str,
    var_to_catsub: dict[str, tuple[str, str]] | None = None,
    lon_name: str = "lon",
    lat_name: str = "lat",
    time_name: str = "time",
    unit: str | None = None,
    drop_zero: bool = True,
    container_decoder=None,
) -> DataFrame:
    """Raw distributed scan: one row per (file, t, cell, category,
    substance) with values converted to kg/year/cell.  Files without a
    time dimension emit ``t_index = 0``.

    ``container_decoder``: bytes → NCDataset-like (``dims`` dict +
    ``variables`` of (dims, data, attrs)).  Defaults to magic-byte
    dispatch between the built-in NetCDF-3 codec and the h5py-gated
    NetCDF-4 reader; inject a custom decoder for exotic containers.

    Building block for :func:`from_netcdf_rasters` (time-mean inventory)
    and :func:`netcdf_temporal_ratios` (per-cell profile ratios).
    """
    decoder = container_decoder or default_container_decoder

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                ds = decoder(bytes(content))
                nlat = ds.dims[lat_name]
                nlon = ds.dims[lon_name]
                for var, cat, sub in _resolve_mapping(
                    ds, var_to_catsub, lon_name, lat_name
                ):
                    v = ds.variables[var]
                    arr = np.asarray(v.data, dtype=np.float64)
                    dims = list(v.dims)
                    # select the category slab when a category dim exists
                    if "category" in dims and "category" in ds.variables:
                        labels = _char_labels(ds.variables["category"].data)
                        sel = labels.index(cat)
                        arr = np.take(arr, sel, axis=dims.index("category"))
                        dims.remove("category")
                    # normalize axis order to (time?, lat, lon)
                    order = [d for d in (time_name, lat_name, lon_name) if d in dims]
                    if set(dims) != set(order):
                        raise ValueError(f"unexpected dims {dims} on {var}")
                    arr = np.transpose(arr, [dims.index(d) for d in order])
                    if time_name not in dims:
                        arr = arr[np.newaxis, ...]
                    nt = arr.shape[0]
                    arr = np.nan_to_num(arr, nan=0.0)

                    this_unit = unit or v.attrs.get("units")
                    if this_unit is None:
                        raise ValueError(f"no unit for variable {var!r}")
                    factor, by_area = unit_scaling(this_unit, sub)
                    if by_area:
                        lat_c = np.asarray(
                            ds.variables[lat_name].data, dtype=np.float64
                        )
                        lon_c = np.asarray(
                            ds.variables[lon_name].data, dtype=np.float64
                        )
                        _, dlat = _centers_to_edges(lat_c)
                        _, dlon = _centers_to_edges(lon_c)
                        areas = spherical_cell_areas(lat_c, dlon, abs(dlat))
                        arr = arr * areas[np.newaxis, :, np.newaxis]
                    arr = arr * factor

                    # lon-major stacking: cell_id = lon_i * nlat + lat_i
                    # (xarray stack(cell=(lon, lat)), netcdf_raster.py:228)
                    flat = np.transpose(arr, (0, 2, 1)).reshape(nt, nlon * nlat)
                    cell = np.tile(np.arange(nlon * nlat, dtype=np.int64), nt)
                    t_idx = np.repeat(np.arange(nt, dtype=np.int32), nlon * nlat)
                    vals = flat.reshape(-1)
                    if drop_zero:
                        nz = vals != 0.0
                        cell, t_idx, vals = cell[nz], t_idx[nz], vals[nz]
                    yield pd.DataFrame(
                        {
                            "file": fpath,
                            "t_index": t_idx,
                            "cell_id": cell,
                            "category": cat,
                            "substance": sub,
                            "value_kg_y": vals,
                        }
                    )

    return files.mapInPandas(decode, schema=SCAN_SCHEMA)


def from_netcdf_rasters(
    spark: SparkSession,
    path: str,
    var_to_catsub: dict[str, tuple[str, str]] | None = None,
    lon_name: str = "lon",
    lat_name: str = "lat",
    time_name: str = "time",
    unit: str | None = None,
    container_decoder=None,
) -> DataFrame:
    """NetCDF raster(s) → canonical long emissions
    ``(cell_id, category, substance, value_kg_y)``.

    Multiple time steps average per cell (reference _array_to_series,
    netcdf_raster.py:37-49); multiple files sum (mosaic ingest).  The
    aggregation runs in Spark (map-side partial agg), not in the
    decoder, so many-file scans combine without a driver hop.
    """
    scan = scan_netcdf(
        spark, path, var_to_catsub, lon_name, lat_name, time_name, unit,
        drop_zero=True, container_decoder=container_decoder,
    )
    per_file = scan.groupBy("file", "cell_id", "category", "substance").agg(
        F.sum("value_kg_y").alias("v_sum"),
        F.max("t_index").alias("t_max"),
    )
    # mean over the time dim = sum / n_steps (zero rows were dropped, so
    # divide by the file's step count, not the row count)
    return (
        per_file.withColumn("value_kg_y", F.col("v_sum") / (F.col("t_max") + 1))
        .groupBy("cell_id", "category", "substance")
        .agg(F.sum("value_kg_y").alias("value_kg_y"))
    )


def netcdf_temporal_ratios(
    spark: SparkSession,
    path: str,
    var_to_catsub: dict[str, tuple[str, str]] | None = None,
    lon_name: str = "lon",
    lat_name: str = "lat",
    time_name: str = "time",
    unit: str | None = None,
    container_decoder=None,
) -> DataFrame:
    """Per-cell temporal-profile ratios from a time-resolved raster:
    ``ratio = value_t / Σ_t value`` per (cell, category, substance),
    zero-total cells dropped (reference netcdf_raster.py:236-247,
    mask_zero + normalize in float64)."""
    scan = scan_netcdf(
        spark, path, var_to_catsub, lon_name, lat_name, time_name, unit,
        drop_zero=False, container_decoder=container_decoder,
    )
    w = Window.partitionBy("file", "cell_id", "category", "substance")
    return (
        scan.withColumn("__tot", F.sum("value_kg_y").over(w))
        .where(F.col("__tot") != 0.0)
        .select(
            "cell_id",
            "category",
            "substance",
            "t_index",
            (F.col("value_kg_y") / F.col("__tot")).alias("ratio"),
        )
    )


def netcdf_regular_grid(
    spark: SparkSession,
    path: str,
    lon_name: str = "lon",
    lat_name: str = "lat",
) -> DataFrame:
    """Grid table (cell_id, lon, lat, xmin..ymax, area_m2) from one
    file's coordinate variables — RegularGrid.from_centers semantics
    (reference grids.py:429-480).  Dimension-scale driver-side read:
    coordinates are tiny; the data variables are never touched here."""
    from emiproc_spark.functions.netcdf3 import read_netcdf

    ds = read_netcdf(path)
    lon_c = np.asarray(ds.variables[lon_name].data, dtype=np.float64)
    lat_c = np.asarray(ds.variables[lat_name].data, dtype=np.float64)
    _, dlon = _centers_to_edges(lon_c)
    _, dlat = _centers_to_edges(lat_c)
    areas = spherical_cell_areas(lat_c, abs(dlon), abs(dlat))
    nlat = lat_c.size
    rows = pd.DataFrame(
        {
            "cell_id": np.arange(lon_c.size * nlat, dtype=np.int64),
            "lon": np.repeat(lon_c, nlat),
            "lat": np.tile(lat_c, lon_c.size),
            "area_m2": np.tile(areas, lon_c.size),
        }
    )
    rows["xmin"] = rows["lon"] - dlon / 2.0
    rows["xmax"] = rows["lon"] + dlon / 2.0
    rows["ymin"] = rows["lat"] - dlat / 2.0
    rows["ymax"] = rows["lat"] + dlat / 2.0
    return spark.createDataFrame(rows)
