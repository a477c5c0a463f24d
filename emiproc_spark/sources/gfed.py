"""GFED4 fire-emission ingest (reference emiproc/inventories/gfed.py).

GFED4 ships one HDF5 file per year with groups
``/emissions/{month:02}`` holding a ``DM`` raster (kg DM/m²/month),
``…/partitioning`` holding per-category fraction variables
(``DM_<cat>`` / ``C_<cat>``), and ``/ancill/grid_cell_area`` (m²)
(reference GFED4_Inventory, gfed.py:104-200).  The inventory value is

    value(cell, cat) = Σ_month DM · partition_cat · cell_area   [kg/y]

with categories stripped of their ``DM_``/``C_`` prefix
(gfed.py:170-172) and monthly ratios as the temporal profile.

HDF5 is an external container format this environment cannot decode
(no h5py); the *decode* step is therefore pluggable: the default
decoder imports h5py inside the executor task and raises an actionable
ImportError when absent, while :func:`gfed4_month_frames` — the entire
emission/profile algebra — takes plain numpy arrays and is fully
tested.  When h5py exists, the scan is the usual one-task-per-file
``binaryFile`` + ``mapInPandas`` shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MonthData = tuple[int, str, np.ndarray]  # (month 1..12, category, kg/cell raster)


def default_h5_decoder(use_variable: str) -> Callable[[bytes], Iterator[MonthData]]:
    """Decoder reading the real GFED4 HDF5 layout via h5py (executor-
    side import; gated with an actionable error)."""

    def decode(content: bytes) -> Iterator[MonthData]:
        try:
            import h5py
        except ImportError:
            # built-in minimal HDF5 codec fallback (functions/hdf5.py);
            # GFED4's nested groups arrive as "emissions/01/DM"-style
            # prefixed variable names
            from emiproc_spark.functions.hdf5 import read_hdf5

            ds = read_hdf5(content)
            area = np.asarray(
                ds.variables["ancill/grid_cell_area"].data, dtype=np.float64
            )
            for month in range(1, 13):
                dm = np.asarray(
                    ds.variables[f"emissions/{month:02}/DM"].data,
                    dtype=np.float64,
                )
                prefix = f"emissions/{month:02}/partitioning/{use_variable}_"
                for name, v in ds.variables.items():
                    if not name.startswith(prefix):
                        continue
                    cat = name.split("_")[-1]
                    frac = np.asarray(v.data, dtype=np.float64)
                    yield month, cat, np.nan_to_num(dm * frac * area, nan=0.0)
            return
        import io

        with h5py.File(io.BytesIO(content), "r") as f:
            area = np.asarray(f["ancill/grid_cell_area"], dtype=np.float64)
            for month in range(1, 13):
                g = f[f"emissions/{month:02}"]
                dm = np.asarray(g["DM"], dtype=np.float64)
                part = g["partitioning"]
                for name in part:
                    if not name.startswith(use_variable + "_"):
                        continue
                    cat = name.split("_")[-1]
                    frac = np.asarray(part[name], dtype=np.float64)
                    yield month, cat, np.nan_to_num(dm * frac * area, nan=0.0)

    return decode


def gfed4_month_frames(
    months: Iterator[MonthData],
) -> Iterator[pd.DataFrame]:
    """(month, category, kg/cell (lat, lon) raster) → long rows with
    lon-major cell ids (``stack(cell=(lon, lat))``, gfed.py:181-183)."""
    for month, cat, arr in months:
        arr = np.asarray(arr, dtype=np.float64)
        nlat, nlon = arr.shape
        flat = arr.T.reshape(-1)
        nz = np.flatnonzero(flat)
        if nz.size == 0:
            continue
        yield pd.DataFrame(
            {
                "month": np.full(nz.size, month, dtype=np.int32),
                "cell_id": nz.astype(np.int64),
                "category": cat,
                "value_kg": flat[nz],
            }
        )


def gfed4_scan(
    spark: SparkSession,
    path: str,
    use_variable: str = "DM",
    decoder: Callable[[bytes], Iterator[MonthData]] | None = None,
) -> DataFrame:
    """Distributed per-file scan → (month, cell_id, category, value_kg)."""
    if use_variable not in ("C", "DM"):
        raise ValueError("use_variable must be either 'C' or 'DM'")
    decode = decoder or default_h5_decoder(use_variable)
    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                yield from gfed4_month_frames(decode(bytes(content)))

    return files.mapInPandas(
        run, schema="month int, cell_id long, category string, value_kg double"
    )


def gfed4_emissions(
    spark: SparkSession,
    path: str,
    use_variable: str = "DM",
    decoder: Callable[[bytes], Iterator[MonthData]] | None = None,
) -> DataFrame:
    """Annual GFED4 inventory: month-summed kg/y/cell, substance fixed
    to the source variable (gfed.py:190-198)."""
    scan = gfed4_scan(spark, path, use_variable, decoder)
    return scan.groupBy("cell_id", "category").agg(
        F.sum("value_kg").alias("value_kg_y")
    ).withColumn("substance", F.lit(use_variable)).select(
        "cell_id", "category", "substance", "value_kg_y"
    )


def gfed4_monthly_ratios(
    spark: SparkSession,
    path: str,
    use_variable: str = "DM",
    decoder: Callable[[bytes], Iterator[MonthData]] | None = None,
) -> DataFrame:
    """Per-cell monthly profile ratios (the reference builds
    MounthsProfile ratios from the same stack, gfed.py:200-260)."""
    scan = gfed4_scan(spark, path, use_variable, decoder)
    w = Window.partitionBy("cell_id", "category")
    return (
        scan.withColumn("__tot", F.sum("value_kg").over(w))
        .where(F.col("__tot") != 0.0)
        .select(
            "cell_id",
            "category",
            (F.col("month") - 1).alias("pos"),
            (F.col("value_kg") / F.col("__tot")).alias("ratio"),
        )
    )


# ======================================================================
# GFED5 — NetCDF-3-decodable daily files, one per month
# (reference GFED5, gfed.py:308-372)
# ======================================================================
def gfed5_emissions(
    spark: SparkSession,
    path: str,
    substances: list[str],
    lon_name: str = "lon",
    lat_name: str = "lat",
    time_name: str = "time",
    category: str = "gfed",
) -> DataFrame:
    """GFED5 daily NetCDF files → annual kg/cell inventory: per
    substance variable, sum over the days × 1e-3 × spherical cell area
    (reference gfed.py:355-364); category fixed to ``gfed``.

    Unlike GFED4 this format is classic NetCDF — the pure-numpy codec
    decodes it without external dependencies."""
    from emiproc_spark.sources.netcdf import _centers_to_edges, spherical_cell_areas

    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from emiproc_spark.functions.netcdf3 import read_netcdf

        for pdf in batches:
            for content in pdf["content"]:
                ds = read_netcdf(bytes(content))
                lat_c = np.asarray(ds.variables[lat_name].data, dtype=np.float64)
                lon_c = np.asarray(ds.variables[lon_name].data, dtype=np.float64)
                _, dlat = _centers_to_edges(lat_c)
                _, dlon = _centers_to_edges(lon_c)
                areas = spherical_cell_areas(lat_c, abs(dlon), abs(dlat))
                for sub in substances:
                    if sub not in ds.variables:
                        raise ValueError(f"Substance {sub} not in the dataset.")
                    v = ds.variables[sub]
                    arr = np.asarray(v.data, dtype=np.float64)
                    dims = list(v.dims)
                    order = [d for d in (time_name, lat_name, lon_name) if d in dims]
                    arr = np.transpose(arr, [dims.index(d) for d in order])
                    if time_name not in dims:
                        arr = arr[np.newaxis, ...]
                    arr = np.nan_to_num(arr, nan=0.0)
                    total = arr.sum(axis=0) * 1e-3 * areas[:, np.newaxis]
                    flat = total.T.reshape(-1)
                    nz = np.flatnonzero(flat)
                    if nz.size:
                        yield pd.DataFrame(
                            {
                                "cell_id": nz.astype(np.int64),
                                "category": category,
                                "substance": sub,
                                "value_kg_y": flat[nz],
                            }
                        )

    scan = files.mapInPandas(
        run, schema="cell_id long, category string, substance string, value_kg_y double"
    )
    # monthly files mosaic by summation
    return scan.groupBy("cell_id", "category", "substance").agg(
        F.sum("value_kg_y").alias("value_kg_y")
    )
