"""Fluxie export (reference emiproc/exports/fluxie.py:24-199).

Writes ``<out>/<transport_model>/<sub>/<model>_<sub>_<freq>.nc`` per
substance, the layout the fluxie plotting tool reads:

- coords: ``longitude`` / ``latitude`` (CF attrs), ``country``;
- ``country_fraction (country, latitude, longitude)``;
- ``flux_total_prior (time, latitude, longitude)`` — category-summed
  emissions ÷ cell area, kg m⁻² yr⁻¹, one time step per inventory year
  (stamped June 1 like the reference, fluxie.py:151-153);
- ``country_flux_total_prior (time, country)`` = Σ_cells flux·fraction.

Spark shape: the category sum and flux conversion are distributed; the
per-substance dense rasters are the single-node file boundary.  Only
the yearly frequency is implemented — the reference's monthly path runs
through ``get_temporally_scaled_array``, whose engine analogue is
``operators.temporal.temporally_scaled`` + a monthly regroup; compose
those upstream and pass the result per year.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_fluxie(
    emissions_by_year: dict[int, DataFrame],
    grid: DataFrame,
    country_fractions: DataFrame,
    output_dir: str,
    transport_model: str = "emiproc",
    frequency: str = "yearly",
    tprofile_index: DataFrame | None = None,
    tprofiles: DataFrame | None = None,
) -> str:
    """``emissions_by_year``: {year: long emissions}; ``grid``:
    (cell_id, lon, lat, area_m2) regular lon-major grid;
    ``country_fractions``: (cell_id, country, fraction).

    ``frequency="monthly"`` follows the reference exactly: the time axis
    is *daily* stamps over each inventory year (fluxie.py:154-158 calls
    get_temporally_scaled_array with the default freq="D"), each stamp
    scaled by the composite profile factor, units still kg m⁻² yr⁻¹.
    Requires ``tprofile_index`` + ``tprofiles``.
    """
    from emiproc_spark.functions.netcdf3 import NCDataset, NCVariable, write_netcdf

    if frequency not in ("yearly", "monthly"):
        raise ValueError(f"frequency must be yearly or monthly, got {frequency!r}")
    if frequency == "monthly" and (tprofile_index is None or tprofiles is None):
        raise ValueError(
            "monthly fluxie export needs tprofile_index and tprofiles "
            "(the reference requires temporal profiles for monthly, "
            "fluxie.py:41)"
        )
    years = sorted(emissions_by_year)
    if len(set(years)) != len(years) or not years:
        raise ValueError(f"need distinct inventory years, got {years}")

    gpdf = grid.select("cell_id", "lon", "lat", "area_m2").toPandas()
    lons = np.sort(gpdf["lon"].unique())
    lats = np.sort(gpdf["lat"].unique())
    ny = lats.size
    lon_i = {v: i for i, v in enumerate(lons)}
    lat_i = {v: i for i, v in enumerate(lats)}
    cell_pos = {
        int(r.cell_id): (lat_i[r.lat], lon_i[r.lon]) for r in gpdf.itertuples()
    }

    cf = country_fractions.toPandas()
    countries = sorted(cf["country"].unique())
    c_i = {c: i for i, c in enumerate(countries)}
    frac = np.zeros((len(countries), ny, lons.size))
    for r in cf.itertuples():
        la, lo = cell_pos[int(r.cell_id)]
        frac[c_i[r.country], la, lo] = r.fraction

    # distributed: category sum ÷ area, collected per time step.
    # per_time: list of (time_value, pdf(cell_id, substance, flux))
    per_time: list = []
    if frequency == "yearly":
        for y in years:
            e = emissions_by_year[y]
            flux = (
                e.groupBy("cell_id", "substance")
                .agg(F.sum("value_kg_y").alias("v"))
                .join(F.broadcast(grid.select("cell_id", "area_m2")), "cell_id")
                .select(
                    "cell_id",
                    "substance",
                    (F.col("v") / F.col("area_m2")).alias("flux"),
                )
            )
            per_time.append((y, flux.toPandas()))
        time_attrs = {
            "long_name": "inventory year (stamped June 1)",
            "units": "year",
        }
    else:
        import calendar
        from datetime import date

        from emiproc_spark.operators.temporal import (
            attach_profiles,
            composite_scaling_factor,
        )

        for y in years:
            e = emissions_by_year[y]
            static = attach_profiles(e, tprofile_index, tprofiles)
            ndays = 366 if calendar.isleap(y) else 365
            days = e.sparkSession.range(ndays).select(
                F.col("id").cast("int").alias("t_idx"),
                (
                    F.lit(f"{y}-01-01 00:00:00").cast("timestamp_ntz")
                    + F.make_interval(days=F.col("id").cast("int"))
                ).alias("sim_ts"),
            )
            sf = composite_scaling_factor(
                F.col("sim_ts"), F.col("__profs"), F.col("__guard")
            )
            flux = (
                static.crossJoin(F.broadcast(days))
                .select(
                    "t_idx",
                    "cell_id",
                    "substance",
                    (F.col("value_kg_y") * sf).alias("v"),
                )
                .groupBy("t_idx", "cell_id", "substance")
                .agg(F.sum("v").alias("v"))
                .join(F.broadcast(grid.select("cell_id", "area_m2")), "cell_id")
                .select(
                    "t_idx",
                    "cell_id",
                    "substance",
                    (F.col("v") / F.col("area_m2")).alias("flux"),
                )
            )
            pdf = flux.toPandas()
            epoch0 = (date(y, 1, 1) - date(1970, 1, 1)).days
            for i in range(ndays):
                per_time.append((epoch0 + i, pdf[pdf["t_idx"] == i]))
        time_attrs = {
            "long_name": "daily scaling-factor stamps",
            "units": "days since 1970-01-01",
        }

    substances = sorted(
        {s for _, pdf in per_time for s in pdf["substance"].unique()}
    )
    base = os.path.join(output_dir, transport_model)
    time_vals = [tv for tv, _ in per_time]
    for sub in substances:
        arr = np.zeros((len(per_time), ny, lons.size))
        for t, (_, pdf) in enumerate(per_time):
            sel = pdf[pdf["substance"] == sub]
            for r in sel.itertuples():
                la, lo = cell_pos[int(r.cell_id)]
                arr[t, la, lo] = r.flux
        country_flux = np.einsum("tyx,cyx->tc", arr, frac)

        ds = NCDataset()
        ds.dims = {
            "time": len(per_time), "latitude": ny, "longitude": lons.size,
            "country": len(countries), "country_str_len": max(
                1, max(len(c) for c in countries)
            ),
        }
        ds.variables["time"] = NCVariable(
            "time", ("time",), np.array(time_vals, dtype=np.int32),
            time_attrs,
        )
        ds.variables["longitude"] = NCVariable(
            "longitude", ("longitude",), lons,
            {"standard_name": "longitude",
             "long_name": "longitude of grid cell centre",
             "units": "degrees_east", "axis": "X"},
        )
        ds.variables["latitude"] = NCVariable(
            "latitude", ("latitude",), lats,
            {"standard_name": "latitude",
             "long_name": "latitude of grid cell centre",
             "units": "degrees_north", "axis": "Y"},
        )
        klen = ds.dims["country_str_len"]
        chars = np.zeros((len(countries), klen), dtype="S1")
        for i, c in enumerate(countries):
            b = c.encode()[:klen]
            chars[i, : len(b)] = np.frombuffer(b, dtype="S1")
        ds.variables["country"] = NCVariable(
            "country", ("country", "country_str_len"), chars
        )
        ds.variables["country_fraction"] = NCVariable(
            "country_fraction", ("country", "latitude", "longitude"), frac,
            {"long_name": "fraction of grid cell associated to country",
             "units": "1", "comments": "calculated by emiproc_spark"},
        )
        ds.variables["flux_total_prior"] = NCVariable(
            "flux_total_prior", ("time", "latitude", "longitude"), arr,
            {"units": "kg m-2 yr-1"},
        )
        ds.variables["country_flux_total_prior"] = NCVariable(
            "country_flux_total_prior", ("time", "country"), country_flux,
            {"units": "kg m-2 yr-1"},
        )
        sub_dir = os.path.join(base, sub)
        os.makedirs(sub_dir, exist_ok=True)
        write_netcdf(
            os.path.join(sub_dir, f"{transport_model}_{sub}_{frequency}.nc"), ds
        )
    return base
