"""VPRM vegetation CO2-flux model and human-respiration emissions.

Reference: ``emiproc/profiles/vprm.py`` (vegetation indices from
reflectances, Tscale/Wscale/Pscale, GEE + respiration) and
``emiproc/human_respiration.py:78-160``.  Pure column arithmetic over a
timeseries table — exactly what whole-stage codegen eats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference vprm.py:191 — photosynthetically active radiation from
# shortwave radiation
PAR_FROM_RAD = 0.505


def vegetation_indices(df: DataFrame, nir: str = "nir", swir: str = "swir", red: str = "red", blue: str = "blue") -> DataFrame:
    """EVI / LSWI / NDVI from reflectances (reference
    calculate_vegetation_indices, emiproc/profiles/vprm.py:46-102)."""
    n, s, r, b = (F.col(c) for c in (nir, swir, red, blue))
    return df.withColumns(
        {
            "ndvi": (n - r) / (n + r),
            "evi": F.lit(2.5) * (n - r) / (n + F.lit(6.0) * r - F.lit(7.5) * b + F.lit(1.0)),
            "lswi": (n - s) / (n + s),
        }
    )


def _tscale(temp: Column, tmin: float, tmax: float, topt: float) -> Column:
    """Temperature scale (vprm.py Tscale): 0 outside (tmin, tmax)."""
    num = (temp - tmin) * (temp - tmax)
    den = num - (temp - topt) * (temp - topt)
    return F.when(
        (temp > tmin) & (temp < tmax) & (den != 0.0), num / den
    ).otherwise(F.lit(0.0))


def vprm_gee(
    df: DataFrame,
    lambda_: float,
    par0: float,
    tmin: float = 0.0,
    tmax: float = 45.0,
    topt: float = 20.0,
    temp: str = "temperature_c",
    rad: str = "rad_w_m2",
    evi: str = "evi",
    lswi: str = "lswi",
) -> DataFrame:
    """Gross ecosystem exchange (reference calculate_vprm_emissions,
    emiproc/profiles/vprm.py:105-225): GEE = λ·Tscale·Wscale·Pscale·
    EVI·PAR/(1+PAR/PAR0)."""
    par = F.col(rad) / F.lit(PAR_FROM_RAD)
    # season-max LSWI is a scalar per series — aggregate + broadcast
    # (a global window would force a single-partition shuffle)
    mx = df.agg(F.max(lswi).alias("__lswi_max"))
    df = df.crossJoin(F.broadcast(mx))
    wscale = (F.lit(1.0) + F.col(lswi)) / (F.lit(1.0) + F.col("__lswi_max"))
    pscale = (F.lit(1.0) + F.col(lswi)) / F.lit(2.0)
    tscale = _tscale(F.col(temp), tmin, tmax, topt)
    gee = (
        F.lit(lambda_)
        * tscale
        * wscale
        * pscale
        * F.col(evi)
        * par
        / (F.lit(1.0) + par / F.lit(par0))
    )
    return df.withColumn("gee", gee).drop("__lswi_max")


def vprm_respiration(
    df: DataFrame,
    alpha: float,
    beta: float,
    temp: str = "temperature_c",
    t_low: float = 0.0,
) -> DataFrame:
    """Standard ecosystem respiration: α·max(T, T_low) + β (reference
    vprm.py:227-268 standard variant)."""
    t = F.greatest(F.col(temp), F.lit(t_low))
    return df.withColumn("respiration", F.lit(alpha) * t + F.lit(beta))


def people_to_emissions(
    people: DataFrame,
    factor_kg_per_person_day: float,
    time_ratio: float = 1.0,
    days_per_year: float = 365.25,
    people_col: str = "n_people",
) -> DataFrame:
    """Human-respiration emissions: factor × people × time_ratio × days
    (reference people_to_emissions, emiproc/human_respiration.py:138-143)."""
    return people.withColumn(
        "value_kg_y",
        F.lit(factor_kg_per_person_day)
        * F.col(people_col)
        * F.lit(time_ratio)
        * F.lit(days_per_year),
    )
