"""Driver-contract queries for I/O paths and round-2 operators.

Same contract as ``driver_queries``: each Spark callable has a DuckDB
oracle computing the identical result in closed-form ANSI SQL over the
driver's parquet tables.  Float determinism via qhelpers quantization.

The NetCDF queries exercise the REAL file path: the Spark side writes a
classic NetCDF-3 file with the pure-numpy codec, re-ingests it through
the distributed ``binaryFile``+``mapInPandas`` scan, and must agree
with an oracle that never leaves SQL — so codec, layout (lon-major cell
ids), unit identity, and time-mean semantics are all on the hook.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark import fixtures as fx
from emiproc_spark.operators import speciation as spn
from emiproc_spark.qhelpers import sql_sumd, sumd

# ======================================================================
# speciate_inventory: dict-driven (cat,sub)→(cat',sub') fan-out
# (reference emiproc/speciation.py:351-436 — category may change,
# ratios need not sum to 1)
# ======================================================================
SPECIATE_INV_DICT = {
    ("A", "F"): {("A2", "F1"): 0.4, ("B2", "F2"): 0.7},
    ("R", "O"): {("R", "O3"): 1.1},
}


def q_speciate_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fx.emissions(spark, sf_dir)
    sp = spn.speciate_inventory(e, SPECIATE_INV_DICT)
    return sp.groupBy("cell_id", "category", "substance").agg(
        sumd("value_kg_y").alias("value_kg_y")
    )


SQL_SPECIATE_INVENTORY = f"""
    WITH e AS ({fx.EMISSIONS_SQL}),
    sp AS (
        SELECT cell_id, 'A2' AS category, 'F1' AS substance,
               value_kg_y * 0.4 AS value_kg_y
        FROM e WHERE category = 'A' AND substance = 'F'
        UNION ALL
        SELECT cell_id, 'B2' AS category, 'F2' AS substance,
               value_kg_y * 0.7 AS value_kg_y
        FROM e WHERE category = 'A' AND substance = 'F'
        UNION ALL
        SELECT cell_id, 'R' AS category, 'O3' AS substance,
               value_kg_y * 1.1 AS value_kg_y
        FROM e WHERE category = 'R' AND substance = 'O'
        UNION ALL
        SELECT cell_id, category, substance, value_kg_y
        FROM e WHERE NOT (   (category = 'A' AND substance = 'F')
                          OR (category = 'R' AND substance = 'O'))
    )
    SELECT cell_id, category, substance, {sql_sumd('value_kg_y')} AS value_kg_y
    FROM sp GROUP BY 1, 2, 3
"""


# ======================================================================
# netcdf_ingest: export→re-ingest round-trip vs pure-SQL oracle
# ======================================================================
def _raster_grid(spark: SparkSession) -> DataFrame:
    """10×10 lon-major degree grid matching fixture cell ids
    (cell_id = lon_i * nlat + lat_i)."""
    return spark.createDataFrame(
        [
            (lon_i * fx.FINE_NY + lat_i, float(lon_i), float(lat_i), 1.0)
            for lon_i in range(fx.FINE_NX)
            for lat_i in range(fx.FINE_NY)
        ],
        "cell_id long, lon double, lat double, area_m2 double",
    )


def q_netcdf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emiproc_spark.exports.netcdf import export_raster_netcdf
    from emiproc_spark.sources.netcdf import from_netcdf_rasters

    # pre-aggregate with exact quantized sums so the values entering the
    # file are engine-independent; everything after is per-row exact
    agg = (
        fx.emissions(spark, sf_dir)
        .groupBy("cell_id", "category", "substance")
        .agg(sumd("value_kg_y").alias("value_kg_y"))
    )
    out = os.path.join(tempfile.mkdtemp(prefix="emiproc_nc_"), "inv.nc")
    export_raster_netcdf(agg, _raster_grid(spark), out, add_totals=False)
    return from_netcdf_rasters(spark, out)


SQL_NETCDF_INGEST = f"""
    WITH e AS ({fx.EMISSIONS_SQL})
    SELECT cell_id, category, substance, {sql_sumd('value_kg_y')} AS value_kg_y
    FROM e GROUP BY 1, 2, 3
"""


# ======================================================================
# TNO-layout ingest: area scatter-add + point pass-through + substance
# merge, through a real NetCDF-3 file (reference tno.py:146-256)
# ======================================================================
def _tno_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic TNO-layout file derived from lineitem + supplier.

    Values are floored to integer-valued doubles before writing so every
    downstream sum is order-independent-exact in both engines.
    """
    import pandas as pd

    from emiproc_spark.sources.tno import write_tno_netcdf

    li = fx.load(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") % fx.N_CELLS).alias("cell_id"),
        F.col("l_returnflag").alias("category"),
        (F.col("l_orderkey") % 2).alias("bucket"),
        F.col("l_linestatus").alias("sub"),
        F.col("l_extendedprice").alias("val"),
    )
    srcs = (
        base.groupBy("cell_id", "category", "bucket")
        .agg(
            F.floor(sumd(F.when(F.col("sub") == "F", F.col("val")).otherwise(0.0)))
            .cast("double")
            .alias("F"),
            F.floor(sumd(F.when(F.col("sub") == "O", F.col("val")).otherwise(0.0)))
            .cast("double")
            .alias("O"),
        )
        .toPandas()
        .sort_values(["cell_id", "category", "bucket"])
        .reset_index(drop=True)
    )
    area = pd.DataFrame(
        {
            "source_type": "a",
            "lon_index": srcs["cell_id"] // fx.FINE_NY + 1,
            "lat_index": srcs["cell_id"] % fx.FINE_NY + 1,
            "lon": 0.0,
            "lat": 0.0,
            "category": srcs["category"],
            "F": srcs["F"],
            "O": srcs["O"],
        }
    )
    sup = (
        fx.load(spark, sf_dir, "supplier")
        .select(
            (F.col("s_suppkey") % 360).cast("double").alias("lon360"),
            (F.col("s_suppkey") % 180).cast("double").alias("lat180"),
            F.concat(F.lit("P"), (F.col("s_suppkey") % 2).cast("string")).alias(
                "category"
            ),
            (F.floor(F.abs(F.col("s_acctbal"))) + 1).cast("double").alias("F"),
            (F.floor(F.abs(F.col("s_acctbal")) * 2) + 1).cast("double").alias("O"),
            F.col("s_suppkey").alias("k"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    points = pd.DataFrame(
        {
            "source_type": "p",
            "lon_index": 1,
            "lat_index": 1,
            "lon": sup["lon360"] - 180.0,
            "lat": sup["lat180"] - 90.0,
            "category": sup["category"],
            "F": sup["F"],
            "O": sup["O"],
        }
    )
    out = os.path.join(tempfile.mkdtemp(prefix="emiproc_tno_"), "tno.nc")
    write_tno_netcdf(
        out, pd.concat([area, points], ignore_index=True), fx.FINE_NX, fx.FINE_NY,
        ["F", "O"],
    )
    return out


TNO_MAPPING = {"F": "ALL", "O": "ALL"}


def q_tno_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emiproc_spark.sources.tno import tno_area_emissions

    path = _tno_fixture(spark, sf_dir)
    return tno_area_emissions(spark, path, substances_mapping=TNO_MAPPING)


SQL_TNO_INGEST = f"""
    WITH base AS (
        SELECT l_partkey % {fx.N_CELLS} AS cell_id,
               l_returnflag AS category,
               l_orderkey % 2 AS bucket,
               l_linestatus AS sub,
               l_extendedprice AS val
        FROM lineitem
    ),
    srcs AS (
        SELECT cell_id, category, bucket,
               FLOOR({sql_sumd("CASE WHEN sub = 'F' THEN val ELSE 0.0 END")}) AS f,
               FLOOR({sql_sumd("CASE WHEN sub = 'O' THEN val ELSE 0.0 END")}) AS o
        FROM base GROUP BY 1, 2, 3
    )
    SELECT cell_id, category, 'ALL' AS substance,
           CAST(SUM(f + o) AS DOUBLE) AS value_kg_y
    FROM srcs GROUP BY 1, 2
"""


def q_tno_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emiproc_spark.sources.tno import tno_point_sources

    path = _tno_fixture(spark, sf_dir)
    pts = tno_point_sources(spark, path, substances_mapping=TNO_MAPPING)
    # project away the file-order source_id; re-group on coordinates
    return pts.groupBy("lon", "lat", "category", "substance").agg(
        F.sum("value_kg_y").alias("value_kg_y")
    )


SQL_TNO_POINTS = """
    WITH s AS (
        SELECT CAST(s_suppkey % 360 AS DOUBLE) - 180.0 AS lon,
               CAST(s_suppkey % 180 AS DOUBLE) - 90.0 AS lat,
               'P' || CAST(s_suppkey % 2 AS VARCHAR) AS category,
               FLOOR(ABS(s_acctbal)) + 1 AS f,
               FLOOR(ABS(s_acctbal) * 2) + 1 AS o
        FROM supplier
    )
    SELECT lon, lat, category, 'ALL' AS substance,
           CAST(SUM(f + o) AS DOUBLE) AS value_kg_y
    FROM s GROUP BY 1, 2, 3
"""


QUERIES_IO = {
    "speciate_inventory": q_speciate_inventory,
    "netcdf_ingest": q_netcdf_ingest,
    "tno_ingest": q_tno_ingest,
    "tno_points": q_tno_points,
}

ORACLES_IO = {
    "speciate_inventory": SQL_SPECIATE_INVENTORY,
    "netcdf_ingest": SQL_NETCDF_INGEST,
    "tno_ingest": SQL_TNO_INGEST,
    "tno_points": SQL_TNO_POINTS,
}
