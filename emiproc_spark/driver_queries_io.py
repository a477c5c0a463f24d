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


QUERIES_IO = {
    "speciate_inventory": q_speciate_inventory,
    "netcdf_ingest": q_netcdf_ingest,
}

ORACLES_IO = {
    "speciate_inventory": SQL_SPECIATE_INVENTORY,
    "netcdf_ingest": SQL_NETCDF_INGEST,
}
