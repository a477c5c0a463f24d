"""Canonical table schemas (SURVEY.md §1.4, FIXTURES.md F1–F8).

The reference holds a dense wide matrix cell × (category, substance)
(pandas 2-level columns, reference ``emiproc/inventories/__init__.py:91-101``).
The Spark-native model is the long form below: categories/substances are
*data*, so new ones never change the schema, aggregations are plain
``groupBy`` and Catalyst can prune/push down freely.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Gridded emissions, long form.  Canonical unit kg/year/cell
# (reference emiproc/utils/units.py:1-4).
EMISSIONS = T.StructType(
    [
        T.StructField("cell_id", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("substance", T.StringType()),
        T.StructField("value_kg_y", T.DoubleType()),
    ]
)

# Grid dimension table (reference emiproc/grids.py:40-189).  Geometry as
# WKB; bbox columns denormalized so bbox pre-filters and interval joins
# stay JVM-side (tile pruning without parsing geometry).
GRID = T.StructType(
    [
        T.StructField("cell_id", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("area_m2", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)

# Shaped (point/line/polygon) sources — the reference's ``gdfs`` dict
# (emiproc/inventories/__init__.py:96-101) flattened to one table with a
# category discriminator; EmissionInfo fields inline
# (emiproc/inventories/__init__.py:43-72).
SHAPED = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("source_id", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("substance", T.StringType()),
        T.StructField("value_kg_y", T.DoubleType()),
        T.StructField("height_m", T.DoubleType()),
        T.StructField("width_m", T.DoubleType()),
        T.StructField("temperature_k", T.DoubleType()),
        T.StructField("speed_m_s", T.DoubleType()),
    ]
)

# Remap weight table (reference emiproc/regrid.py:104-310):
# weight = area(src ∩ dst)/area(src) for grid→grid.
WEIGHTS = T.StructType(
    [
        T.StructField("src_id", T.LongType()),
        T.StructField("dst_id", T.LongType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

# Temporal profile store (reference emiproc/profiles/temporal/profiles.py):
# a row-normalized ratio vector per (profile_id, ptype); ratios sum to 1.
TPROFILE = T.StructType(
    [
        T.StructField("profile_id", T.IntegerType()),
        T.StructField("ptype", T.StringType()),
        T.StructField("ratios", T.ArrayType(T.DoubleType())),
    ]
)

# Sparse profile index (reference profiles/naming.py:38-60): null dim =
# wildcard, profile_id -1 = constant profile (scaling factor 1.0).
TPROFILE_INDEX = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("substance", T.StringType()),
        T.StructField("cell_id", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("profile_id", T.IntegerType()),
    ]
)

# Vertical profiles (reference emiproc/profiles/vertical_profiles.py:23-117):
# layer k spans (height[k-1], height[k]], first layer starts at 0.
VPROFILE = T.StructType(
    [
        T.StructField("profile_id", T.IntegerType()),
        T.StructField("heights_top_m", T.ArrayType(T.DoubleType())),
        T.StructField("ratios", T.ArrayType(T.DoubleType())),
    ]
)

# Country/timezone mask fractions (reference emiproc/utilities.py:443-519).
CELL_COUNTRY = T.StructType(
    [
        T.StructField("cell_id", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("fraction", T.DoubleType()),
    ]
)

# Speciation ratio table, long form (reference emiproc/speciation.py:22-108).
SPECIATION = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("src_substance", T.StringType()),
        T.StructField("dst_substance", T.StringType()),
        T.StructField("ratio", T.DoubleType()),
    ]
)

# Profile sizes per cyclic type
# (reference emiproc/profiles/temporal/constants.py:1-9).
PROFILE_SIZES = {
    "daily": 24,
    "weekly": 7,
    "monthly": 12,
    "hour_of_week": 168,
    "hour_of_year": 8760,
    "hour_of_leap_year": 8784,
    "day_of_year": 365,
    "day_of_leap_year": 366,
    "hour3_of_day": 8,
    "hour3_of_day_per_month": 96,
    "hour_of_week_per_month": 2016,
}
