"""Overpass/OSM JSON ingest → shaped-source geometries.

Reference: ``emiproc/utils/osm.py:18-179`` (osm_json_to_gdf) — parse an
Overpass API JSON export into point/way geometries with tag columns.

Spark shape: ``spark.read.json`` handles the envelope distributively;
node elements become WKB points via column expressions feeding the
pure-numpy WKB encoder in a vectorized pandas UDF; ways resolve their
node refs with a self-join on the node id (no driver-side dict like the
reference's imperative pass).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from emiproc_spark.functions.geometry import wkb_linestring, wkb_point


@F.pandas_udf(BinaryType())
def _point_wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series([wkb_point(x, y) for x, y in zip(lon, lat)], dtype=object)


@F.pandas_udf(BinaryType())
def _line_wkb(lons: pd.Series, lats: pd.Series) -> pd.Series:
    out = []
    for xs, ys in zip(lons, lats):
        out.append(wkb_linestring(list(zip(xs, ys))) if xs is not None and len(xs) >= 2 else None)
    return pd.Series(out, dtype=object)


def osm_json_to_sources(spark: SparkSession, path: str) -> DataFrame:
    """Overpass JSON → (osm_id, osm_type, geometry WKB, tags MAP).

    Nodes become points; ways become linestrings by joining their node
    ref lists back to node coordinates (posexplode → join → re-assemble
    ordered) — the distributed version of the reference's node-dict
    lookup (utils/osm.py:18-179).
    """
    raw = spark.read.option("multiLine", "true").json(path)
    elements = raw.select(F.explode("elements").alias("el")).select("el.*")
    cols = elements.columns

    nodes = elements.where(F.col("type") == "node").select(
        F.col("id").alias("osm_id"),
        F.lit("node").alias("osm_type"),
        F.col("lon").cast("double").alias("lon"),
        F.col("lat").cast("double").alias("lat"),
        (F.col("tags") if "tags" in cols else F.lit(None)).alias("tags"),
    )
    node_pts = nodes.withColumn("geometry", _point_wkb("lon", "lat")).select(
        "osm_id", "osm_type", "geometry", "tags"
    )

    if "nodes" not in cols:
        return node_pts

    way_refs = (
        elements.where(F.col("type") == "way")
        .select(
            F.col("id").alias("osm_id"),
            (F.col("tags") if "tags" in cols else F.lit(None)).alias("tags"),
            F.posexplode("nodes").alias("seq", "ref"),
        )
    )
    coords = nodes.select(F.col("osm_id").alias("ref"), "lon", "lat")
    ways = (
        way_refs.join(coords, "ref")
        .groupBy("osm_id", "tags")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "lon"))), lambda s: s["lon"]
            ).alias("lons"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "lat"))), lambda s: s["lat"]
            ).alias("lats"),
        )
        .withColumn("geometry", _line_wkb("lons", "lats"))
        .select("osm_id", F.lit("way").alias("osm_type"), "geometry", "tags")
    )
    return node_pts.unionByName(ways)
