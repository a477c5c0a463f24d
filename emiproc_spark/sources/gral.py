"""GRAL simulation-input ingest (reference emiproc/inventories/gral.py).

A GRAL emissions directory holds positional CSV files — ``point.dat``
(1 junk line + header), ``line.dat`` (4 junk lines + header),
``cadastre.dat`` (header only) — plus ``source_groups.json`` mapping
integer source groups to (substance, category).  Units: points and
cadastre cells carry kg/h (× 8766 h/yr → kg/y, reference
gral.py:185-187, 305-307); lines carry kg/h/km (× 8766 × length_km,
gral.py:236-241).

Spark shape: per-file ``binaryFile`` decode (positional columns via
pandas inside ``mapInPandas``), geometry encoded to WKB vectorized,
group→(substance, category) resolution as a broadcast join.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.functions import geometry as geom

HOUR_PER_YR = 365.25 * 24.0  # reference emiproc/utils/constants.py:7

# positional column indexes (reference gral.py:19-58)
PT_X, PT_Y, PT_Z, PT_EMI = 0, 1, 2, 3
PT_SPEED, PT_DIAM, PT_TEMP, PT_GROUP = 7, 8, 9, 10
LN_SECTION, LN_GROUP = 1, 2
LN_X1, LN_Y1, LN_Z1, LN_X2, LN_Y2, LN_Z2 = 3, 4, 5, 6, 7, 8
LN_WIDTH, LN_EXT, LN_EMI = 9, 10, 13
CAD_X, CAD_Y, CAD_Z = 0, 1, 2
CAD_DX, CAD_DY, CAD_DZ, CAD_EMI, CAD_GROUP = 3, 4, 5, 6, 10

_SCHEMA = (
    "source_group int, geometry binary, value_kg_y double, height double, "
    "width double, speed double, temperature double, vertical_extension double"
)


def _scan_dat(
    spark: SparkSession, path: str, skip: int, decode
) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            for content in pdf["content"]:
                df = pd.read_csv(
                    io.BytesIO(bytes(content)), header=skip, index_col=False
                )
                if len(df):
                    yield decode(df)

    return files.mapInPandas(run, schema=_SCHEMA)


def _decode_points(df: pd.DataFrame) -> pd.DataFrame:
        c = df.columns
        x = df[c[PT_X]].to_numpy(dtype=np.float64)
        y = df[c[PT_Y]].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "source_group": df[c[PT_GROUP]].to_numpy(dtype=np.int32),
                "geometry": [geom.wkb_point(a, b) for a, b in zip(x, y)],
                "value_kg_y": df[c[PT_EMI]].to_numpy(dtype=np.float64) * HOUR_PER_YR,
                "height": df[c[PT_Z]].to_numpy(dtype=np.float64),
                "width": df[c[PT_DIAM]].to_numpy(dtype=np.float64),
                "speed": df[c[PT_SPEED]].to_numpy(dtype=np.float64),
                "temperature": df[c[PT_TEMP]].to_numpy(dtype=np.float64),
                "vertical_extension": np.zeros(len(df)),
            }
        )

def gral_point_sources(spark: SparkSession, path: str) -> DataFrame:
    """``point.dat`` → point WKB + kg/y + stack EmissionInfo fields
    (reference _read_points, gral.py:164-199)."""
    return _scan_dat(spark, path, 1, _decode_points)


def _decode_lines(df: pd.DataFrame) -> pd.DataFrame:
        c = df.columns
        x1 = df[c[LN_X1]].to_numpy(dtype=np.float64)
        y1 = df[c[LN_Y1]].to_numpy(dtype=np.float64)
        x2 = df[c[LN_X2]].to_numpy(dtype=np.float64)
        y2 = df[c[LN_Y2]].to_numpy(dtype=np.float64)
        km = np.hypot(x2 - x1, y2 - y1) * 1e-3
        return pd.DataFrame(
            {
                "source_group": df[c[LN_GROUP]].to_numpy(dtype=np.int32),
                "geometry": [
                    geom.wkb_linestring([(a, b), (p, q)])
                    for a, b, p, q in zip(x1, y1, x2, y2)
                ],
                "value_kg_y": df[c[LN_EMI]].to_numpy(dtype=np.float64)
                * HOUR_PER_YR
                * km,
                "height": df[c[LN_Z1]].to_numpy(dtype=np.float64),
                "width": df[c[LN_WIDTH]].to_numpy(dtype=np.float64),
                "speed": np.zeros(len(df)),
                "temperature": np.zeros(len(df)),
                "vertical_extension": np.abs(
                    df[c[LN_EXT]].to_numpy(dtype=np.float64)
                ),
            }
        )

def gral_line_sources(spark: SparkSession, path: str) -> DataFrame:
    """``line.dat`` → segment WKB + kg/y (rate × hours × km, reference
    _read_lines, gral.py:200-250)."""
    return _scan_dat(spark, path, 4, _decode_lines)


def _decode_cadastre(df: pd.DataFrame) -> pd.DataFrame:
        c = df.columns
        x = df[c[CAD_X]].to_numpy(dtype=np.float64)
        y = df[c[CAD_Y]].to_numpy(dtype=np.float64)
        dx = df[c[CAD_DX]].to_numpy(dtype=np.float64)
        dy = df[c[CAD_DY]].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "source_group": df[c[CAD_GROUP]].to_numpy(dtype=np.int32),
                "geometry": [
                    geom.wkb_polygon(
                        [(a, b), (a + w, b), (a + w, b + h), (a, b + h)]
                    )
                    for a, b, w, h in zip(x, y, dx, dy)
                ],
                "value_kg_y": df[c[CAD_EMI]].to_numpy(dtype=np.float64) * HOUR_PER_YR,
                "height": df[c[CAD_Z]].to_numpy(dtype=np.float64),
                "width": np.zeros(len(df)),
                "speed": np.zeros(len(df)),
                "temperature": np.zeros(len(df)),
                "vertical_extension": df[c[CAD_DZ]].to_numpy(dtype=np.float64),
            }
        )

def gral_cadastre_sources(spark: SparkSession, path: str) -> DataFrame:
    """``cadastre.dat`` → axis-aligned square polygons + kg/y
    (reference _read_cadastre, gral.py:252-317)."""
    return _scan_dat(spark, path, 0, _decode_cadastre)


# file name → (junk lines before header row, decoder)
DAT_DECODERS = {
    "point.dat": (1, _decode_points),
    "line.dat": (4, _decode_lines),
    "cadastre.dat": (0, _decode_cadastre),
}


def load_source_group_mapping(path: str) -> dict[int, tuple[str, str]]:
    """``source_groups.json``: group id → (substance, category); bare
    strings mean (unknown, category) (reference gral.py:96-142)."""
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for k, v in raw.items():
        if isinstance(v, str):
            out[int(k)] = ("unknown", v)
        else:
            out[int(k)] = (v[0], v[1])
    return out


def gral_inventory(
    spark: SparkSession,
    emissions_dir: str,
    source_group_mapping: dict[int, tuple[str, str]] | None = None,
) -> DataFrame:
    """Whole GRAL input directory → long shaped-source table
    ``(category, geometry, substance, value_kg_y, height, width, speed,
    temperature, vertical_extension)`` (reference GralInventory,
    gral.py:61-158).  Unknown source groups raise via an inner-join
    count check (gral.py:129-134)."""
    if source_group_mapping is None:
        source_group_mapping = load_source_group_mapping(
            os.path.join(emissions_dir, "source_groups.json")
        )
    present = [
        f for f in DAT_DECODERS if os.path.exists(os.path.join(emissions_dir, f))
    ]
    if not present:
        raise FileNotFoundError(f"no point/line/cadastre .dat files in {emissions_dir}")
    # ONE scan over every .dat file, dispatching per file name — a single
    # Spark job instead of one per source kind
    files = (
        spark.read.format("binaryFile")
        .load([os.path.join(emissions_dir, f) for f in present])
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                skip, decode = DAT_DECODERS[os.path.basename(fpath)]
                # a malformed .dat must name ITSELF, not surface as an
                # anonymous task failure in a multi-file scan
                try:
                    df = pd.read_csv(
                        io.BytesIO(bytes(content)), header=skip, index_col=False
                    )
                    if len(df):
                        yield decode(df)
                except (ValueError, KeyError) as e:
                    raise ValueError(f"{fpath}: malformed GRAL .dat: {e}") from e

    scan = files.mapInPandas(run, schema=_SCHEMA)
    mdf = local_rows_df(
        spark,
        [(g, s, c) for g, (s, c) in source_group_mapping.items()],
        "source_group int, substance string, category string",
    )
    joined = scan.join(F.broadcast(mdf), "source_group", "left")
    # unknown-group validation stays distributed: raise in the executor
    # instead of paying a separate driver-side probe job
    cat = F.when(
        F.col("category").isNull(),
        F.raise_error(
            F.concat(
                F.lit("source_group="),
                F.col("source_group").cast("string"),
                F.lit(" not found in source_group_mapping"),
            )
        ),
    ).otherwise(F.col("category"))
    return joined.select(
        cat.alias("category"), "geometry", "substance", "value_kg_y",
        "height", "width", "speed", "temperature", "vertical_extension",
    )
