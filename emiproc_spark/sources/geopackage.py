"""GeoPackage ingest/export via stdlib ``sqlite3`` — no fiona/GDAL.

A GeoPackage is a SQLite database with spec'd metadata tables
(``gpkg_contents``, ``gpkg_geometry_columns``, ``gpkg_spatial_ref_sys``)
and feature tables whose geometry BLOBs are a fixed "GP" header followed
by standard WKB (OGC GeoPackage spec §2.1.3).  That makes the whole
vector pathway — the reference's ``list_categories`` / ``load_category``
(fiona, inventories/utils.py:38-56), ``MapLuftZurich``-style category
layers (inventories/zurich/__init__.py:10-118) and
``export_to_geopackage`` (exports/geopackage.py:9-55) — expressible with
the standard library.

Scale: layer reads are distributed by ``rowid`` range — each Spark task
opens the file read-only and scans its own slice, so a multi-GB layer
parallelizes without a driver hop.  Export collects (feature layers are
dimension-sized vector data; the file container is inherently
single-node, exactly like the reference's writers).
"""

from __future__ import annotations

import sqlite3
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.functions import geometry as geom

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gpkg_to_wkb(blob: bytes) -> bytes:
    """Strip the GeoPackage binary header, returning standard WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (missing GP magic)")
    flags = blob[3]
    env = (flags >> 1) & 0b111
    if env not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid envelope indicator {env}")
    return bytes(blob[8 + 8 * _ENVELOPE_DOUBLES[env]:])


def wkb_to_gpkg(wkb: bytes, srs_id: int = 0) -> bytes:
    """Wrap standard WKB in a minimal GeoPackage header (little-endian,
    no envelope)."""
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + wkb


def list_layers(path: str) -> list[str]:
    """Feature layers in a GeoPackage (reference ``list_categories``,
    inventories/utils.py:38-47)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            " ORDER BY table_name"
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


_SQLITE_TO_SPARK = {
    "INTEGER": "long", "INT": "long", "MEDIUMINT": "long", "TINYINT": "long",
    "SMALLINT": "long", "BIGINT": "long", "BOOLEAN": "long",
    "REAL": "double", "FLOAT": "double", "DOUBLE": "double",
    "TEXT": "string", "BLOB": "binary", "DATE": "string", "DATETIME": "string",
}


def _layer_meta(path: str, layer: str) -> tuple[str, list[tuple[str, str]], int]:
    """(geometry column, [(attr col, spark type)], max rowid)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        geom_col = row[0] if row else None
        cols = []
        for _, name, ctype, *_ in con.execute(f'PRAGMA table_info("{layer}")'):
            if name == geom_col:
                continue
            base = ctype.split("(")[0].upper() if ctype else "TEXT"
            cols.append((name, _SQLITE_TO_SPARK.get(base, "string")))
        maxrow = con.execute(f'SELECT COALESCE(MAX(rowid), 0) FROM "{layer}"').fetchone()[0]
    finally:
        con.close()
    if geom_col is None:
        raise ValueError(f"layer {layer!r} not found in gpkg_geometry_columns")
    return geom_col, cols, maxrow


def read_gpkg_layer(
    spark: SparkSession,
    path: str,
    layer: str,
    num_partitions: int = 16,
) -> DataFrame:
    """One GeoPackage feature layer → DataFrame with a ``geometry``
    column of standard WKB (header stripped) plus all attribute columns
    (reference ``load_category``, inventories/utils.py:50-56).

    Each task scans its own ``rowid`` range with a read-only SQLite
    handle — a parallel layer scan, no driver materialization.
    """
    geom_col, cols, maxrow = _layer_meta(path, layer)
    step = max(1, (maxrow + num_partitions - 1) // max(num_partitions, 1))
    bounds = [
        (lo, min(lo + step, maxrow))
        for lo in range(0, maxrow, step)
    ] or [(0, 0)]
    bdf = local_rows_df(spark, bounds, "lo long, hi long")
    attr_sql = ", ".join(f'"{n}"' for n, _ in cols)
    schema = ", ".join(
        ["geometry binary"] + [f"`{n}` {t}" for n, t in cols]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            for pdf in batches:
                for lo, hi in zip(pdf["lo"], pdf["hi"]):
                    rows = con.execute(
                        f'SELECT "{geom_col}"{", " if attr_sql else ""}{attr_sql} '
                        f'FROM "{layer}" WHERE rowid > ? AND rowid <= ?',
                        (int(lo), int(hi)),
                    ).fetchall()
                    if not rows:
                        continue
                    data = {"geometry": [
                        gpkg_to_wkb(r[0]) if r[0] is not None else None for r in rows
                    ]}
                    for j, (name, t) in enumerate(cols, start=1):
                        vals = [r[j] for r in rows]
                        if t == "binary":
                            data[name] = pd.Series(vals, dtype=object)
                        else:
                            data[name] = vals
                    yield pd.DataFrame(data)
        finally:
            con.close()

    return bdf.repartition(len(bounds)).mapInPandas(scan, schema=schema)


def buffer_line(coords: np.ndarray, width: float, miter_limit: float = 5.0) -> np.ndarray:
    """Square-cap, miter-join offset polygon of a polyline — the
    reference's ``geometry.buffer(line_width, cap_style=3)``
    (inventories/utils.py:58-88) for simple polylines.

    Divergence (documented): self-intersections of the offset outline
    are not resolved into a union; for non-degenerate street segments
    the outlines coincide.  Miters clamp at ``miter_limit``·width.
    """
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        raise ValueError("need at least 2 points to buffer a line")
    seg = np.diff(c, axis=0)
    length = np.hypot(seg[:, 0], seg[:, 1])
    if np.any(length == 0):
        keep = np.concatenate(([True], length > 0))
        c = c[keep]
        seg = np.diff(c, axis=0)
        length = np.hypot(seg[:, 0], seg[:, 1])
        if len(c) < 2:
            raise ValueError("degenerate zero-length line")
    d = seg / length[:, None]
    n = np.column_stack((-d[:, 1], d[:, 0]))  # left normals

    def offsets(sign: float) -> list[np.ndarray]:
        pts = []
        # square cap start: extend backwards by width
        q0 = c[0] - d[0] * width
        pts.append(q0 + sign * width * n[0])
        for i in range(1, len(c) - 1):
            m = n[i - 1] + n[i]
            norm = np.hypot(m[0], m[1])
            if norm < 1e-12:  # 180° reversal — fall back to bevel pair
                pts.append(c[i] + sign * width * n[i - 1])
                pts.append(c[i] + sign * width * n[i])
                continue
            m = m / norm
            denom = float(m @ n[i])
            scale = min(1.0 / max(denom, 1e-12), miter_limit)
            pts.append(c[i] + sign * width * scale * m)
        qn = c[-1] + d[-1] * width
        pts.append(qn + sign * width * n[-1])
        return pts

    left = offsets(+1.0)
    right = offsets(-1.0)
    return np.array(left + right[::-1])


def lines_to_polygons(df: DataFrame, width: float = 10.0) -> DataFrame:
    """Replace LINESTRING geometries with their buffered polygons,
    pass others through (reference process_emission_category,
    inventories/utils.py:58-88; default width 10 m)."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def _buf(geoms: pd.Series) -> pd.Series:
        out = []
        for buf in geoms:
            if buf is None:
                out.append(None)
                continue
            gtype, rings = geom.parse_wkb(bytes(buf))
            if gtype != geom.WKB_LINESTRING:
                out.append(bytes(buf))
                continue
            ring = buffer_line(rings[0], width)
            out.append(geom.wkb_polygon([tuple(p) for p in ring]))
        return pd.Series(out, dtype=object)

    return df.withColumn("geometry", _buf("geometry"))


def from_geopackage(
    spark: SparkSession,
    path: str,
    substances: list[str] | None = None,
    categories: list[str] | None = None,
    convert_lines_to_polygons: bool = True,
    line_width: float = 10.0,
    emission_prefix: str = "Emission_",
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """MapLuftZurich-style shaped-source ingest: one feature layer per
    category, ``Emission_<sub>`` columns hold kg/year per shape
    (reference inventories/zurich/__init__.py:10-118).

    Returns the long shaped-source table
    ``(category, source_id, geometry, substance, value_kg_y)``.
    Layers containing none of the requested substances are skipped
    (zurich/__init__.py:96-100); ``rename`` maps file spellings to
    emiproc names (Emission_Benzol → benzene, zurich/__init__.py:78-81).
    """
    rename = {"Benzol": "benzene"} if rename is None else rename
    layers = categories or list_layers(path)
    out: DataFrame | None = None
    for layer in layers:
        _, cols, _ = _layer_meta(path, layer)
        emis = [n for n, _ in cols if n.startswith(emission_prefix)]
        sub_of = {
            n: rename.get(n[len(emission_prefix):], n[len(emission_prefix):])
            for n in emis
        }
        if substances is not None:
            sub_of = {n: s for n, s in sub_of.items() if s in substances}
        if not sub_of:
            continue
        df = read_gpkg_layer(spark, path, layer)
        if convert_lines_to_polygons and any(
            n in ("Shape_Length", "SHAPE_Length") for n, _ in cols
        ):
            df = lines_to_polygons(df, line_width)
        stack = ", ".join(
            f"'{s}', CAST(`{n}` AS DOUBLE)" for n, s in sub_of.items()
        )
        long = df.selectExpr(
            f"'{layer}' AS category",
            "fid AS source_id",
            "geometry",
            f"stack({len(sub_of)}, {stack}) AS (substance, value_kg_y)",
        ).where(F.col("value_kg_y").isNotNull())
        out = long if out is None else out.unionByName(long)
    if out is None:
        raise ValueError(f"no layers with {emission_prefix}* columns in {path}")
    return out


# ======================================================================
# Export
# ======================================================================
_GPKG_DDL = [
    """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""",
    """CREATE TABLE IF NOT EXISTS gpkg_contents (
        table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
        min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
        srs_id INTEGER)""",
    """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
        table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL)""",
]

_SRS_ROWS = [
    ("Undefined Cartesian", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic", 0, "NONE", 0, "undefined", None),
    (
        "WGS 84", 4326, "EPSG", 4326,
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
        None,
    ),
]

_SPARK_TO_SQLITE = {
    "bigint": "INTEGER", "int": "INTEGER", "smallint": "INTEGER",
    "tinyint": "INTEGER", "boolean": "INTEGER",
    "double": "REAL", "float": "REAL", "string": "TEXT", "binary": "BLOB",
}


def export_to_geopackage(
    layers: dict[str, DataFrame],
    path: str,
    srs_id: int = 4326,
    geometry_col: str = "geometry",
) -> str:
    """Write feature layers into one GeoPackage file (reference
    export_to_geopackage, exports/geopackage.py:9-55: one layer per
    shaped category plus the gridded layer).

    Each DataFrame needs a WKB ``geometry`` column; all other columns
    become typed attributes.  Envelopes for ``gpkg_contents`` come from
    a distributed bounds pass; rows stream to SQLite via
    ``toLocalIterator`` so the driver never holds a full layer.
    """
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")
        for ddl in _GPKG_DDL:
            con.execute(ddl)
        con.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            _SRS_ROWS,
        )
        for name, df in layers.items():
            attrs = [
                (f.name, _SPARK_TO_SQLITE.get(f.dataType.simpleString(), "TEXT"))
                for f in df.schema.fields
                if f.name != geometry_col
            ]
            col_ddl = ", ".join(f'"{n}" {t}' for n, t in attrs)
            con.execute(
                f'CREATE TABLE "{name}" '
                f'(fid INTEGER PRIMARY KEY AUTOINCREMENT, "{geometry_col}" BLOB'
                f'{", " if col_ddl else ""}{col_ddl})'
            )
            # envelope: distributed bounds over WKB coordinate bytes is
            # overkill for dimension-sized layers — derive from the WKB
            # per batch while streaming
            minx = miny = float("inf")
            maxx = maxy = float("-inf")
            names = [n for n, _ in attrs]
            ph = ", ".join(["?"] * (1 + len(names)))
            ins = (
                f'INSERT INTO "{name}" ("{geometry_col}"'
                f'{", " if names else ""}{", ".join(chr(34) + n + chr(34) for n in names)})'
                f" VALUES ({ph})"
            )
            for row in df.toLocalIterator():
                wkb = row[geometry_col]
                blob = None
                if wkb is not None:
                    wkb = bytes(wkb)
                    _, rings = geom.parse_wkb(wkb)
                    for r in rings:
                        if len(r):
                            minx = min(minx, float(np.min(r[:, 0])))
                            miny = min(miny, float(np.min(r[:, 1])))
                            maxx = max(maxx, float(np.max(r[:, 0])))
                            maxy = max(maxy, float(np.max(r[:, 1])))
                    blob = wkb_to_gpkg(wkb, srs_id)
                con.execute(ins, (blob, *[row[n] for n in names]))
            if minx > maxx:
                minx = miny = maxx = maxy = None
            con.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
                " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
                (name, "features", name, minx, miny, maxx, maxy, srs_id),
            )
            con.execute(
                "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (name, geometry_col, "GEOMETRY", srs_id),
            )
        con.commit()
    finally:
        con.close()
    return path
