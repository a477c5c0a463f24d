"""CRS reconciliation for the overlay operators.

The reference reprojects the destination grid into the inventory's CRS
before any overlay (emiproc/regrid.py:473-483) and raises when the
inventory has no CRS but the grid does (regrid.py:478-483).  This
module provides the same contract without pyproj:

- :func:`reconcile_crs` — the decision logic: same CRS → no-op;
  different CRS → a registered/supplied coordinate transform, else a
  loud error;
- :func:`transform_geometries` — apply a vectorized (x, y) → (x', y')
  transform to WKB geometry + bbox columns inside ``mapInPandas``;
- built-in transforms for the pair the reference uses most:
  WGS84 (EPSG:4326) ↔ LV95 (EPSG:2056), using swisstopo's published
  approximation formulas ("Formulas and constants for the calculation
  of the Swiss conformal cylindrical projection", swisstopo 2016 —
  accurate to ~1 m, the documented precision of that approximation).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from emiproc_spark.functions import geometry as geom

WGS84 = "EPSG:4326"
LV95 = "EPSG:2056"

Transform = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]


def wgs84_to_lv95(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Swisstopo approximate formulas, WGS84 → LV95 (E, N)."""
    phi = (np.asarray(lat, dtype=np.float64) * 3600.0 - 169028.66) / 10000.0
    lam = (np.asarray(lon, dtype=np.float64) * 3600.0 - 26782.5) / 10000.0
    e = (
        2600072.37
        + 211455.93 * lam
        - 10938.51 * lam * phi
        - 0.36 * lam * phi**2
        - 44.54 * lam**3
    )
    n = (
        1200147.07
        + 308807.95 * phi
        + 3745.25 * lam**2
        + 76.63 * phi**2
        - 194.56 * lam**2 * phi
        + 119.79 * phi**3
    )
    return e, n


def lv95_to_wgs84(e: np.ndarray, n: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Swisstopo approximate formulas, LV95 (E, N) → WGS84 (lon, lat)."""
    y = (np.asarray(e, dtype=np.float64) - 2600000.0) / 1e6
    x = (np.asarray(n, dtype=np.float64) - 1200000.0) / 1e6
    lam = (
        2.6779094
        + 4.728982 * y
        + 0.791484 * y * x
        + 0.1306 * y * x**2
        - 0.0436 * y**3
    )
    phi = (
        16.9023892
        + 3.238272 * x
        - 0.270978 * y**2
        - 0.002528 * x**2
        - 0.0447 * y**2 * x
        - 0.0140 * x**3
    )
    return lam * 100.0 / 36.0, phi * 100.0 / 36.0


TRANSFORMS: dict[tuple[str, str], Transform] = {
    (WGS84, LV95): wgs84_to_lv95,
    (LV95, WGS84): lv95_to_wgs84,
}


def reconcile_crs(
    data_crs: str | None,
    grid_crs: str | None,
    transformer: Transform | None = None,
) -> Transform | None:
    """Decide how to bring a grid into the data's CRS before overlay
    (reference regrid.py:473-483).

    Returns None for a no-op, a transform callable otherwise.  Raises
    when the data has no CRS but the grid does (the reference's exact
    error case), or when no transform is known for the pair.
    """
    if data_crs is None:
        if grid_crs is not None:
            raise ValueError(
                "The inventory given has no crs, but the grid has. "
                "Assign a crs to the inventory before remapping."
            )
        return None
    if grid_crs is None or grid_crs == data_crs:
        return None
    if transformer is not None:
        return transformer
    key = (grid_crs, data_crs)
    if key in TRANSFORMS:
        return TRANSFORMS[key]
    raise ValueError(
        f"No coordinate transform registered for {grid_crs} → {data_crs}; "
        "pass `transformer=` or add it to functions.crs.TRANSFORMS"
    )


def transform_geometries(
    df: DataFrame,
    transform: Transform,
    geometry_col: str = "geometry",
) -> DataFrame:
    """Apply an (x, y) → (x', y') transform to WKB geometries,
    recomputing bbox columns when present.  Vectorized per Arrow batch —
    the coordinate math runs once over a stacked array of every vertex
    in the batch."""
    cols = df.columns
    schema = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            parsed = [geom.parse_wkb(bytes(b)) for b in pdf[geometry_col]]
            # stack every vertex, transform once, then re-slice
            ring_shapes = [[len(r) for r in rings] for _, rings in parsed]
            allpts = (
                np.vstack([r for _, rings in parsed for r in rings])
                if parsed
                else np.empty((0, 2))
            )
            tx, ty = transform(allpts[:, 0], allpts[:, 1])
            allpts = np.column_stack([tx, ty])
            geoms, bbox = [], []
            off = 0
            for (gtype, _), sizes in zip(parsed, ring_shapes):
                rings = []
                for s in sizes:
                    rings.append(allpts[off:off + s])
                    off += s
                if gtype == geom.WKB_POINT:
                    wkb = geom.wkb_point(*rings[0][0])
                elif gtype == geom.WKB_LINESTRING:
                    wkb = geom.wkb_linestring([tuple(p) for p in rings[0]])
                else:
                    out = [_struct.pack("<BII", 1, 3, len(rings))]
                    for r in rings:
                        if len(r) and not (r[0] == r[-1]).all():
                            r = np.vstack([r, r[:1]])
                        out.append(_struct.pack("<I", len(r)))
                        out.append(np.asarray(r, dtype="<f8").tobytes())
                    wkb = b"".join(out)
                pts = np.vstack(rings)
                geoms.append(wkb)
                bbox.append(
                    (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
                )
            pdf = pdf.copy()
            pdf[geometry_col] = pd.Series(geoms, index=pdf.index, dtype=object)
            for i, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
                if name in cols:
                    pdf[name] = [b[i] for b in bbox]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def transform_columns(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    x_col: str = "lon",
    y_col: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    """Apply a registered CRS transform to plain coordinate columns —
    the column-level sibling of :func:`transform_geometries` for tables
    that carry (lon, lat) rather than WKB.  Arrow-vectorized pandas UDF,
    map-only."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    keep = [c for c in df.columns if c not in (out_x, out_y)]
    if src_crs == dst_crs:  # identity, like reconcile_crs's None
        return df.select(
            *keep, F.col(x_col).alias(out_x), F.col(y_col).alias(out_y)
        )
    key = (src_crs, dst_crs)
    if key not in TRANSFORMS:
        raise ValueError(f"No coordinate transform registered for {key}")
    fn = TRANSFORMS[key]

    @pandas_udf("x double, y double")
    def _tx(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        e, n = fn(x.to_numpy(np.float64), y.to_numpy(np.float64))
        return pd.DataFrame({"x": e, "y": n})

    out = df.withColumn("__xy", _tx(F.col(x_col), F.col(y_col)))
    # colliding input columns are replaced, not duplicated (a second
    # "x" column would make every downstream reference ambiguous)
    return out.select(
        *keep,
        F.col("__xy.x").alias(out_x),
        F.col("__xy.y").alias(out_y),
    )
