"""Pure-numpy ESRI Shapefile (.shp/.dbf) codec → regions table.

The reference's country/timezone masks start from downloaded shapefiles
(Natural Earth via ``get_natural_earth``, timezone-boundary-builder via
``get_timezones`` — emiproc/utilities.py:103-314) read with
geopandas/fiona.  The shapefile format is a small public spec (ESRI
whitepaper, 1998): a fixed 100-byte header plus typed records in the
``.shp``, fixed-width attribute rows in the dBase-III ``.dbf``.  This
module implements exactly the subset those datasets use — point (1),
polyline (3), polygon (5) shapes; C/N/F/L attribute fields — and
converts features into the ``(region_key, <label>, geometry WKB,
xmin..ymax, area)`` table that :mod:`emiproc_spark.operators.masks`
consumes.

Scale: reference-data shapefiles are dimension-sized (hundreds of
polygons), so the parse is a driver-side read feeding
``createDataFrame``; the heavy work — the cell×region overlay — stays
in the distributed tile join.

Divergence (documented): multi-ring polygon records keep all rings in
one WKB polygon without classifying CW outer / CCW hole rings; the
batched clip kernel treats every ring additively, so regions with
enclave holes over-count by the hole area.  Natural Earth country and
tz polygons are effectively hole-free at the resolutions used.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from emiproc_spark.functions import geometry as geom

SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON = 0, 1, 3, 5


def read_shp(buf: bytes) -> list[tuple[int, list[np.ndarray]]]:
    """Parse a .shp file: [(shape_type, [part arrays (n, 2)])]."""
    code, = struct.unpack(">i", buf[0:4])
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    flen_words, = struct.unpack(">i", buf[24:28])
    end = flen_words * 2
    shapes = []
    off = 100
    while off < end:
        _, clen = struct.unpack(">ii", buf[off:off + 8])
        off += 8
        stype, = struct.unpack("<i", buf[off:off + 4])
        if stype == SHP_NULL:
            shapes.append((SHP_NULL, []))
        elif stype == SHP_POINT:
            x, y = struct.unpack("<2d", buf[off + 4:off + 20])
            shapes.append((SHP_POINT, [np.array([[x, y]])]))
        elif stype in (SHP_POLYLINE, SHP_POLYGON):
            nparts, npoints = struct.unpack("<2i", buf[off + 36:off + 44])
            p0 = off + 44
            parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=p0)
            pts = np.frombuffer(
                buf, dtype="<f8", count=npoints * 2, offset=p0 + 4 * nparts
            ).reshape(-1, 2)
            bounds = list(parts) + [npoints]
            shapes.append(
                (stype, [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)])
            )
        else:
            raise NotImplementedError(f"shape type {stype} not supported")
        off += clen * 2
    return shapes


def read_dbf(buf: bytes) -> pd.DataFrame:
    """Parse a dBase-III .dbf attribute table."""
    nrec, = struct.unpack("<I", buf[4:8])
    hsize, rsize = struct.unpack("<2H", buf[8:12])
    fields = []
    off = 32
    while off < hsize - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    cols: dict[str, list] = {n: [] for n, _, _ in fields}
    off = hsize
    for _ in range(nrec):
        rec = buf[off:off + rsize]
        off += rsize
        if rec[:1] == b"*":  # deleted row
            continue
        pos = 1
        for name, ftype, flen in fields:
            raw = rec[pos:pos + flen]
            pos += flen
            txt = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                cols[name].append(float(txt) if txt not in ("", "*" * flen) else None)
            elif ftype == "L":
                cols[name].append(txt in ("Y", "y", "T", "t"))
            else:
                cols[name].append(txt)
    return pd.DataFrame(cols)


def _shape_to_wkb(stype: int, parts: list[np.ndarray]) -> bytes | None:
    if stype == SHP_POINT:
        x, y = parts[0][0]
        return geom.wkb_point(float(x), float(y))
    if stype == SHP_POLYLINE:
        return geom.wkb_linestring([tuple(p) for p in parts[0]])
    if stype == SHP_POLYGON:
        # multi-ring polygon WKB: byte order, type 3, nrings, rings
        out = [struct.pack("<BII", 1, 3, len(parts))]
        for ring in parts:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) and not (r[0] == r[-1]).all():
                r = np.vstack([r, r[:1]])
            out.append(struct.pack("<I", len(r)))
            out.append(r.astype("<f8").tobytes())
        return b"".join(out)
    return None


def shapefile_to_regions(
    spark: SparkSession,
    shp_path: str,
    label_field: str,
    region_col: str = "country",
    dbf_path: str | None = None,
) -> DataFrame:
    """Shapefile → masks-ready regions table ``(region_key, <region_col>,
    geometry, xmin, ymin, xmax, ymax, area)``.

    ``label_field``: the .dbf column carrying the region label (e.g.
    ``ISO_A3`` for Natural Earth countries, ``tzid`` for
    timezone-boundary-builder — reference utilities.py:263-314,
    205-260).  ``region_key`` is the 0-based feature index.
    """
    if dbf_path is None:
        dbf_path = shp_path[: -len(".shp")] + ".dbf" if shp_path.endswith(".shp") else shp_path + ".dbf"
    with open(shp_path, "rb") as f:
        shapes = read_shp(f.read())
    with open(dbf_path, "rb") as f:
        attrs = read_dbf(f.read())
    if label_field not in attrs.columns:
        raise ValueError(
            f"field {label_field!r} not in .dbf columns {list(attrs.columns)}"
        )
    rows = []
    for i, (stype, parts) in enumerate(shapes):
        if stype != SHP_POLYGON or not parts:
            continue
        wkb = _shape_to_wkb(stype, parts)
        allpts = np.vstack(parts)
        area = float(sum(geom.shoelace_area(np.asarray(p)) for p in parts))
        rows.append(
            {
                "region_key": i,
                region_col: str(attrs[label_field].iloc[i]),
                "geometry": bytearray(wkb),
                "xmin": float(allpts[:, 0].min()),
                "ymin": float(allpts[:, 1].min()),
                "xmax": float(allpts[:, 0].max()),
                "ymax": float(allpts[:, 1].max()),
                "area": area,
            }
        )
    if not rows:
        raise ValueError(f"no polygon features in {shp_path}")
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema=(
            f"region_key long, {region_col} string, geometry binary, "
            "xmin double, ymin double, xmax double, ymax double, area double"
        ),
    )


# ------------------------------------------------ cached reference data
def _files_dir(files_dir: str | None) -> str:
    import os

    return files_dir or os.environ.get(
        "EMIPROC_SPARK_FILES_DIR",
        os.path.join(os.path.expanduser("~"), ".emiproc_spark_files"),
    )


def _ensure_extracted(
    dest_dir: str,
    shp_name: str,
    archive: str | None,
    download_url: str | None,
    what: str,
) -> str:
    """Cache-or-populate a reference shapefile directory (the engine
    analogue of the reference's FILES_DIR caching + FileLock download,
    utilities.py:129-143,263-303).  Cache hit = the .shp already
    extracted under ``dest_dir``; otherwise populate from ``archive``
    (a pre-downloaded .zip — the offline path) or, with a URL given,
    download it (network-bound by design; untested in this repo's CI).
    Extraction goes to a temp sibling then renames into place, so a
    concurrent or killed populate never leaves a half cache."""
    import os
    import shutil
    import tempfile
    import zipfile

    shp = os.path.join(dest_dir, shp_name)
    if os.path.exists(shp):
        return shp  # cache hit: no archive/network touched
    if archive is not None:
        with open(archive, "rb") as f:
            payload = f.read()
    elif download_url is not None:
        from urllib.request import urlopen

        with urlopen(download_url) as resp:
            payload = resp.read()
    else:
        raise FileNotFoundError(
            f"{what}: {shp} is not cached; pass archive=<pre-downloaded "
            ".zip> (offline path) or download=True (needs network)"
        )
    os.makedirs(os.path.dirname(dest_dir) or ".", exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".extract_", dir=os.path.dirname(dest_dir) or ".")
    try:
        import io

        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for member in zf.namelist():
                # no path traversal out of the cache dir (prefix check
                # must include the separator — "/cache/x" is not inside
                # "/cache/" just because it starts with "/cache")
                target = os.path.normpath(os.path.join(tmp, member))
                root = os.path.normpath(tmp)
                if target != root and not target.startswith(root + os.sep):
                    raise ValueError(f"{what}: archive member escapes dir: {member}")
            zf.extractall(tmp)
        try:
            os.replace(tmp, dest_dir)
        except OSError:
            # dest_dir appeared (concurrent populate won the race) or a
            # stale half-cache exists.  Never rmtree a directory another
            # process may be reading: if the shapefile is now there, use
            # it; otherwise surface the stale cache to the operator.
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(shp):
                raise FileNotFoundError(
                    f"{what}: {dest_dir} exists but lacks {shp_name} "
                    "(stale or concurrent half-populated cache) — remove "
                    "the directory and retry"
                ) from None
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if not os.path.exists(shp):
        raise FileNotFoundError(f"{what}: archive did not contain {shp_name}")
    return shp


def get_natural_earth(
    spark: SparkSession,
    resolution: str = "10m",
    category: str = "cultural",
    name: str = "admin_0_countries",
    label_field: str = "ISO_A3",
    region_col: str = "country",
    files_dir: str | None = None,
    archive: str | None = None,
    download: bool = False,
) -> DataFrame:
    """Natural Earth shapefile → regions table, with the reference's
    cache layout (``<files>/natural_earth/ne_{res}_{cat}_{name}``,
    utilities.py:263-314).  Offline-first: a pre-downloaded release
    ``.zip`` passes via ``archive``; ``download=True`` fetches the
    public S3 URL the reference uses."""
    import os

    dest = os.path.join(
        _files_dir(files_dir), "natural_earth", f"ne_{resolution}_{category}_{name}"
    )
    url = (
        f"https://naturalearth.s3.amazonaws.com/{resolution}_{category}/"
        f"ne_{resolution}_{name}.zip"
        if download
        else None
    )
    shp = _ensure_extracted(
        dest, f"ne_{resolution}_{name}.shp", archive, url, "get_natural_earth"
    )
    return shapefile_to_regions(spark, shp, label_field, region_col)


def get_timezones(
    spark: SparkSession,
    version: str = "latest",
    label_field: str = "tzid",
    region_col: str = "tzid",
    files_dir: str | None = None,
    archive: str | None = None,
    download: bool = False,
) -> DataFrame:
    """timezone-boundary-builder shapefile → regions table, with the
    reference's cache layout (``<files>/timezones/<version>``,
    utilities.py:103-183).  ``archive``: a pre-downloaded
    ``timezones-with-oceans.shapefile.zip`` release asset;
    ``download=True`` fetches the pinned GitHub release (``version``
    must then name a release tag, not ``latest``)."""
    import os

    dest = os.path.join(_files_dir(files_dir), "timezones", version)
    url = None
    cached = os.path.exists(os.path.join(dest, "combined-shapefile-with-oceans.shp"))
    if download and not cached:
        if version == "latest":
            raise ValueError(
                "get_timezones(download=True) needs an explicit release "
                "tag as version= (resolving 'latest' needs the GitHub API)"
            )
        url = (
            "https://github.com/evansiroky/timezone-boundary-builder/"
            f"releases/download/{version}/timezones-with-oceans.shapefile.zip"
        )
    shp = _ensure_extracted(
        dest, "combined-shapefile-with-oceans.shp", archive, url, "get_timezones"
    )
    return shapefile_to_regions(spark, shp, label_field, region_col)


# ----------------------------------------------------------------- write
def write_shapefile(
    path_base: str,
    polygons: list[list[np.ndarray]],
    attrs: pd.DataFrame,
) -> tuple[str, str]:
    """Minimal polygon shapefile writer (tests / fixture generation):
    ``polygons`` = per-feature ring lists; ``attrs`` = one row per
    feature (C/N fields inferred).  Returns (.shp path, .dbf path)."""
    recs = []
    gxmin = gymin = np.inf
    gxmax = gymax = -np.inf
    for rings in polygons:
        rings = [
            np.vstack([r, r[:1]]) if not (r[0] == r[-1]).all() else np.asarray(r)
            for r in (np.asarray(r, dtype=np.float64) for r in rings)
        ]
        allp = np.vstack(rings)
        xmin, ymin = allp.min(axis=0)
        xmax, ymax = allp.max(axis=0)
        gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
        gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
        npoints = sum(len(r) for r in rings)
        content = struct.pack(
            "<i4d2i", SHP_POLYGON, xmin, ymin, xmax, ymax, len(rings), npoints
        )
        idx = 0
        for r in rings:
            content += struct.pack("<i", idx)
            idx += len(r)
        for r in rings:
            content += r.astype("<f8").tobytes()
        recs.append(content)

    shp = path_base + ".shp"
    body = b""
    for i, c in enumerate(recs):
        body += struct.pack(">ii", i + 1, len(c) // 2) + c
    flen = (100 + len(body)) // 2
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(
        ">i", flen
    ) + struct.pack("<2i", 1000, SHP_POLYGON) + struct.pack(
        "<4d", gxmin, gymin, gxmax, gymax
    ) + struct.pack("<4d", 0, 0, 0, 0)
    with open(shp, "wb") as f:
        f.write(header + body)

    dbf = path_base + ".dbf"
    fields = []
    for col in attrs.columns:
        if attrs[col].dtype.kind in "if":
            fields.append((col, "N", 18, 6))
        else:
            flen = max(1, int(attrs[col].astype(str).str.len().max()))
            fields.append((col, "C", min(flen, 254), 0))
    hsize = 32 + 32 * len(fields) + 1
    rsize = 1 + sum(f[2] for f in fields)
    out = bytearray()
    out += struct.pack("<4B I 2H 20x", 3, 24, 1, 1, len(attrs), hsize, rsize)
    for name, ftype, flen, dec in fields:
        out += struct.pack(
            "<11s c 4x B B 14x", name.encode("ascii")[:11], ftype.encode(), flen, dec
        )
    out += b"\x0d"
    for _, row in attrs.iterrows():
        out += b" "
        for name, ftype, flen, dec in fields:
            if ftype == "N":
                txt = f"{float(row[name]):.{dec}f}".rjust(flen)[:flen]
            else:
                txt = str(row[name]).ljust(flen)[:flen]
            out += txt.encode("latin-1")
    out += b"\x1a"
    with open(dbf, "wb") as f:
        f.write(bytes(out))
    return shp, dbf
