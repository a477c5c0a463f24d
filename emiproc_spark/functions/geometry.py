"""Pure-numpy planar geometry kernel.

The reference leans on shapely/geopandas for intersection areas
(``emiproc/regrid.py:232-301``).  Neither is available here, and at 100 TB
the geometry refine step runs inside Arrow pandas UDFs anyway — so this
module implements the minimal computational geometry the engine needs,
dependency-free:

- WKB encode/decode for Point / LineString / Polygon / MultiPolygon
- shoelace area
- Sutherland–Hodgman polygon clipping against a *convex* clip polygon
  (grid cells are rectangles/triangles ⇒ always convex)
- Liang–Barsky segment clipping for line-length weights

All functions operate on plain ``list[tuple[float, float]]`` rings or
numpy arrays; they are called per-row inside pandas UDFs, batched by
Arrow.
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np

# WKB geometry type codes (little-endian, OGC 99-049)
WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6


# ---------------------------------------------------------------- WKB IO
def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def wkb_linestring(coords: Iterable[tuple[float, float]]) -> bytes:
    pts = list(coords)
    out = [struct.pack("<BII", 1, WKB_LINESTRING, len(pts))]
    out += [struct.pack("<dd", x, y) for x, y in pts]
    return b"".join(out)


def wkb_polygon(ring: Iterable[tuple[float, float]]) -> bytes:
    """Single-ring polygon; ring auto-closed."""
    pts = list(ring)
    if pts[0] != pts[-1]:
        pts = pts + [pts[0]]
    out = [struct.pack("<BIII", 1, WKB_POLYGON, 1, len(pts))]
    out += [struct.pack("<dd", x, y) for x, y in pts]
    return b"".join(out)


def wkb_box(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return wkb_polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)])


def parse_wkb(buf: bytes) -> tuple[int, list[np.ndarray]]:
    """Return (geom_type, rings).

    Point -> [array([[x, y]])]; LineString -> [array Nx2];
    Polygon -> [exterior, hole...]; MultiPolygon -> list of exteriors
    (holes ignored — grids/sources in scope have none).
    """
    geom_type, off = _hdr(buf, 0)
    if geom_type == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return WKB_POINT, [np.array([[x, y]])]
    if geom_type == WKB_LINESTRING:
        n = struct.unpack_from("<I", buf, off)[0]
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off + 4)
        return WKB_LINESTRING, [arr.reshape(n, 2)]
    if geom_type == WKB_POLYGON:
        rings, _ = _parse_polygon_body(buf, off)
        return WKB_POLYGON, rings
    if geom_type == WKB_MULTIPOLYGON:
        nparts = struct.unpack_from("<I", buf, off)[0]
        off += 4
        rings: list[np.ndarray] = []
        for _ in range(nparts):
            _, off = _hdr(buf, off)
            part_rings, off = _parse_polygon_body(buf, off)
            rings.append(part_rings[0])  # exterior only
        return WKB_MULTIPOLYGON, rings
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def _hdr(buf: bytes, off: int) -> tuple[int, int]:
    byte_order = buf[off]
    fmt = "<I" if byte_order == 1 else ">I"
    geom_type = struct.unpack_from(fmt, buf, off + 1)[0] & 0xFF
    return geom_type, off + 5


def _parse_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    nrings = struct.unpack_from("<I", buf, off)[0]
    off += 4
    rings = []
    for _ in range(nrings):
        n = struct.unpack_from("<I", buf, off)[0]
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off)
        rings.append(arr.reshape(n, 2))
        off += 16 * n
    return rings, off


# ------------------------------------------------------------- predicates
def bounds(coords: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(coords[:, 0].min()),
        float(coords[:, 1].min()),
        float(coords[:, 0].max()),
        float(coords[:, 1].max()),
    )


def shoelace_area(ring: np.ndarray) -> float:
    """Absolute polygon area (ring closed or open)."""
    x, y = ring[:, 0], ring[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` ring by *convex* ``clip`` ring.

    Returns the clipped ring (possibly empty).  Clip ring must be
    counter-clockwise; callers use :func:`ensure_ccw`.
    """
    output = [tuple(p) for p in subject]
    if output and output[0] == output[-1]:
        output = output[:-1]
    clip_pts = [tuple(p) for p in clip]
    if clip_pts[0] == clip_pts[-1]:
        clip_pts = clip_pts[:-1]
    for i in range(len(clip_pts)):
        if not output:
            break
        ax, ay = clip_pts[i]
        bx, by = clip_pts[(i + 1) % len(clip_pts)]
        ex, ey = bx - ax, by - ay
        input_pts = output
        output = []
        for j in range(len(input_pts)):
            px, py = input_pts[j - 1]
            cx, cy = input_pts[j]
            # signed side of the clip edge (>=0 is inside for CCW clip)
            prev_in = ex * (py - ay) - ey * (px - ax) >= 0
            cur_in = ex * (cy - ay) - ey * (cx - ax) >= 0
            if cur_in:
                if not prev_in:
                    output.append(_isect(px, py, cx, cy, ax, ay, bx, by))
                output.append((cx, cy))
            elif prev_in:
                output.append(_isect(px, py, cx, cy, ax, ay, bx, by))
    return np.array(output) if output else np.empty((0, 2))


def _isect(px, py, cx, cy, ax, ay, bx, by):
    """Intersection of segment (p,c) with infinite line (a,b)."""
    dx, dy = cx - px, cy - py
    ex, ey = bx - ax, by - ay
    denom = ex * dy - ey * dx
    if denom == 0.0:
        return (cx, cy)
    t = (ex * (ay - py) - ey * (ax - px)) / denom
    return (px + t * dx, py + t * dy)


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    x, y = ring[:, 0], ring[:, 1]
    signed = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return ring if signed >= 0 else ring[::-1]


def intersection_area(subject_rings: list[np.ndarray], clip_ring: np.ndarray) -> float:
    """Area of (possibly multi-part) subject ∩ convex clip ring."""
    clip_ccw = ensure_ccw(clip_ring)
    total = 0.0
    for ring in subject_rings:
        clipped = clip_polygon_convex(ring, clip_ccw)
        if len(clipped) >= 3:
            total += shoelace_area(clipped)
    return total


def clipped_line_length(coords: np.ndarray, xmin, ymin, xmax, ymax) -> float:
    """Total length of a polyline inside an axis-aligned box (Liang–Barsky)."""
    total = 0.0
    for i in range(len(coords) - 1):
        x0, y0 = coords[i]
        x1, y1 = coords[i + 1]
        t0, t1 = 0.0, 1.0
        dx, dy = x1 - x0, y1 - y0
        ok = True
        for p, q in (
            (-dx, x0 - xmin),
            (dx, xmax - x0),
            (-dy, y0 - ymin),
            (dy, ymax - y0),
        ):
            if p == 0.0:
                if q < 0:
                    ok = False
                    break
            else:
                r = q / p
                if p < 0:
                    t0 = max(t0, r)
                else:
                    t1 = min(t1, r)
                if t0 > t1:
                    ok = False
                    break
        if ok and t1 > t0:
            seg = ((dx * (t1 - t0)) ** 2 + (dy * (t1 - t0)) ** 2) ** 0.5
            total += seg
    return total


def line_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def point_in_box(x, y, xmin, ymin, xmax, ymax) -> bool:
    """Inclusive containment — a point on a shared edge/corner matches
    every adjacent cell; the caller splits weight 1/n across matches
    (reference emiproc/regrid.py:277-285)."""
    return xmin <= x <= xmax and ymin <= y <= ymax
