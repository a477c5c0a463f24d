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
    return wkb_polygon_rings([list(ring)])


def wkb_polygon_rings(rings: Iterable[Iterable[tuple[float, float]]]) -> bytes:
    """Polygon with exterior + optional interior (hole) rings, each
    auto-closed — ring 0 is the exterior per WKB convention."""
    closed = []
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts = pts + [pts[0]]
        closed.append(pts)
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(closed))]
    for pts in closed:
        out.append(struct.pack("<I", len(pts)))
        out += [struct.pack("<dd", x, y) for x, y in pts]
    return b"".join(out)


def wkb_box(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return wkb_polygon([(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)])


def wkb_multipolygon(parts: list[np.ndarray]) -> bytes:
    """MULTIPOLYGON WKB from a list of exterior rings (one single-ring
    polygon per part; auto-closed).  The encoder the antimeridian split
    emits — keeping WKB layout knowledge in this module."""
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(parts))]
    for ring in parts:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and not (r[0] == r[-1]).all():
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<BII", 1, WKB_POLYGON, 1))
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def parse_wkb(buf: bytes) -> tuple[int, list[np.ndarray]]:
    """Return (geom_type, rings).

    Point -> [array([[x, y]])]; LineString -> [array Nx2];
    Polygon -> [exterior, hole...] in WKB ring order (callers that
    measure area must SUBTRACT rings[1:], see weights_poly_rect);
    MultiPolygon -> one exterior per part (part holes dropped —
    grids/sources in scope have none).
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
    if byte_order != 1:
        # the body parsers below read counts/coordinates little-endian;
        # half-parsing a big-endian buffer would yield byte-swapped
        # garbage coordinates with no error — reject it loudly instead
        raise ValueError(
            "big-endian WKB (byte order 0) is not supported — re-export "
            "the source as little-endian (NDR) WKB"
        )
    geom_type = struct.unpack_from("<I", buf, off + 1)[0] & 0xFF
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


# ====================================================================
# Batched kernels: one numpy pass over an entire Arrow batch of
# (subject, clip) pairs — no per-pair Python loop.
#
# The half-plane pass uses the projection-with-crossing-insertion
# variant of Sutherland–Hodgman: outside vertices are projected onto
# the clip line and crossings inserted at sign changes.  The projected
# excursions run *along* the clip line, so they enclose zero area, and
# they remain collinear (hence still zero-area) under every subsequent
# half-plane of a convex clip — the polygon areas after all passes are
# exactly the clip-intersection areas, with vertex counts bounded by
# 2·V per pass instead of ragged reallocation.
# ====================================================================
def stack_rings(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pad open rings to a dense (B, Vmax, 2) stack + per-row counts.
    Closing duplicate vertices are dropped."""
    opened = []
    for r in rings:
        if len(r) > 1 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
            r = r[:-1]
        opened.append(np.asarray(r, dtype=np.float64))
    counts = np.array([len(r) for r in opened], dtype=np.int64)
    vmax = int(counts.max()) if len(counts) else 0
    out = np.zeros((len(opened), vmax, 2))
    for i, r in enumerate(opened):
        out[i, : len(r)] = r
    return out, counts


def batch_shoelace(P: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Absolute areas of a padded ring stack, vectorized."""
    B, V, _ = P.shape
    if V == 0:
        return np.zeros(B)
    j = np.arange(V)
    valid = j[None, :] < counts[:, None]
    nxt = (j[None, :] + 1) % np.maximum(counts[:, None], 1)
    Pn = np.take_along_axis(P, np.broadcast_to(nxt[..., None], P.shape), axis=1)
    cross = P[:, :, 0] * Pn[:, :, 1] - Pn[:, :, 0] * P[:, :, 1]
    return np.abs(np.sum(np.where(valid, cross, 0.0), axis=1)) / 2.0


def batch_halfplane_clip(
    P: np.ndarray,
    counts: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    ex: np.ndarray,
    ey: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """One half-plane pass over the whole stack.

    Per row the clip line passes through ``(ax, ay)`` with direction
    ``(ex, ey)``; inside is the left side (``e × (p − a) ≥ 0``).  Rows
    with ``e = 0`` are untouched (no-op pass).  Returns the new stack
    and counts (grown by the number of inserted crossings).
    """
    B, V, _ = P.shape
    if V == 0:
        return P, counts
    j = np.arange(V)
    valid = j[None, :] < counts[:, None]
    nxt_i = (j[None, :] + 1) % np.maximum(counts[:, None], 1)
    Pn = np.take_along_axis(P, np.broadcast_to(nxt_i[..., None], P.shape), axis=1)

    rx, ry = P[:, :, 0] - ax[:, None], P[:, :, 1] - ay[:, None]
    rnx, rny = Pn[:, :, 0] - ax[:, None], Pn[:, :, 1] - ay[:, None]
    s_cur = ex[:, None] * ry - ey[:, None] * rx
    s_nxt = ex[:, None] * rny - ey[:, None] * rnx

    noop = (ex == 0.0) & (ey == 0.0)
    in_cur = (s_cur >= 0.0) | noop[:, None]
    in_nxt = (s_nxt >= 0.0) | noop[:, None]
    crossed = (in_cur != in_nxt) & valid
    denom = s_cur - s_nxt
    t = np.divide(s_cur, denom, out=np.zeros_like(s_cur), where=denom != 0.0)
    Xc = P + t[..., None] * (Pn - P)

    # projection of the next vertex onto the clip line where outside
    ee = ex * ex + ey * ey
    dot = np.divide(
        rnx * ex[:, None] + rny * ey[:, None],
        ee[:, None],
        out=np.zeros_like(rnx),
        where=ee[:, None] != 0.0,
    )
    proj = np.stack(
        (ax[:, None] + dot * ex[:, None], ay[:, None] + dot * ey[:, None]), axis=-1
    )
    new_next = np.where(in_nxt[..., None], Pn, proj)

    ncross = crossed.sum(axis=1)
    maxc = int(ncross.max()) if B else 0
    Vout = V + maxc + 1  # last slot is a write sink for masked entries
    out = np.zeros((B, Vout, 2))
    shift = np.cumsum(crossed, axis=1)
    trash = Vout - 1
    pos_next = np.where(valid, j[None, :] + shift, trash)
    pos_cross = np.where(crossed, j[None, :] + shift - 1, trash)
    np.put_along_axis(out, np.broadcast_to(pos_next[..., None], new_next.shape), new_next, axis=1)
    np.put_along_axis(out, np.broadcast_to(pos_cross[..., None], Xc.shape), Xc, axis=1)
    return out, counts + ncross


def _axis_halfplane_clip(
    X: np.ndarray,
    Y: np.ndarray,
    counts: np.ndarray,
    bound: np.ndarray,
    clip_x: bool,
    keep_le: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Axis-aligned half-plane pass on split coordinate planes
    (X, Y: (B, V)).  Keeps ``coord <= bound`` (or >=); outside vertices
    clamp the clipped coordinate to ``bound``; crossings land exactly on
    the boundary.  ~2× cheaper than the generic line pass."""
    B, V = X.shape
    if V == 0:
        return X, Y, counts
    j = np.arange(V)
    valid = j[None, :] < counts[:, None]
    nxt = (j[None, :] + 1) % np.maximum(counts[:, None], 1)
    Xn = np.take_along_axis(X, nxt, axis=1)
    Yn = np.take_along_axis(Y, nxt, axis=1)

    C = X if clip_x else Y
    Cn = Xn if clip_x else Yn
    s_cur = C - bound[:, None] if keep_le else bound[:, None] - C
    s_nxt = Cn - bound[:, None] if keep_le else bound[:, None] - Cn
    in_cur = s_cur <= 0.0
    in_nxt = s_nxt <= 0.0
    crossed = (in_cur != in_nxt) & valid
    denom = s_cur - s_nxt
    t = np.divide(s_cur, denom, out=np.zeros_like(s_cur), where=denom != 0.0)
    # crossing point: clipped coord is exactly `bound`, other interpolates
    if clip_x:
        cx = np.broadcast_to(bound[:, None], X.shape)
        cy = Y + t * (Yn - Y)
        new_x = np.where(in_nxt, Xn, bound[:, None])
        new_y = Yn
    else:
        cx = X + t * (Xn - X)
        cy = np.broadcast_to(bound[:, None], Y.shape)
        new_x = Xn
        new_y = np.where(in_nxt, Yn, bound[:, None])

    ncross = crossed.sum(axis=1)
    maxc = int(ncross.max()) if B else 0
    if maxc == 0:
        # pure clamp, vertex count unchanged; padded rows' wrap-around
        # nxt indices collide with valid slots, so route them to a sink
        Xo = np.zeros((B, V + 1))
        Yo = np.zeros((B, V + 1))
        pos = np.where(valid, nxt, V)
        np.put_along_axis(Xo, pos, new_x, axis=1)
        np.put_along_axis(Yo, pos, new_y, axis=1)
        return Xo[:, :V], Yo[:, :V], counts
    Vout = V + maxc + 1  # last slot is a write sink for masked entries
    Xo = np.zeros((B, Vout))
    Yo = np.zeros((B, Vout))
    shift = np.cumsum(crossed, axis=1)
    trash = Vout - 1
    pos_next = np.where(valid, j[None, :] + shift, trash)
    pos_cross = np.where(crossed, j[None, :] + shift - 1, trash)
    np.put_along_axis(Xo, pos_next, new_x, axis=1)
    np.put_along_axis(Yo, pos_next, new_y, axis=1)
    np.put_along_axis(Xo, pos_cross, cx, axis=1)
    np.put_along_axis(Yo, pos_cross, cy, axis=1)
    return Xo, Yo, counts + ncross


def batch_rect_clip_area(
    P: np.ndarray, counts: np.ndarray, boxes: np.ndarray
) -> np.ndarray:
    """Intersection areas of a padded ring stack with per-row boxes
    ``(B, 4) = (xmin, ymin, xmax, ymax)`` — four vectorized axis-aligned
    half-plane passes + one shoelace.

    Rows whose ring bbox is fully inside (area = ring area) or disjoint
    (area = 0) short-circuit; only straddlers run the clip passes.
    """
    B, V, _ = P.shape
    if V == 0:
        return np.zeros(B)
    Xf, Yf = np.ascontiguousarray(P[:, :, 0]), np.ascontiguousarray(P[:, :, 1])
    jf = np.arange(V)
    validf = jf[None, :] < counts[:, None]
    gxmin = np.where(validf, Xf, np.inf).min(axis=1)
    gxmax = np.where(validf, Xf, -np.inf).max(axis=1)
    gymin = np.where(validf, Yf, np.inf).min(axis=1)
    gymax = np.where(validf, Yf, -np.inf).max(axis=1)
    contained = (
        (gxmin >= boxes[:, 0]) & (gxmax <= boxes[:, 2])
        & (gymin >= boxes[:, 1]) & (gymax <= boxes[:, 3])
    )
    disjoint = (
        (gxmin > boxes[:, 2]) | (gxmax < boxes[:, 0])
        | (gymin > boxes[:, 3]) | (gymax < boxes[:, 1])
    )
    out = np.zeros(B)
    if contained.any():
        out[contained] = batch_shoelace(P[contained], counts[contained])
    straddle = ~contained & ~disjoint
    if not straddle.any():
        return out
    out[straddle] = _rect_clip_area_passes(
        Xf[straddle], Yf[straddle], counts[straddle], boxes[straddle]
    )
    return out


def _rect_clip_area_passes(
    X: np.ndarray, Y: np.ndarray, counts: np.ndarray, boxes: np.ndarray
) -> np.ndarray:
    for bound_idx, clip_x, keep_le in (
        (2, True, True),   # x <= xmax
        (0, True, False),  # x >= xmin
        (3, False, True),  # y <= ymax
        (1, False, False),  # y >= ymin
    ):
        X, Y, counts = _axis_halfplane_clip(
            X, Y, counts, boxes[:, bound_idx], clip_x, keep_le
        )
    B, V = X.shape
    if V == 0:
        return np.zeros(B)
    j = np.arange(V)
    valid = j[None, :] < counts[:, None]
    nxt = (j[None, :] + 1) % np.maximum(counts[:, None], 1)
    Xn = np.take_along_axis(X, nxt, axis=1)
    Yn = np.take_along_axis(Y, nxt, axis=1)
    cross = X * Yn - Xn * Y
    return np.abs(np.sum(np.where(valid, cross, 0.0), axis=1)) / 2.0


def batch_convex_clip_area(
    P: np.ndarray,
    counts: np.ndarray,
    C: np.ndarray,
    ccounts: np.ndarray,
) -> np.ndarray:
    """Intersection areas with per-row *convex* CCW clip rings padded to
    ``(B, Emax, 2)``; rows run only their own clip edges (passes beyond
    a row's edge count are no-ops via e = 0)."""
    B, Emax, _ = C.shape
    for k in range(Emax):
        active = k < ccounts
        nxt = (k + 1) % np.maximum(ccounts, 1)
        a = C[np.arange(B), k]
        b = C[np.arange(B), nxt]
        e = np.where(active[:, None], b - a, 0.0)
        P, counts = batch_halfplane_clip(P, counts, a[:, 0], a[:, 1], e[:, 0], e[:, 1])
    return batch_shoelace(P, counts)


def batch_box_clipped_length(
    lines: list[np.ndarray], boxes: np.ndarray
) -> np.ndarray:
    """Per-row length of each polyline inside its own box — Liang–Barsky
    over every segment of every line in one vectorized pass."""
    nseg = np.array([max(len(c) - 1, 0) for c in lines], dtype=np.int64)
    B = len(lines)
    if nseg.sum() == 0:
        return np.zeros(B)
    row = np.repeat(np.arange(B), nseg)
    p0 = np.concatenate([c[:-1] for c in lines if len(c) > 1])
    p1 = np.concatenate([c[1:] for c in lines if len(c) > 1])
    bx = boxes[row]
    dx, dy = p1[:, 0] - p0[:, 0], p1[:, 1] - p0[:, 1]
    t0 = np.zeros(len(row))
    t1 = np.ones(len(row))
    ok = np.ones(len(row), dtype=bool)
    for p, q in (
        (-dx, p0[:, 0] - bx[:, 0]),
        (dx, bx[:, 2] - p0[:, 0]),
        (-dy, p0[:, 1] - bx[:, 1]),
        (dy, bx[:, 3] - p0[:, 1]),
    ):
        r = np.divide(q, p, out=np.zeros_like(q), where=p != 0.0)
        t0 = np.where(p < 0, np.maximum(t0, r), t0)
        t1 = np.where(p > 0, np.minimum(t1, r), t1)
        ok &= ~((p == 0.0) & (q < 0.0))
    frac = np.where(ok, np.maximum(t1 - t0, 0.0), 0.0)
    seg_len = np.hypot(dx, dy) * frac
    return np.bincount(row, weights=seg_len, minlength=B)


# ====================================================================
# Antimeridian handling (reference emiproc/grids.py:931-1013:
# ICON triangles crossing ±180° are unwrapped, split at the meridian,
# and each part shifted back into [−180, 180])
# ====================================================================
def unwrap_lons(ring: np.ndarray) -> np.ndarray:
    """Make the ring's longitudes continuous: each vertex lands within
    ±180° of the previous one (the reference's shift-by-360 detection,
    grids.py:947-989, generalized to any vertex count)."""
    r = np.asarray(ring, dtype=np.float64).copy()
    lon = r[:, 0]
    for i in range(1, len(lon)):
        d = lon[i] - lon[i - 1]
        if d > 180.0:
            lon[i:] -= 360.0
            # re-walk from the same vertex (single pass is enough for
            # rings already within one wrap)
        elif d < -180.0:
            lon[i:] += 360.0
    return r


def split_antimeridian(ring: np.ndarray) -> list[np.ndarray]:
    """Split a (possibly wrapped) lon/lat ring at the ±180° meridian.

    Returns 1 or 2 rings, every vertex in [−180, 180] (the reference's
    MultiPolygon split + shift_lon_poly, grids.py:1000-1013).
    """
    r = unwrap_lons(ring)
    lon = r[:, 0]
    # center the unwrapped ring on its own mean wrap window
    offset = 360.0 * np.round(lon.mean() / 360.0)
    r[:, 0] -= offset
    lon = r[:, 0]
    lat_lo = min(-90.0, float(r[:, 1].min()) - 1.0)
    lat_hi = max(90.0, float(r[:, 1].max()) + 1.0)
    parts: list[np.ndarray] = []
    if lon.max() > 180.0:
        west = clip_polygon_convex(
            r, np.array([[-540.0, lat_lo], [180.0, lat_lo], [180.0, lat_hi], [-540.0, lat_hi]])
        )
        east = clip_polygon_convex(
            r, np.array([[180.0, lat_lo], [540.0, lat_lo], [540.0, lat_hi], [180.0, lat_hi]])
        )
        if len(east):
            east = east.copy()
            east[:, 0] -= 360.0
        candidates = [west, east]
    elif lon.min() < -180.0:
        east = clip_polygon_convex(
            r, np.array([[-180.0, lat_lo], [540.0, lat_lo], [540.0, lat_hi], [-180.0, lat_hi]])
        )
        west = clip_polygon_convex(
            r, np.array([[-540.0, lat_lo], [-180.0, lat_lo], [-180.0, lat_hi], [-540.0, lat_hi]])
        )
        if len(west):
            west = west.copy()
            west[:, 0] += 360.0
        candidates = [east, west]
    else:
        return [r]
    for p in candidates:
        if len(p) >= 3 and shoelace_area(p) > 1e-12:
            parts.append(p)
    return parts or [r]


def ring_wkb_batch(xs: "np.ndarray", ys: "np.ndarray") -> list[bytes]:
    """(n, k) corner arrays → n single-ring polygon WKBs, auto-closed —
    ONE vectorized structured-array write instead of n Python packs
    (the batched sibling of :func:`wkb_polygon`; shared by the ICON
    triangle ingest, the WRF quad ingest and the geometry microbench).
    """
    n, k = xs.shape
    dt = np.dtype(
        [
            ("byte_order", "u1"),
            ("wkb_type", "<u4"),
            ("n_rings", "<u4"),
            ("n_points", "<u4"),
            ("xy", "<f8", (k + 1, 2)),
        ]
    )
    arr = np.empty(n, dtype=dt)
    arr["byte_order"] = 1
    arr["wkb_type"] = WKB_POLYGON
    arr["n_rings"] = 1
    arr["n_points"] = k + 1
    arr["xy"][:, :k, 0] = xs
    arr["xy"][:, :k, 1] = ys
    arr["xy"][:, k, 0] = xs[:, 0]
    arr["xy"][:, k, 1] = ys[:, 0]
    return [row.tobytes() for row in arr]
