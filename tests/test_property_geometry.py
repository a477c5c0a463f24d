"""Property-based tests (hypothesis) for the geometry kernel — the
reference has no randomized testing (SURVEY §5); these pin down the
kernel invariants the spatial join relies on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.functions import geometry as g

coord = st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False)


def boxes():
    return st.tuples(coord, coord, st.floats(0.1, 50), st.floats(0.1, 50)).map(
        lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3])
    )


@given(boxes(), boxes())
@settings(max_examples=200, deadline=None)
def test_rect_clip_matches_interval_math(a, b):
    """Sutherland–Hodgman on two rectangles == closed-form interval
    overlap (the oracle identity the whole parity harness rests on)."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    subject = g.parse_wkb(g.wkb_box(*a))[1]
    clip = g.parse_wkb(g.wkb_box(*b))[1][0]
    area = g.intersection_area(subject, clip)
    ox = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    oy = max(0.0, min(ay1, by1) - max(ay0, by0))
    assert abs(area - ox * oy) < 1e-6 * max(1.0, ox * oy)


@given(boxes(), boxes())
@settings(max_examples=200, deadline=None)
def test_clip_area_bounded(a, b):
    subject = g.parse_wkb(g.wkb_box(*a))[1]
    clip = g.parse_wkb(g.wkb_box(*b))[1][0]
    area = g.intersection_area(subject, clip)
    a_area = (a[2] - a[0]) * (a[3] - a[1])
    b_area = (b[2] - b[0]) * (b[3] - b[1])
    assert -1e-9 <= area <= min(a_area, b_area) * (1 + 1e-9) + 1e-9


@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=8, unique=True),
    boxes(),
)
@settings(max_examples=200, deadline=None)
def test_polygon_clip_never_exceeds_clip_area(pts, b):
    """A *simple* (star-shaped: vertices angle-sorted around centroid)
    ring clipped by a box stays within the box area — Sutherland–Hodgman
    is only contracted for simple polygons, which is what grids and
    region shapes are."""
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    ordered = sorted(pts, key=lambda p: np.arctan2(p[1] - cy, p[0] - cx))
    ring = np.array(ordered, dtype=float)
    clip = g.parse_wkb(g.wkb_box(*b))[1][0]
    clipped = g.clip_polygon_convex(ring, g.ensure_ccw(clip))
    if len(clipped) >= 3:
        b_area = (b[2] - b[0]) * (b[3] - b[1])
        assert g.shoelace_area(clipped) <= b_area * (1 + 1e-6) + 1e-6
        # clipping never grows a polygon either
        assert g.shoelace_area(clipped) <= g.shoelace_area(ring) * (1 + 1e-6) + 1e-6


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=6), boxes())
@settings(max_examples=200, deadline=None)
def test_line_clip_length_bounded(pts, b):
    coords = np.array(pts, dtype=float)
    total = g.line_length(coords)
    clipped = g.clipped_line_length(coords, *b)
    assert -1e-9 <= clipped <= total + 1e-6 * max(1.0, total)


@given(st.integers(0, 10**6), st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_quantization_roundtrip(n, exp):
    """sumd's per-row quantization is exact for values that are integer
    multiples of the quantum."""
    from emiproc_spark.qhelpers import QSCALE

    v = n / 10.0**exp
    q = np.floor(v * QSCALE + 0.5)
    # half-quantum bound, with one float ulp of slack at the boundary
    assert abs(q / QSCALE - v) <= 0.5 / QSCALE * (1 + 1e-12) + 1e-15


# ----------------------------------------------------------------------
# buffer_line (GPKG line-buffer ingest, round-5 oracle coverage): the
# square-cap miter-join offset polygon must contain at least the exact
# rectangle area of each segment and stay bounded by the miter limit.
# ----------------------------------------------------------------------
def _polyline():
    step = st.tuples(
        st.floats(-20, 20, allow_nan=False), st.floats(-20, 20, allow_nan=False)
    ).filter(lambda t: abs(t[0]) + abs(t[1]) > 0.5)
    return st.lists(step, min_size=1, max_size=5).map(
        lambda steps: np.cumsum(np.array([(0.0, 0.0)] + list(steps)), axis=0)
    )


@given(_polyline(), st.floats(0.5, 5.0))
@settings(max_examples=150, deadline=None)
def test_buffer_line_area_bounds(coords, width):
    from emiproc_spark.sources.geopackage import buffer_line

    ring = buffer_line(coords, width)
    area = abs(g.shoelace_area(ring))
    seg = np.diff(coords, axis=0)
    length = float(np.hypot(seg[:, 0], seg[:, 1]).sum())
    # square caps add exactly (2w)^2; joins can only add (miter) or
    # remove (concave overlap) bounded slivers.  Lower bound: a single
    # straight segment's exact rectangle; upper: miter-limit fattening.
    lower = (length + 2 * width) * 2 * width
    upper = lower * 6.0  # miter_limit=5 caps any join spike
    if len(coords) == 2:
        assert abs(area - lower) < 1e-6 * lower
    else:
        assert 0 < area <= upper


@given(st.floats(0.5, 5.0), st.floats(1.0, 50.0), st.floats(-180, 180))
@settings(max_examples=150, deadline=None)
def test_buffer_line_rotation_invariant(width, length, angle_deg):
    """A rotated straight segment buffers to the same area as the
    axis-aligned one — no hidden axis dependence in cap/offset math."""
    from emiproc_spark.sources.geopackage import buffer_line

    a = np.deg2rad(angle_deg)
    d = np.array([np.cos(a), np.sin(a)])
    ring = buffer_line(np.array([[0.0, 0.0], d * length]), width)
    area = abs(g.shoelace_area(ring))
    expect = (length + 2 * width) * 2 * width
    assert abs(area - expect) < 1e-9 * max(1.0, expect) + 1e-9
