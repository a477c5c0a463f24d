import numpy as np

from emiproc_spark.functions import geometry as g


def test_wkb_roundtrip_polygon():
    wkb = g.wkb_polygon([(0, 0), (2, 0), (2, 1), (0, 1)])
    gtype, rings = g.parse_wkb(wkb)
    assert gtype == g.WKB_POLYGON
    assert g.shoelace_area(rings[0]) == 2.0


def test_wkb_point_line():
    t, r = g.parse_wkb(g.wkb_point(3.5, -1.0))
    assert t == g.WKB_POINT and tuple(r[0][0]) == (3.5, -1.0)
    t, r = g.parse_wkb(g.wkb_linestring([(0, 0), (3, 4)]))
    assert t == g.WKB_LINESTRING and g.line_length(r[0]) == 5.0


def test_clip_polygon_rect():
    # unit square clipped by box covering its right half
    subject = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    clip = np.array([(0.5, -1.0), (2.0, -1.0), (2.0, 2.0), (0.5, 2.0)])
    out = g.clip_polygon_convex(subject, clip)
    assert abs(g.shoelace_area(out) - 0.5) < 1e-12


def test_clip_triangle():
    tri = np.array([(0.0, 0.0), (2.0, 0.0), (0.0, 2.0)])
    clip = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    out = g.clip_polygon_convex(tri, clip)
    # triangle ∩ unit box = box minus top-right half over the diagonal x+y=2 → area 1.0 -0? diag cuts at (1,1): area = 1.0
    assert abs(g.shoelace_area(out) - 1.0) < 1e-12


def test_clip_disjoint():
    subject = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    clip = np.array([(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0)])
    out = g.clip_polygon_convex(subject, clip)
    assert len(out) == 0


def test_line_clip_length():
    coords = np.array([(-1.0, 0.5), (2.0, 0.5)])
    assert abs(g.clipped_line_length(coords, 0, 0, 1, 1) - 1.0) < 1e-12
    diag = np.array([(0.0, 0.0), (2.0, 2.0)])
    assert abs(g.clipped_line_length(diag, 0, 0, 1, 1) - 2**0.5) < 1e-12


def test_point_in_box_inclusive():
    assert g.point_in_box(1.0, 1.0, 0, 0, 1, 1)
    assert g.point_in_box(1.0, 1.0, 1, 1, 2, 2)
