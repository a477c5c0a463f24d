"""Batched geometry kernels must agree with the scalar reference
implementations on randomized inputs (star-shaped simple polygons,
polylines), including degenerate fully-inside / fully-outside cases."""

import numpy as np
import pytest

from emiproc_spark.functions import geometry as geom

rng = np.random.default_rng(42)


def star_polygon(n_vertices: int, cx: float, cy: float, rmax: float) -> np.ndarray:
    """Random star-shaped (simple, generally non-convex) polygon."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_vertices))
    rad = rng.uniform(0.2 * rmax, rmax, n_vertices)
    return np.column_stack((cx + rad * np.cos(ang), cy + rad * np.sin(ang)))


@pytest.mark.parametrize("trial", range(5))
def test_batch_rect_clip_matches_scalar(trial):
    polys = [star_polygon(rng.integers(3, 12), *rng.uniform(0, 10, 2), 3.0) for _ in range(40)]
    boxes = np.column_stack(
        [
            rng.uniform(0, 8, 40),
            rng.uniform(0, 8, 40),
            np.zeros(40),
            np.zeros(40),
        ]
    )
    boxes[:, 2] = boxes[:, 0] + rng.uniform(0.5, 4, 40)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(0.5, 4, 40)

    P, counts = geom.stack_rings(polys)
    got = geom.batch_rect_clip_area(P, counts, boxes)
    for i, (poly, box) in enumerate(zip(polys, boxes)):
        clip = geom.parse_wkb(geom.wkb_box(*box[[0, 1, 2, 3]]))[1][0]
        want = geom.intersection_area([poly], clip)
        assert got[i] == pytest.approx(want, abs=1e-9), f"row {i}"


@pytest.mark.parametrize("trial", range(5))
def test_batch_convex_clip_matches_scalar(trial):
    polys = [star_polygon(rng.integers(3, 10), *rng.uniform(0, 10, 2), 3.0) for _ in range(30)]
    # convex clips: random triangles / quads via convex hull of a box's corners
    clips = []
    for _ in range(30):
        cx, cy = rng.uniform(0, 10, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, rng.integers(3, 7)))
        r = rng.uniform(1.0, 3.0)
        ring = np.column_stack((cx + r * np.cos(ang), cy + r * np.sin(ang)))
        clips.append(geom.ensure_ccw(ring))

    P, counts = geom.stack_rings(polys)
    C, ccounts = geom.stack_rings(clips)
    got = geom.batch_convex_clip_area(P, counts, C, ccounts)
    for i, (poly, clip) in enumerate(zip(polys, clips)):
        want = geom.intersection_area([poly], clip)
        assert got[i] == pytest.approx(want, abs=1e-9), f"row {i}"


def test_batch_rect_clip_degenerate_cases():
    inside = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    outside = inside + 100.0
    P, counts = geom.stack_rings([inside, outside])
    boxes = np.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    got = geom.batch_rect_clip_area(P, counts, boxes)
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)


def test_batch_line_clip_matches_scalar():
    lines = [
        np.cumsum(rng.uniform(-1, 1, (rng.integers(2, 20), 2)), axis=0) + 5.0
        for _ in range(50)
    ]
    boxes = np.tile([3.0, 3.0, 7.0, 7.0], (50, 1))
    got = geom.batch_box_clipped_length(lines, boxes)
    for i, line in enumerate(lines):
        want = geom.clipped_line_length(line, 3.0, 3.0, 7.0, 7.0)
        assert got[i] == pytest.approx(want, abs=1e-9), f"row {i}"


def test_multipolygon_batch_vs_scalar():
    parts = [star_polygon(6, 2.0, 2.0, 1.5), star_polygon(5, 6.0, 6.0, 1.5)]
    box = (1.0, 1.0, 7.0, 7.0)
    clip = geom.parse_wkb(geom.wkb_box(*box))[1][0]
    want = geom.intersection_area(parts, clip)
    P, counts = geom.stack_rings(parts)
    boxes = np.tile(box, (2, 1))
    got = geom.batch_rect_clip_area(P, counts, boxes).sum()
    assert got == pytest.approx(want, abs=1e-9)
