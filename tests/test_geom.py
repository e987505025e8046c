"""Unit tests for the numpy geometry kernels — everything downstream
(gridding, overlay, spatial join) depends on these being exact."""

import numpy as np
import pytest

from pygridmap_ray.geom import (
    BBoxIndex,
    as_ring,
    bbox_intersection,
    bbox_to_ring,
    bbox_union,
    cells_coverage,
    clip_area_rect,
    clip_rings_rect,
    points_in_rings,
    rect_relation,
    ring_signed_area,
    rings_area,
)
from pygridmap_ray.synth import polygon_layer


def test_shoelace_rect():
    r = as_ring([[0, 0], [4, 0], [4, 3], [0, 3]])
    assert ring_signed_area(r) == 12.0
    assert ring_signed_area(r[::-1]) == -12.0


def test_ring_closed_vertex_dropped():
    r = as_ring([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]])
    assert len(r) == 4


def test_area_with_hole():
    ext = as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])
    hole = as_ring([[2, 2], [2, 4], [4, 4], [4, 2]])  # CW
    assert rings_area([ext, hole]) == 100.0 - 4.0


def test_pip_square():
    sq = [as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])]
    px = np.array([5.0, 15.0, -1.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, 15.0])
    assert points_in_rings(px, py, sq).tolist() == [True, False, False, False]


def test_pip_hole_and_concave():
    ext = as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])
    hole = as_ring([[2, 2], [2, 4], [4, 4], [4, 2]])
    inside = points_in_rings(np.array([3.0, 1.0]), np.array([3.0, 1.0]), [ext, hole])
    assert inside.tolist() == [False, True]  # in hole -> out
    lshape = [as_ring([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]])]
    inside = points_in_rings(np.array([3.0, 1.0]), np.array([3.0, 1.0]), lshape)
    assert inside.tolist() == [False, True]


def test_clip_rect_basic():
    sq = [as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])]
    assert clip_area_rect(sq, 2, 2, 5, 5) == 9.0
    assert clip_area_rect(sq, -5, -5, 5, 5) == 25.0
    assert clip_area_rect(sq, 20, 20, 30, 30) == 0.0
    # clip window fully inside -> rect itself
    out = clip_rings_rect(sq, 1, 1, 2, 2)
    assert rings_area(out) == 1.0


def test_clip_triangle():
    tri = [as_ring([[0, 0], [4, 0], [0, 4]])]
    assert rings_area(tri) == 8.0
    assert clip_area_rect(tri, 0, 0, 2, 2) == pytest.approx(4.0)  # window inside
    assert clip_area_rect(tri, 1, 1, 3, 3) == pytest.approx(2.0)  # hypotenuse cut


def test_clip_with_hole():
    ext = as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])
    hole = as_ring([[2, 2], [2, 6], [6, 6], [6, 2]])
    # window [0,0,4,4] overlaps hole on [2,2,4,4] -> 16 - 4
    assert clip_area_rect([ext, hole], 0, 0, 4, 4) == 12.0


def test_rect_relation():
    sq = [as_ring([[0, 0], [10, 0], [10, 10], [0, 10]])]
    assert rect_relation(sq, 2, 2, 4, 4) == 2  # within
    assert rect_relation(sq, 8, 8, 12, 12) == 1  # intersects
    assert rect_relation(sq, 20, 20, 30, 30) == 0  # outside
    assert rect_relation(sq, -10, -10, 0, 0) == 0  # touch-only = outside


def test_cells_coverage_exact():
    # triangle over a 4x4 unit grid: coverage must sum to triangle area
    tri = [as_ring([[0, 0], [4, 0], [0, 4]])]
    cov = cells_coverage(tri, 0, 0, 1, 1, 4, 4)
    assert cov.shape == (4, 4)
    assert cov.sum() == pytest.approx(8.0)
    assert cov[0, 0] == 1.0  # fully covered corner cell
    assert cov[3, 3] == 0.0
    assert cov[0, 3] == pytest.approx(0.5)  # diagonal cell


def test_cells_coverage_interior_and_hole():
    ext = as_ring([[0, 0], [8, 0], [8, 8], [0, 8]])
    hole = as_ring([[2, 2], [2, 6], [6, 6], [6, 2]])
    cov = cells_coverage([ext, hole], 0, 0, 2, 2, 4, 4)
    assert cov.sum() == pytest.approx(64.0 - 16.0)
    assert cov[1, 1] == 0.0  # inside hole
    assert cov[0, 0] == 4.0


def test_cells_coverage_offset_grid():
    sq = [as_ring([[3, 3], [7, 3], [7, 7], [3, 7]])]
    cov = cells_coverage(sq, 2, 2, 2, 2, 4, 4)
    assert cov.sum() == pytest.approx(16.0)
    assert cov[0, 0] == 1.0  # cell [2,4]x[2,4] overlaps on [3,4]x[3,4]


def test_synth_polygons_rects_match_rings():
    """The ring and rect representations of every fixture polygon agree."""
    for p in polygon_layer():
        rect_area = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in p["rects"])
        assert p["area"] == pytest.approx(rect_area), p["poly_id"]
        # coverage over the polygon bbox matches too (10km cells)
        x0, y0, x1, y1 = p["bbox"]
        nx = int(round((x1 - x0) / 10_000))
        ny = int(round((y1 - y0) / 10_000))
        cov = cells_coverage(p["rings"], x0, y0, 10_000, 10_000, nx, ny)
        assert cov.sum() == pytest.approx(rect_area)


def test_bbox_algebra():
    assert bbox_intersection((0, 0, 4, 4), (2, 2, 8, 8)) == (2, 2, 4, 4)
    assert bbox_intersection((0, 0, 1, 1), (2, 2, 3, 3)) is None
    assert bbox_union((0, 0, 4, 4), (2, 2, 8, 8)) == (0, 0, 8, 8)


def test_bbox_to_ring_densified():
    r = bbox_to_ring(0, 0, 10, 10, density=3)
    assert len(r) == 16
    assert ring_signed_area(r) == 100.0


def test_bbox_index():
    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 100, size=(500, 2))
    boxes = np.concatenate([lo, lo + rng.uniform(1, 5, size=(500, 2))], axis=1)
    idx = BBoxIndex(boxes)
    q = (20.0, 20.0, 30.0, 30.0)
    got = set(idx.query(*q).tolist())
    b = boxes
    expect = set(
        np.nonzero(
            (b[:, 0] <= q[2]) & (b[:, 2] >= q[0]) & (b[:, 1] <= q[3]) & (b[:, 3] >= q[1])
        )[0].tolist()
    )
    assert got == expect


def test_cells_coverage_diagonal_star_polygon():
    """Coverage is exact for non-rectilinear outlines too: a 48-vertex
    star polygon's per-cell coverage sums to its shoelace area."""
    from pygridmap_ray.synth import bench_polygon_layer

    p = bench_polygon_layer(9, nvert=48)[4]
    x0, y0, x1, y1 = p["bbox"]
    for cs in (5_000.0, 2_500.0):
        nx = int(np.ceil((x1 - x0) / cs))
        ny = int(np.ceil((y1 - y0) / cs))
        cov = cells_coverage(p["rings"], x0, y0, cs, cs, nx, ny)
        assert cov.sum() == pytest.approx(p["area"], rel=1e-9)
        assert cov.max() <= cs * cs * (1 + 1e-9)  # SH float rounding headroom


def test_clip_ring_convex_matches_rect_kernel():
    """The general convex SH kernel agrees with the independently
    oracle-verified rect SH kernel whenever the window IS a rect."""
    from pygridmap_ray.geom.kernels import (
        as_ring, clip_area_convex, clip_ring_rect, ring_signed_area,
    )

    rng = np.random.default_rng(42)
    for _ in range(200):
        ring = as_ring(rng.uniform(0, 100, size=(int(rng.integers(3, 12)), 2)))
        r = np.sort(rng.uniform(0, 100, 4))
        xmin, xmax, ymin, ymax = r[0], r[2], r[1], r[3]
        rc = clip_ring_rect(ring, xmin, ymin, xmax, ymax)
        a_rect = ring_signed_area(rc) if len(rc) >= 3 else 0.0
        conv = as_ring(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]]
        )
        a_conv = clip_area_convex([ring], conv)
        assert abs(a_rect - a_conv) < 1e-9 * max(1, abs(a_rect))


def test_clip_ring_convex_halfplane_additivity():
    """area(S ∩ T) == area(S ∩ T ∩ left-half) + area(S ∩ T ∩ right-half):
    the slab-decomposition identity the poly_overlay oracle relies on."""
    from pygridmap_ray.geom.kernels import (
        as_ring, clip_area_convex, clip_rings_convex,
    )

    rng = np.random.default_rng(7)
    tri = as_ring([[10, 10], [90, 30], [40, 95]])
    big = 1e6
    lhalf = as_ring([[-big, -big], [45, -big], [45, big], [-big, big]])
    rhalf = as_ring([[45, -big], [big, -big], [big, big], [45, big]])
    for _ in range(150):
        ring = as_ring(rng.uniform(0, 100, size=(int(rng.integers(3, 10)), 2)))
        a_full = clip_area_convex([ring], tri)
        parts = clip_rings_convex([ring], tri)
        a_split = sum(clip_area_convex([p], lhalf) for p in parts) + sum(
            clip_area_convex([p], rhalf) for p in parts
        )
        assert abs(a_full - a_split) < 1e-6 * max(1, abs(a_full))


def test_poly_overlay_areas_far_from_rounding_boundary():
    """The poly_overlay fixture's true areas sit far from the 0.5e-6
    rounding boundary, so engine-vs-oracle fp noise (~1e-10) can never
    flip a rounded digit."""
    from pygridmap_ray.geom.kernels import clip_area_convex
    from pygridmap_ray.synth import clip_layer, polygon_layer

    for p in polygon_layer():
        rings = [r / 1000.0 for r in p["rings"]]
        for c in clip_layer():
            a = clip_area_convex(rings, c["ring"])
            if a <= 0:
                continue
            frac = abs(a * 1e6 - np.floor(a * 1e6 + 0.5))
            assert abs(frac - 0.5) > 1e-3, (p["poly_id"], c["clip_id"], a)


def _star_ring(rng, nv):
    """Guaranteed-simple concave star: jittered equal angular spacing
    (every gap < pi) with random radii."""
    from pygridmap_ray.geom.kernels import as_ring

    th = (np.arange(nv) + 0.8 * rng.uniform(0, 1, nv)) * 2 * np.pi / nv
    rad = rng.uniform(0.3, 1.0, nv)
    return as_ring(np.stack([np.cos(th) * rad, np.sin(th) * rad], 1) * 100)


def test_triangulate_ring_tiles_exactly():
    from pygridmap_ray.geom.kernels import ring_signed_area, triangulate_ring

    rng = np.random.default_rng(11)
    for _ in range(120):
        ring = _star_ring(rng, int(rng.integers(4, 24)))
        tris = triangulate_ring(ring)
        assert all(ring_signed_area(t) > 0 for t in tris)
        got = sum(ring_signed_area(t) for t in tris)
        assert abs(got - ring_signed_area(ring)) < 1e-6
    # CW input + collinear vertex
    from pygridmap_ray.geom.kernels import as_ring

    sq = as_ring([[0, 0], [50, 0], [100, 0], [100, 100], [0, 100]])[::-1]
    tris = triangulate_ring(sq)
    assert abs(sum(ring_signed_area(t) for t in tris) - 10000) < 1e-9


def test_clip_area_poly_matches_fan_decomposition():
    """Triangulation-based concave clip == independent centroid-fan
    decomposition on star-shaped clip polygons."""
    from pygridmap_ray.geom.kernels import (
        as_ring, clip_area_convex, clip_area_poly,
    )

    rng = np.random.default_rng(12)
    for _ in range(80):
        s = _star_ring(rng, int(rng.integers(4, 16)))
        nv = len(s)
        subj = as_ring(
            rng.uniform(-120, 120, size=(int(rng.integers(3, 9)), 2))
        )
        a_tri = clip_area_poly([subj], s)
        a_fan = sum(
            clip_area_convex(
                [subj], as_ring([[0.0, 0.0], s[i], s[(i + 1) % nv]])
            )
            for i in range(nv)
        )
        assert abs(a_tri - a_fan) < 1e-7 * max(1, abs(a_tri))


def test_heal_ring_degeneracies():
    """Dup vertices, A-B-A spikes and collinear interiors heal away
    without area change; slivers under tol^2 collapse; healthy rings
    (any orientation) pass through untouched."""
    from pygridmap_ray.geom.kernels import (
        as_ring, heal_ring, ring_signed_area,
    )

    r = as_ring(
        [[0, 0], [0, 0], [50, 0], [100, 0], [100, 50], [150, 90],
         [100, 50], [100, 100], [0, 100]]
    )
    h = heal_ring(r, tol=1e-9)
    assert len(h) == 4 and abs(ring_signed_area(h) - 10000) < 1e-9
    assert len(heal_ring(as_ring([[0, 0], [100, 0], [50, 1e-9]]),
                         tol=1e-3)) == 0
    g = as_ring([[0, 0], [100, 0], [100, 100], [0, 100]])[::-1]
    assert np.array_equal(heal_ring(g), g)
    rng = np.random.default_rng(5)
    for trial in range(60):
        nv = int(rng.integers(4, 10))
        th = (np.arange(nv) + 0.8 * rng.uniform(0, 1, nv)) * 2 * np.pi / nv
        clean = as_ring(
            np.stack([np.cos(th), np.sin(th)], 1)
            * 100 * rng.uniform(0.5, 1, nv)[:, None]
        )
        noisy = []
        for p in clean:
            noisy.append(p)
            if rng.random() < 0.4:
                noisy.append(p)  # duplicate
            if rng.random() < 0.3:  # out-and-back spike
                q = p + rng.uniform(1, 5, 2)
                noisy += [q.tolist(), p.tolist()]
        h = heal_ring(np.asarray(noisy, dtype=float), tol=1e-9)
        assert abs(ring_signed_area(h) - ring_signed_area(clean)) < 1e-6
