"""Parity (even-odd) healing kernels — the self-intersection repair the
reference reaches through its TopologyException retry (``unary_union`` +
``buffer``, reference overlay.py:299-309).  Pure-numpy, no Ray session."""

import numpy as np
import pytest

from pygridmap_ray.geom.kernels import (
    as_ring,
    cells_coverage,
    cells_coverage_parity,
    clip_area_rect,
    parity_area,
    parity_clip_area_rect,
    points_in_rings,
    quad_parity_area,
    rings_area,
)

BOWTIE = as_ring([(0, 0), (2, 0), (0, 2), (2, 2)])


def test_bowtie_golden():
    # shoelace cancels to 0; healed interior is the two unit lobes
    assert rings_area([BOWTIE]) == 0.0
    assert parity_area([BOWTIE]) == pytest.approx(2.0, abs=1e-12)


def test_simple_polygon_matches_shoelace():
    sq = as_ring([(0, 0), (3, 0), (3, 2), (0, 2)])
    assert parity_area([sq]) == pytest.approx(6.0, abs=1e-12)
    # holes subtract under parity exactly as signed areas do
    hole = as_ring([(1, 0.5), (1, 1.5), (2, 1.5), (2, 0.5)])  # CW
    assert parity_area([sq, hole]) == pytest.approx(
        rings_area([sq, hole]), abs=1e-12
    )


def test_clip_additivity_over_tiling():
    # exactness proof: disjoint rect clips must tile the healed area
    for ring in (BOWTIE, _star(seed=7)):
        total = parity_area([ring])
        x0, y0 = ring[:, 0].min(), ring[:, 1].min()
        w = (ring[:, 0].max() - x0) / 5
        h = (ring[:, 1].max() - y0) / 5
        tiles = sum(
            parity_clip_area_rect(
                [ring], x0 + i * w, y0 + j * h,
                x0 + (i + 1) * w, y0 + (j + 1) * h,
            )
            for i in range(5)
            for j in range(5)
        )
        assert tiles == pytest.approx(total, rel=1e-9)


def test_clip_matches_sutherland_hodgman_on_simple_input():
    rng = np.random.default_rng(3)
    for _ in range(100):
        pts = rng.random((7, 2)) * 10
        c = pts.mean(axis=0)
        ring = as_ring(
            pts[np.argsort(np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0]))]
        )
        r = rng.random(4) * 10
        xmin, xmax = min(r[0], r[1]), max(r[0], r[1])
        ymin, ymax = min(r[2], r[3]), max(r[2], r[3])
        a = parity_clip_area_rect([ring], xmin, ymin, xmax, ymax)
        b = clip_area_rect([ring], xmin, ymin, xmax, ymax)
        assert a == pytest.approx(b, abs=1e-9 * max(1.0, b))


def test_quad_closed_form_matches_general_kernel():
    rng = np.random.default_rng(11)
    Q = rng.random((500, 8)) * 100
    vec = quad_parity_area(*[Q[:, k] for k in range(8)])
    gen = np.array(
        [parity_area([as_ring(q.reshape(4, 2))]) for q in Q]
    )
    assert np.allclose(vec, gen, rtol=1e-10, atol=1e-9)
    # the family must actually exercise both branches
    shoe = np.array([rings_area([as_ring(q.reshape(4, 2))]) for q in Q])
    crossed = ~np.isclose(np.abs(shoe), vec, rtol=1e-9)
    assert crossed.any() and (~crossed).any()


def test_parity_consistent_with_even_odd_containment():
    # points_in_rings IS the even-odd rule: Monte-Carlo parity measure
    # must approach the healed area on a self-intersecting star
    ring = _star(seed=5)
    rng = np.random.default_rng(6)
    x0, y0 = ring[:, 0].min(), ring[:, 1].min()
    x1, y1 = ring[:, 0].max(), ring[:, 1].max()
    n = 200_000
    px = rng.uniform(x0, x1, n)
    py = rng.uniform(y0, y1, n)
    frac = points_in_rings(px, py, [ring]).mean()
    mc = frac * (x1 - x0) * (y1 - y0)
    assert parity_area([ring]) == pytest.approx(mc, rel=0.03)


def test_cells_coverage_parity():
    cov = cells_coverage_parity([BOWTIE], 0, 0, 0.5, 0.5, 4, 4)
    assert cov.shape == (4, 4)
    assert cov.sum() == pytest.approx(2.0, rel=1e-9)
    # simple input: parity coverage equals the standard kernel
    sq = as_ring([(0.3, 0.2), (1.7, 0.4), (1.5, 1.8), (0.2, 1.6)])
    a = cells_coverage_parity([sq], 0, 0, 0.5, 0.5, 4, 4)
    b = cells_coverage([sq], 0, 0, 0.5, 0.5, 4, 4)
    assert np.allclose(a, b, atol=1e-9)


def test_degenerate_inputs():
    assert parity_area([]) == 0.0
    assert parity_area([as_ring([(0, 0), (1, 1)])]) == 0.0  # < 3 vertices
    # zero-height clip window
    assert parity_clip_area_rect([BOWTIE], 0, 1, 2, 1) == 0.0


def _star(seed: int) -> np.ndarray:
    """Self-intersecting 'star': ring visiting 9 random-radius points in
    a shuffled angular order (guaranteed crossings)."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    rad = rng.uniform(1, 5, 9)
    order = rng.permutation(9)
    return as_ring(
        np.stack(
            [rad[order] * np.cos(ang[order]),
             rad[order] * np.sin(ang[order])],
            axis=1,
        )
    )
