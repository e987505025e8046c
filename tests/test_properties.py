"""Property-based tests (hypothesis) for the geometry kernels — the
invariants that must hold for ARBITRARY inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pygridmap_ray.geom import (
    as_ring,
    cells_coverage,
    clip_area_rect,
    clip_rings_rect,
    points_in_rings,
    rings_area,
)


@st.composite
def rectilinear_polygon(draw):
    """A random staircase (rectilinear, simple) polygon built from a
    monotone step profile — always valid, CCW, area > 0."""
    n_steps = draw(st.integers(2, 6))
    xs = sorted(
        draw(
            st.lists(
                st.integers(0, 40), min_size=n_steps + 1, max_size=n_steps + 1, unique=True
            )
        )
    )
    heights = draw(
        st.lists(st.integers(1, 30), min_size=n_steps, max_size=n_steps)
    )
    pts = [[xs[0], 0]]
    for i, h in enumerate(heights):
        pts.append([xs[i], h])
        pts.append([xs[i + 1], h])
    pts.append([xs[-1], 0])
    ring = as_ring(pts)
    # drop consecutive duplicates that a repeated height creates
    keep = np.ones(len(ring), bool)
    keep[1:] = (np.diff(ring, axis=0) != 0).any(axis=1)
    ring = ring[keep]
    if rings_area([ring]) < 0:  # engine convention: exterior is CCW
        ring = ring[::-1].copy()
    return [ring]


@st.composite
def convex_polygon(draw):
    """Random convex polygon: points on a circle at sorted angles."""
    n = draw(st.integers(3, 12))
    angles = sorted(
        draw(st.lists(st.floats(0, 2 * np.pi), min_size=n, max_size=n, unique=True))
    )
    r = draw(st.floats(1.0, 50.0))
    cx = draw(st.floats(-20, 20))
    cy = draw(st.floats(-20, 20))
    ring = as_ring(
        [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in angles]
    )
    return [ring]


@settings(max_examples=60, deadline=None, derandomize=True)
@given(rectilinear_polygon(), st.integers(1, 7), st.integers(1, 7))
def test_coverage_partitions_area(rings, w, h):
    """Σ per-cell coverage == polygon area, coverage never exceeds a cell."""
    area = rings_area(rings)
    x0, y0 = -1.0, -1.0
    nx = int(np.ceil((41 - x0) / w))
    ny = int(np.ceil((31 - y0) / h))
    cov = cells_coverage(rings, x0, y0, float(w), float(h), nx, ny)
    assert cov.sum() == np.float64(cov.sum())  # finite
    assert abs(cov.sum() - area) <= 1e-6 * max(area, 1.0)
    assert cov.max() <= w * h * (1 + 1e-9)
    assert (cov >= 0).all()


@settings(max_examples=60, deadline=None, derandomize=True)
@given(convex_polygon(), st.floats(-60, 60), st.floats(-60, 60), st.floats(1, 40), st.floats(1, 40))
def test_clip_bounds(rings, cx, cy, cw, ch):
    """0 <= clip area <= min(polygon area, window area); clipping to a
    window containing the whole polygon is the identity."""
    area = rings_area(rings)
    a = clip_area_rect(rings, cx, cy, cx + cw, cy + ch)
    assert -1e-9 <= a <= min(area, cw * ch) + 1e-6 * max(area, 1.0)
    big = clip_area_rect(rings, -200, -200, 200, 200)
    assert abs(big - area) <= 1e-9 * max(area, 1.0)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(convex_polygon(), st.integers(0, 100))
def test_pip_agrees_with_clip(rings, seed):
    """A point strictly inside (by PIP) must sit in a positive-coverage
    region: clipping a tiny box around it yields positive area, and a
    point far outside is never inside."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-60, 60, size=(50, 2))
    inside = points_in_rings(pts[:, 0], pts[:, 1], rings)
    eps = 1e-3
    for (px, py), is_in in zip(pts, inside):
        a = clip_area_rect(rings, px - eps, py - eps, px + eps, py + eps)
        if is_in:
            assert a > 0.0
    far = points_in_rings(np.array([1e6]), np.array([1e6]), rings)
    assert not far[0]


@settings(max_examples=40, deadline=None, derandomize=True)
@given(rectilinear_polygon(), st.floats(-5, 35), st.floats(-5, 25), st.floats(2, 20), st.floats(2, 20))
def test_clip_is_idempotent(rings, cx, cy, cw, ch):
    """Clipping an already-clipped polygon to the same window is a no-op
    (Sutherland-Hodgman stability)."""
    once = clip_rings_rect(rings, cx, cy, cx + cw, cy + ch)
    twice = clip_rings_rect(once, cx, cy, cx + cw, cy + ch)
    assert abs(rings_area(once) - rings_area(twice)) <= 1e-9


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
    st.sampled_from([250.0, 1000.0, 2500.0]),
    st.integers(16, 256),
    st.floats(-5000, 5000),
)
def test_assign_cells_matches_reference_math(xs, ys, res, tsc, origin):
    """Tile/local-coordinate assignment equals an independent per-value
    reimplementation of the reference v1 math (gridtiler.py:101-118) at
    random origins/resolutions, including negative coordinates."""
    import math

    import pyarrow as pa

    from pygridmap_ray.tiler import assign_cells

    n = min(len(xs), len(ys))
    t = pa.table({"x": xs[:n], "y": ys[:n]})
    out = assign_cells(
        t, resolution=res, tile_size_cell=tsc, x_origin=origin, y_origin=origin
    ).to_pandas()
    for i in range(n):
        xt = math.floor((xs[i] - origin) / (res * tsc))
        lx = math.floor((xs[i] - origin) / res - xt * tsc)
        assert out["xt"][i] == xt
        assert out["local_x"][i] == lx
        # the v1 formula itself can round to exactly tsc when x sits a
        # float-epsilon below a tile boundary — the REFERENCE only warns
        # there (gridtiler.py:111-118), and the SQL twin computes the same
        # value, so the engine reproduces rather than clamps it
        assert 0 <= lx <= tsc
        yt = math.floor((ys[i] - origin) / (res * tsc))
        assert out["yt"][i] == yt
