"""Vectorized planar geometry kernels (pure numpy, no GEOS).

These replace the shapely operations the reference delegates to:

- shoelace area           <- ``geom.area``            (reference overlay.py:273,332)
- point-in-polygon        <- ``geom.within``          (reference gridding.py:181)
- clip polygon to rect    <- ``geom.intersection``    (reference overlay.py:275,296)
- rect/polygon relation   <- ``within``/``intersects`` tile tests
                                                      (reference gridding.py:150-151)

All polygons are "ring lists": a Python list of ``(N, 2)`` float64 numpy
arrays.  The first ring of a part is the exterior (CCW, positive signed
area); holes are CW (negative signed area); multi-part polygons simply
concatenate more rings.  Point containment uses the even-odd rule, so
orientation only matters for signed-area bookkeeping.

Boundary convention (documented divergence from GEOS): ``intersects``
means *area-positive* overlap (``clip area > tol``), not boundary touch.
``within`` means ``clip area == rect area`` (up to tol).  The reference's
notebook tests only ever assert on areas and attribute values, never on
touch-only relations, so this convention is conformance-safe; it is also
what the DuckDB oracle computes.
"""

from __future__ import annotations

import numpy as np

#: geometric tolerance, mirrors the reference's TOL_EPS (base.py:108)
TOL_EPS = 1e-5

Ring = np.ndarray  # (N, 2) float64, closed or open (first==last optional)
Rings = list  # list[Ring]


def as_ring(points) -> Ring:
    """Coerce to an (N,2) float64 array, dropping a duplicated closing vertex."""
    r = np.asarray(points, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] != 2:
        raise ValueError(f"ring must be (N,2), got {r.shape}")
    if len(r) > 1 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        r = r[:-1]
    return r


def ring_signed_area(ring: Ring) -> float:
    """Shoelace signed area of one ring (open representation)."""
    r = ring
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def rings_area(rings: Rings) -> float:
    """Net polygon area: sum of signed ring areas (holes CW subtract)."""
    return float(sum(ring_signed_area(r) for r in rings))


def rings_bbox(rings: Rings) -> tuple[float, float, float, float]:
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: Rings) -> np.ndarray:
    """Even-odd-rule containment for many points against one polygon.

    Replaces the per-cell shapely ``within`` test (reference
    gridding.py:181).  Two vectorized paths: a fully-broadcast (edges x
    points) kernel when the crossing matrix fits in cache, else a per-edge
    loop vectorized over points (identical arithmetic, identical results).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    m = px.size
    for ring in rings:
        n = len(ring)
        if n < 3:
            continue
        x1 = ring[:, 0]
        y1 = ring[:, 1]
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        if n * m <= 2_000_000 and m > 0:
            # broadcast: (E, 1) against (M,) -> (E, M)
            b = y1[:, None]
            d = y2[:, None]
            crosses = (b > py) != (d > py)
            dy = np.where(d != b, d - b, 1.0)
            xint = x1[:, None] + (py - b) * (x2[:, None] - x1[:, None]) / dy
            hits = crosses & (px < xint)
            inside ^= (hits.sum(axis=0) & 1).astype(bool)
            continue
        for i in range(n):
            a, b, c, d = x1[i], y1[i], x2[i], y2[i]
            if b == d:  # horizontal edge never crosses a horizontal ray
                continue
            crosses = (b > py) != (d > py)
            if not crosses.any():
                continue
            xint = a + (py - b) * (c - a) / (d - b)
            inside ^= crosses & (px < xint)
    return inside


def clip_ring_rect(
    ring: Ring, xmin: float, ymin: float, xmax: float, ymax: float
) -> Ring:
    """Sutherland-Hodgman clip of one ring against an axis-aligned rect.

    Valid because one side is always a convex (rectangular) window — this is
    the engine's replacement for ``geom.intersection(cell)`` /
    ``gpd.overlay`` (reference overlay.py:275,296-297).
    """
    pts = ring
    # (inside predicate, intersection interpolator) per half-plane
    for axis, bound, keep_ge in (
        (0, xmin, True),
        (0, xmax, False),
        (1, ymin, True),
        (1, ymax, False),
    ):
        n = len(pts)
        if n == 0:
            return pts
        coord = pts[:, axis]
        ins = coord >= bound if keep_ge else coord <= bound
        if ins.all():
            continue
        out_pts = []
        for i in range(n):
            j = (i + 1) % n
            pi, pj = pts[i], pts[j]
            ii, ij = ins[i], ins[j]
            if ii:
                out_pts.append(pi)
            if ii != ij:
                t = (bound - pi[axis]) / (pj[axis] - pi[axis])
                out_pts.append(pi + t * (pj - pi))
        pts = (
            np.array(out_pts, dtype=np.float64)
            if out_pts
            else np.empty((0, 2), dtype=np.float64)
        )
    return pts


def clip_rings_rect(
    rings: Rings, xmin: float, ymin: float, xmax: float, ymax: float
) -> Rings:
    out = []
    for r in rings:
        c = clip_ring_rect(r, xmin, ymin, xmax, ymax)
        if len(c) >= 3:
            out.append(c)
    return out


def clip_area_rect(
    rings: Rings, xmin: float, ymin: float, xmax: float, ymax: float
) -> float:
    """Area of polygon ∩ rect (exact for the clipped shape)."""
    return rings_area(clip_rings_rect(rings, xmin, ymin, xmax, ymax))


def segments_of(rings: Rings) -> np.ndarray:
    """All directed edges of a ring list as an (E, 4) array [x1 y1 x2 y2]."""
    segs = []
    for r in rings:
        if len(r) < 2:
            continue
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.concatenate([r, nxt], axis=1))
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    return np.concatenate(segs, axis=0)


def cells_coverage(
    rings: Rings,
    x0: float,
    y0: float,
    w: float,
    h: float,
    nx: int,
    ny: int,
) -> np.ndarray:
    """Exact coverage area of a polygon over a regular (ny, nx) cell grid.

    Cell ``(iy, ix)`` spans ``[x0+ix*w, x0+(ix+1)*w] x [y0+iy*h, y0+(iy+1)*h]``.
    Returns an (ny, nx) float64 array of overlap areas.

    Strategy (the per-tile kernel behind GridMaker/GridOverlay flags,
    reference gridding.py:132-188): cells touched by a polygon edge
    ("boundary cells") get an exact Sutherland-Hodgman clip; all other
    cells are uniform — resolved in one vectorized point-in-polygon test of
    their centers (full coverage if inside, zero otherwise).  Boundary-cell
    count scales with perimeter/cellsize, interior cells are O(1) each.
    """
    cov = np.zeros((ny, nx), dtype=np.float64)
    if not rings:
        return cov
    tile_rings = clip_rings_rect(rings, x0, y0, x0 + nx * w, y0 + ny * h)
    if not tile_rings:
        return cov

    # mark boundary cells: cells whose rect overlaps an edge's bbox.
    boundary = np.zeros((ny, nx), dtype=bool)
    segs = segments_of(tile_rings)
    ex0 = np.minimum(segs[:, 0], segs[:, 2])
    ex1 = np.maximum(segs[:, 0], segs[:, 2])
    ey0 = np.minimum(segs[:, 1], segs[:, 3])
    ey1 = np.maximum(segs[:, 1], segs[:, 3])
    ix0 = np.clip(np.floor((ex0 - x0) / w).astype(np.int64), 0, nx - 1)
    ix1 = np.clip(np.floor((ex1 - x0) / w - TOL_EPS).astype(np.int64), 0, nx - 1)
    iy0 = np.clip(np.floor((ey0 - y0) / h).astype(np.int64), 0, ny - 1)
    iy1 = np.clip(np.floor((ey1 - y0) / h - TOL_EPS).astype(np.int64), 0, ny - 1)
    ix1 = np.maximum(ix1, ix0)
    iy1 = np.maximum(iy1, iy0)
    for k in range(len(segs)):
        boundary[iy0[k] : iy1[k] + 1, ix0[k] : ix1[k] + 1] = True

    # interior cells: vectorized even-odd test on cell centers
    interior = ~boundary
    if interior.any():
        iys, ixs = np.nonzero(interior)
        cx = x0 + (ixs + 0.5) * w
        cy = y0 + (iys + 0.5) * h
        inside = points_in_rings(cx, cy, tile_rings)
        cov[iys[inside], ixs[inside]] = w * h

    # boundary cells: exact clip
    iys, ixs = np.nonzero(boundary)
    for iy, ix in zip(iys.tolist(), ixs.tolist()):
        cx0 = x0 + ix * w
        cy0 = y0 + iy * h
        a = clip_area_rect(tile_rings, cx0, cy0, cx0 + w, cy0 + h)
        if a > 0:
            cov[iy, ix] = a
    return cov


def rect_relation(
    rings: Rings, xmin: float, ymin: float, xmax: float, ymax: float
) -> int:
    """Relation of a rect to a polygon: 0=outside, 1=intersects, 2=within.

    Area-based (see module docstring); replaces the tile-level
    ``within``/``intersects`` mask tests (reference gridding.py:145-151).
    """
    area = clip_area_rect(rings, xmin, ymin, xmax, ymax)
    rect_area = (xmax - xmin) * (ymax - ymin)
    if area <= TOL_EPS * max(rect_area, 1.0):
        return 0
    if area >= rect_area * (1.0 - TOL_EPS):
        return 2
    return 1


def bbox_to_ring(
    xmin: float, ymin: float, xmax: float, ymax: float, density: int = 0
) -> Ring:
    """Rect bbox -> CCW ring, optionally densified with ``density`` extra
    collinear vertices per side (reference base.py:237-254)."""
    if density and density > 0:
        tx = np.linspace(xmin, xmax, density + 2)
        ty = np.linspace(ymin, ymax, density + 2)
        bottom = np.stack([tx[:-1], np.full(density + 1, ymin)], axis=1)
        right = np.stack([np.full(density + 1, xmax), ty[:-1]], axis=1)
        top = np.stack([tx[::-1][:-1], np.full(density + 1, ymax)], axis=1)
        left = np.stack([np.full(density + 1, xmin), ty[::-1][:-1]], axis=1)
        return np.concatenate([bottom, right, top, left], axis=0)
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )


def bbox_intersection(*bboxes) -> tuple[float, float, float, float] | None:
    """Reduce-fold bbox intersection (reference base.py:439-445)."""
    xmin = max(b[0] for b in bboxes)
    ymin = max(b[1] for b in bboxes)
    xmax = min(b[2] for b in bboxes)
    ymax = min(b[3] for b in bboxes)
    if xmin >= xmax or ymin >= ymax:
        return None
    return (xmin, ymin, xmax, ymax)


def bbox_union(*bboxes) -> tuple[float, float, float, float]:
    """Reduce-fold bbox union (reference base.py:497-503)."""
    return (
        min(b[0] for b in bboxes),
        min(b[1] for b in bboxes),
        max(b[2] for b in bboxes),
        max(b[3] for b in bboxes),
    )


def clip_ring_convex(ring: Ring, clip: Ring) -> Ring:
    """Sutherland-Hodgman clip of one ring against a CONVEX CCW clip
    polygon — the layer x layer generalization of :func:`clip_ring_rect`
    (which remains the fast path for axis-aligned windows).  Closes the
    reference's general ``gpd.overlay`` surface (reference
    overlay.py:296-297) for convex clip layers; concave x concave
    overlay decomposes the clip side into convex pieces first.

    The subject may be arbitrary (concave, CW hole rings): SH emits
    degenerate zero-area bridges for disconnected intersections, so the
    SIGNED AREA of the output is exact and orientation is preserved
    (holes stay negative).  Vertex-order output is for area/centroid
    laws, not for re-clipping."""
    pts = ring
    m = len(clip)
    for e in range(m):
        n = len(pts)
        if n == 0:
            return pts
        ax, ay = clip[e]
        bx, by = clip[(e + 1) % m]
        ex, ey = bx - ax, by - ay
        # signed cross: >= 0 is inside (left of edge) for a CCW clip
        d = ex * (pts[:, 1] - ay) - ey * (pts[:, 0] - ax)
        ins = d >= 0.0
        if ins.all():
            continue
        out_pts = []
        for i in range(n):
            j = (i + 1) % n
            ii, ij = ins[i], ins[j]
            if ii:
                out_pts.append(pts[i])
            if ii != ij:
                t = d[i] / (d[i] - d[j])
                out_pts.append(pts[i] + t * (pts[j] - pts[i]))
        pts = (
            np.array(out_pts, dtype=np.float64)
            if out_pts
            else np.empty((0, 2), dtype=np.float64)
        )
    return pts


def clip_rings_convex(rings: Rings, clip: Ring) -> Rings:
    out = []
    for r in rings:
        c = clip_ring_convex(r, clip)
        if len(c) >= 3:
            out.append(c)
    return out


def clip_area_convex(rings: Rings, clip: Ring) -> float:
    """Signed-area sum of the convex-clipped rings (holes subtract)."""
    return float(
        sum(ring_signed_area(c) for c in clip_rings_convex(rings, clip))
    )


def _points_in_tri(P: np.ndarray, a, b, c, eps: float) -> np.ndarray:
    """Strict-interior test of points P against CCW triangle abc."""
    d0 = (b[0] - a[0]) * (P[:, 1] - a[1]) - (b[1] - a[1]) * (P[:, 0] - a[0])
    d1 = (c[0] - b[0]) * (P[:, 1] - b[1]) - (c[1] - b[1]) * (P[:, 0] - b[0])
    d2 = (a[0] - c[0]) * (P[:, 1] - c[1]) - (a[1] - c[1]) * (P[:, 0] - c[0])
    return (d0 > eps) & (d1 > eps) & (d2 > eps)


def _triangulate_simple(r: Ring) -> list[Ring]:
    """Core ear clip over an already-oriented CCW ring; raises on a
    ring where no ear exists (see :func:`triangulate_ring` for the
    healing wrapper that catches this)."""
    scale = max(r[:, 0].ptp(), r[:, 1].ptp()) or 1.0
    eps = 1e-12 * scale * scale
    idx = list(range(len(r)))
    tris: list[Ring] = []
    while len(idx) > 3:
        n = len(idx)
        best_flat = None  # smallest-|cross| vertex, the degeneracy escape
        best_mag = np.inf
        found = False
        for k in range(n):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) \
                - (b[1] - a[1]) * (c[0] - a[0])
            if abs(cross) < best_mag:
                best_mag, best_flat = abs(cross), k
            if cross <= eps:
                continue  # reflex or collinear — not an ear
            others = [j for j in idx if j not in (i0, i1, i2)]
            if others and _points_in_tri(r[others], a, b, c, -eps).any():
                continue
            tris.append(np.array([a, b, c], dtype=np.float64))
            idx.pop(k)
            found = True
            break
        if not found:
            if best_mag > eps:  # simple-polygon precondition violated
                raise ValueError("triangulate_ring: no ear found "
                                 "(self-intersecting ring?)")
            idx.pop(best_flat)  # collinear vertex — removable, zero area
    if len(idx) == 3:
        t = r[idx]
        if ring_signed_area(t) > 0:
            tris.append(t)
    return tris


def _split_pinch(r: Ring, tol: float) -> tuple[Ring, Ring] | None:
    """Find the first pair of NON-adjacent (near-)coincident vertices —
    a self-TOUCHING pinch point — and split the ring into its two lobes
    there (both keep the pinch vertex once).  Returns None when the
    ring has no pinch within ``tol``."""
    n = len(r)
    t2 = tol * tol
    for i in range(n - 2):
        d2 = ((r[i + 2:] - r[i]) ** 2).sum(axis=1)
        for off in np.flatnonzero(d2 <= t2):
            j = i + 2 + int(off)
            if i == 0 and j == n - 1:
                continue  # first/last adjacency around the wrap
            return r[i:j], np.concatenate([r[j:], r[:i]], axis=0)
    return None


def triangulate_ring(ring: Ring) -> list[Ring]:
    """Ear-clipping triangulation of a SIMPLE (non-self-intersecting)
    ring, any orientation -> CCW triangles that exactly tile it.  O(n^2)
    — meant for clip-layer polygons that are triangulated ONCE on the
    driver and broadcast, never for per-row geometry.  Degenerate
    (collinear) vertices are dropped as zero-area ears.

    Healing pre/retry pass (the engine's analog of the reference's
    TopologyException retry, reference overlay.py:299-309): when no ear
    exists, the ring is first healed with :func:`heal_ring` at TOL_EPS
    (snap-duplicate vertex dedup, spike/collinear drop, zero-area ring
    drop — a healed-empty ring triangulates to zero triangles instead
    of raising), then a self-TOUCHING pinch (two non-adjacent vertices
    within TOL_EPS) is split into its lobes, each triangulated
    recursively.  A truly self-CROSSING ring still raises — its
    intended interior is ambiguous (use the parity kernels for the
    even-odd reading)."""
    r = as_ring(np.asarray(ring, dtype=np.float64))
    if len(r) < 3:
        return []
    if ring_signed_area(r) < 0:
        r = r[::-1]
    try:
        return _triangulate_simple(r)
    except ValueError:
        healed = heal_ring(r, TOL_EPS)
        if len(healed) < 3:
            return []  # zero-area / collapsed ring: nothing to tile
        if len(healed) != len(r) or not np.array_equal(healed, r):
            return triangulate_ring(healed)
        pinch = _split_pinch(r, TOL_EPS)
        if pinch is not None:
            a, b = pinch
            return triangulate_ring(a) + triangulate_ring(b)
        raise


def clip_area_poly(rings: Rings, clip: Ring) -> float:
    """Signed intersection area of ``rings`` with an ARBITRARY simple
    clip polygon: the clip is ear-clipped into CCW triangles (exact
    tiling, so areas add) and each triangle clips via
    :func:`clip_area_convex`.  Triangulate once and reuse
    :func:`clip_area_convex` directly when calling in a loop."""
    return float(
        sum(clip_area_convex(rings, t) for t in triangulate_ring(clip))
    )


def heal_ring(ring: Ring, tol: float = 0.0) -> Ring:
    """Degeneracy healing for one ring — the engine's analog of the
    reference's TopologyException retry (``unary_union`` +
    ``buffer(buff_geom_prec)``, reference overlay.py:299-309), for the
    degeneracies that retry actually repairs in its exercised paths:

    - consecutive (near-)duplicate vertices collapse (within ``tol``);
    - zero-area spikes (A-B-A reversals) and exactly-collinear interior
      vertices drop, iterated to a fixed point;
    - rings reduced below 3 vertices or below ``tol^2`` absolute area
      return empty.

    True self-intersection repair (the ``buffer(0)`` node-and-rebuild)
    is intentionally NOT attempted: a bowtie's intended interior is
    ambiguous, and the signed-area laws downstream already treat
    crossing lobes consistently (opposite lobes cancel).  Documented
    behavior, matching SURVEY §7.5 scope."""
    r = as_ring(np.asarray(ring, dtype=np.float64))
    t2 = tol * tol
    for _ in range(len(r) + 1):  # each pass removes >= 1 vertex or stops
        n = len(r)
        if n < 3:
            return np.empty((0, 2), dtype=np.float64)
        prv = np.roll(r, 1, axis=0)
        nxt = np.roll(r, -1, axis=0)
        dup = ((r - prv) ** 2).sum(axis=1) <= t2
        e1 = r - prv
        e2 = nxt - r
        cross = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        dot = (e1 * e2).sum(axis=1)
        spike = (np.abs(cross) <= t2) & (dot < 0.0)  # reversal
        flat = (cross == 0.0) & (dot >= 0.0)  # exactly collinear
        drop = dup | spike | flat
        if not drop.any():
            break
        # drop one vertex per pass (the first flagged) — neighbor masks
        # computed on the stale ring would over-delete
        r = np.delete(r, int(np.flatnonzero(drop)[0]), axis=0)
    if len(r) < 3 or abs(ring_signed_area(r)) <= max(t2, 0.0):
        return np.empty((0, 2), dtype=np.float64)
    return r


def heal_rings(rings: Rings, tol: float = 0.0) -> Rings:
    """Heal every ring, dropping the ones that collapse; ring ORDER and
    ORIENTATION are preserved (holes stay CW)."""
    out = []
    for r in rings:
        h = heal_ring(r, tol)
        if len(h) >= 3:
            out.append(h)
    return out


# --- parity (even-odd) healing for SELF-INTERSECTING rings -------------------
# The reference repairs TopologyException inputs with ``unary_union`` +
# ``buffer(buff_geom_prec)`` (reference overlay.py:299-309); for a
# self-intersecting ring that node-and-rebuild yields the even-odd
# interior (a bowtie becomes its two lobes).  The kernels below compute
# that healed interior's measure DIRECTLY — area and rect-clipped area
# under the parity rule — via a scanline slab decomposition, without ever
# reconstructing valid rings.  They are driver/broadcast-side kernels
# (clip layers are small); per-row quad healing has a vectorized closed
# form in :func:`quad_parity_area`.


def _parity_slabs(rings: Rings):
    """Slab decomposition of a possibly self-intersecting ring list.

    Returns ``(ys, segs)``: sorted unique slab-boundary y's (every vertex
    y plus every pairwise proper-intersection y, so no two segments cross
    strictly inside a slab) and the (E, 4) non-degenerate segment array.
    """
    segs = segments_of(rings)
    if len(segs) == 0:
        return np.empty(0), segs
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    segs = segs[keep]
    if len(segs) == 0:
        return np.empty(0), segs
    ys = [segs[:, 1], segs[:, 3]]
    # pairwise proper intersections, vectorized over the E x E grid
    px, py, qx, qy = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    rx, ry = qx - px, qy - py
    denom = rx[:, None] * ry[None, :] - ry[:, None] * rx[None, :]
    dpx = px[None, :] - px[:, None]
    dpy = py[None, :] - py[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (dpx * ry[None, :] - dpy * rx[None, :]) / denom
        u = (dpx * ry[:, None] - dpy * rx[:, None]) / denom
    hit = (
        (denom != 0.0) & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
    )
    if hit.any():
        i, _ = np.nonzero(hit)
        ys.append(py[i] + t[hit] * ry[i])
    return np.unique(np.concatenate(ys)), segs


def _slab_intervals(segs: np.ndarray, ylo: float, yhi: float):
    """x-intervals of the parity interior over one slab.

    Returns ``(xlo_l, xhi_l, xlo_r, xhi_r)`` arrays — the left/right
    boundary x's evaluated at the slab bottom and top, one row per
    interior interval (crossings paired 0-1, 2-3, ...).
    """
    ymid = 0.5 * (ylo + yhi)
    y1, y2 = segs[:, 1], segs[:, 3]
    act = (np.minimum(y1, y2) <= ylo) & (np.maximum(y1, y2) >= yhi) & (
        y1 != y2
    )
    if not act.any():
        z = np.empty(0)
        return z, z, z, z
    s = segs[act]
    dx = (s[:, 2] - s[:, 0]) / (s[:, 3] - s[:, 1])
    xb = s[:, 0] + (ylo - s[:, 1]) * dx
    xt = s[:, 0] + (yhi - s[:, 1]) * dx
    xm = s[:, 0] + (ymid - s[:, 1]) * dx
    order = np.lexsort((xb, xm))
    xb, xt = xb[order], xt[order]
    n2 = (len(xb) // 2) * 2
    return xb[0:n2:2], xt[0:n2:2], xb[1:n2:2], xt[1:n2:2]


def parity_area(rings: Rings) -> float:
    """Even-odd ("healed") area of a possibly SELF-INTERSECTING ring
    list.  Agrees with ``abs(rings_area)`` on simple polygons (holes
    subtract under parity exactly as signed areas do); on a bowtie it
    returns the sum of the lobe areas where the shoelace cancels to 0."""
    ys, segs = _parity_slabs(rings)
    if len(ys) < 2:
        return 0.0
    total = 0.0
    for k in range(len(ys) - 1):
        ylo, yhi = ys[k], ys[k + 1]
        if yhi <= ylo:
            continue
        lb, lt, rb, rt = _slab_intervals(segs, ylo, yhi)
        if len(lb):
            total += 0.5 * (yhi - ylo) * float(np.sum((rb + rt) - (lb + lt)))
    return total


def parity_clip_area_rect(
    rings: Rings, xmin: float, ymin: float, xmax: float, ymax: float
) -> float:
    """Area of (even-odd healed interior) ∩ axis-aligned rect.

    Exact: within a slab each interior interval is bounded by two linear
    edges, so the clipped width ``max(0, min(xr, xmax) - max(xl, xmin))``
    is piecewise linear in y; integrating trapezoid-exactly between the
    breakpoints (where an edge crosses xmin/xmax) gives the closed form.
    This is the healed counterpart of :func:`clip_area_rect` — valid on
    input the Sutherland-Hodgman path would silently mis-measure."""
    ys, segs = _parity_slabs(rings)
    if len(ys) < 2 or xmax <= xmin or ymax <= ymin:
        return 0.0
    total = 0.0
    for k in range(len(ys) - 1):
        ylo, yhi = max(float(ys[k]), ymin), min(float(ys[k + 1]), ymax)
        if yhi <= ylo:
            continue
        lb, lt, rb, rt = _slab_intervals(segs, ys[k], ys[k + 1])
        h = ys[k + 1] - ys[k]
        for i in range(len(lb)):
            # linear boundary x(y) over the FULL slab; clip y to the rect
            lsl = (lt[i] - lb[i]) / h
            rsl = (rt[i] - rb[i]) / h

            def width(y):
                xl = lb[i] + (y - ys[k]) * lsl
                xr = rb[i] + (y - ys[k]) * rsl
                return max(0.0, min(xr, xmax) - max(xl, xmin))

            # breakpoints: either boundary crossing xmin or xmax
            brk = [ylo, yhi]
            for x0, sl in ((lb[i], lsl), (rb[i], rsl)):
                for bound in (xmin, xmax):
                    if sl != 0.0:
                        yb = ys[k] + (bound - x0) / sl
                        if ylo < yb < yhi:
                            brk.append(float(yb))
            brk = sorted(set(brk))
            for a, b in zip(brk[:-1], brk[1:]):
                total += 0.5 * (b - a) * (width(a) + width(b))
    return total


def cells_coverage_parity(
    rings: Rings,
    x0: float,
    y0: float,
    w: float,
    h: float,
    nx: int,
    ny: int,
) -> np.ndarray:
    """:func:`cells_coverage` for a possibly self-intersecting polygon:
    per-cell areas of the parity-healed interior.  Interior cells still
    resolve through the (already even-odd) center containment test;
    boundary cells use :func:`parity_clip_area_rect`.  Driver-side
    healing path — quadratic slab setup, polygon-at-a-time."""
    cov = np.zeros((ny, nx), dtype=np.float64)
    if not rings:
        return cov
    segs = segments_of(rings)
    if len(segs) == 0:
        return cov
    boundary = np.zeros((ny, nx), dtype=bool)
    ex0 = np.minimum(segs[:, 0], segs[:, 2])
    ex1 = np.maximum(segs[:, 0], segs[:, 2])
    ey0 = np.minimum(segs[:, 1], segs[:, 3])
    ey1 = np.maximum(segs[:, 1], segs[:, 3])
    ix0 = np.clip(np.floor((ex0 - x0) / w).astype(np.int64), 0, nx - 1)
    ix1 = np.clip(np.floor((ex1 - x0) / w - TOL_EPS).astype(np.int64), 0, nx - 1)
    iy0 = np.clip(np.floor((ey0 - y0) / h).astype(np.int64), 0, ny - 1)
    iy1 = np.clip(np.floor((ey1 - y0) / h - TOL_EPS).astype(np.int64), 0, ny - 1)
    ix1 = np.maximum(ix1, ix0)
    iy1 = np.maximum(iy1, iy0)
    for k in range(len(segs)):
        boundary[iy0[k] : iy1[k] + 1, ix0[k] : ix1[k] + 1] = True
    interior = ~boundary
    if interior.any():
        iys, ixs = np.nonzero(interior)
        cx = x0 + (ixs + 0.5) * w
        cy = y0 + (iys + 0.5) * h
        inside = points_in_rings(cx, cy, rings)
        cov[iys[inside], ixs[inside]] = w * h
    iys, ixs = np.nonzero(boundary)
    for iy, ix in zip(iys.tolist(), ixs.tolist()):
        cx0 = x0 + ix * w
        cy0 = y0 + iy * h
        a = parity_clip_area_rect(rings, cx0, cy0, cx0 + w, cy0 + h)
        if a > 0:
            cov[iy, ix] = a
    return cov


def quad_parity_area(
    ax, ay, bx, by, cx, cy, dx, dy
) -> np.ndarray:
    """Vectorized parity-healed area of quadrilaterals A-B-C-D.

    The row-scale specialization of :func:`parity_area`: a quad's healed
    interior has a closed form — if an opposite-edge pair properly
    crosses at X, the interior is the two lobes split at X; otherwise the
    quad is simple and the shoelace magnitude is exact.  Each formula is
    written in a fixed operation order so a SQL twin reproduces the
    doubles bit-for-bit (see ``_sql_heal_area``)."""
    ax, ay, bx, by, cx, cy, dx, dy = (
        np.asarray(v, np.float64) for v in (ax, ay, bx, by, cx, cy, dx, dy)
    )

    def tri(x1, y1, x2, y2, x3, y3):
        return np.abs((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) / 2.0

    def lobes(px, py, qx, qy, rx, ry, sx, sy, m1x, m1y, m2x, m2y):
        """Segments PQ x RS; lobe triangles (X,Q,M1) and (X,S,M2)."""
        d3 = (sx - rx) * (py - ry) - (sy - ry) * (px - rx)
        d4 = (sx - rx) * (qy - ry) - (sy - ry) * (qx - rx)
        t = d3 / (d3 - d4)
        xx = px + t * (qx - px)
        xy = py + t * (qy - py)
        return tri(xx, xy, qx, qy, m1x, m1y) + tri(xx, xy, sx, sy, m2x, m2y)

    def crosses(px, py, qx, qy, rx, ry, sx, sy):
        d1 = (qx - px) * (ry - py) - (qy - py) * (rx - px)
        d2 = (qx - px) * (sy - py) - (qy - py) * (sx - px)
        d3 = (sx - rx) * (py - ry) - (sy - ry) * (px - rx)
        d4 = (sx - rx) * (qy - ry) - (sy - ry) * (qx - rx)
        return (d1 * d2 < 0.0) & (d3 * d4 < 0.0)

    shoe = (
        ((ax * by - bx * ay) + (bx * cy - cx * by))
        + (cx * dy - dx * cy)
    ) + (dx * ay - ax * dy)
    simple = np.abs(shoe) / 2.0
    c1 = crosses(ax, ay, bx, by, cx, cy, dx, dy)  # AB x CD
    c2 = crosses(bx, by, cx, cy, dx, dy, ax, ay)  # BC x DA
    with np.errstate(divide="ignore", invalid="ignore"):
        # AB x CD at X: lobes (X,B,C) and (X,D,A)
        a1 = lobes(ax, ay, bx, by, cx, cy, dx, dy, cx, cy, ax, ay)
        # BC x DA at X: lobes (X,C,D) and (X,A,B)
        a2 = lobes(bx, by, cx, cy, dx, dy, ax, ay, dx, dy, bx, by)
    return np.where(c1, a1, np.where(c2, a2, simple))
