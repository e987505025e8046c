"""Hull boundary / dissolve / Voronoi-snap kernels — law-level tests.

The oracle parity of the full pipelines is driven by the sweep; these
tests pin the kernel laws themselves on adversarial (exactly collinear /
overlapping) inputs that the LCG fixtures may or may not hit at a given
scale factor.
"""

import numpy as np
import pytest

from pygridmap_ray.spatial import hull_boundary_chain, hull_boundary_support


def _sql_law(x, y):
    """Literal re-statement of the oracle's supporting-line EXISTS/NOT
    EXISTS over all points — O(n^3), reference only."""
    n = len(x)
    out = []
    for p in range(n):
        found = False
        for b in range(n):
            if b == p:
                continue
            if all(
                (x[b] - x[p]) * (y[c] - y[p]) - (y[b] - y[p]) * (x[c] - x[p])
                >= 0.0
                for c in range(n)
            ):
                found = True
                break
        if found:
            out.append(p)
    return out


def test_hull_matches_sql_law_on_degenerate_lattices():
    rng = np.random.default_rng(11)
    for _ in range(120):
        n = int(rng.integers(3, 12))
        pts = sorted(
            {
                (float(a), float(b))
                for a, b in zip(rng.integers(0, 6, n), rng.integers(0, 6, n))
            }
        )
        if len(pts) < 3:
            continue
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        cand = hull_boundary_chain(x, y, eps=1e-2)
        got = sorted(hull_boundary_support(x, y, cand).tolist())
        assert got == _sql_law(x, y)


def test_hull_chain_is_conservative():
    # every point the exact law keeps must survive the chain combiner
    rng = np.random.default_rng(5)
    for _ in range(40):
        n = int(rng.integers(5, 30))
        x = (rng.integers(0, 1000003, n) / 1000003.0) * 500000.0
        y = (rng.integers(0, 1000033, n) / 1000033.0) * 501000.0
        cand = set(hull_boundary_chain(x, y, eps=1.0).tolist())
        assert set(_sql_law(x, y)) <= cand


def test_hull_boundary_includes_collinear_edge_points():
    x = np.array([0.0, 2.0, 4.0, 2.0, 2.0])
    y = np.array([0.0, 0.0, 0.0, 3.0, 1.0])
    cand = hull_boundary_chain(x, y, eps=1e-9)
    keep = sorted(hull_boundary_support(x, y, cand).tolist())
    # (2,0) lies exactly on the bottom edge -> boundary; (2,1) is interior
    assert keep == [0, 1, 2, 3]


def test_dissolve_union_area_removes_overlap(ray_session):
    from pygridmap_ray.pipelines.queries import q_dissolve_area

    out = q_dissolve_area("/root/testdata/sf0.001").to_pandas()
    out = out.sort_values("grp", ignore_index=True)
    assert len(out) == 3
    # union can never exceed the naive sum, and the overlapping pair
    # (poly 1 / poly 7 share grp 1) must strictly shrink
    assert (out["union_area"] <= out["sum_area"] + 1e-9).all()
    g1 = out[out["grp"] == 1].iloc[0]
    assert g1["union_area"] < g1["sum_area"] - 1.0


def test_dissolve_union_matches_rasterized_truth():
    # brute-force pixel count on the integer-aligned fixture
    from pygridmap_ray.synth import polygon_layer

    groups = {}
    for p in polygon_layer():
        groups.setdefault(int(p["poly_id"]) % 3, []).extend(p["rects"])
    for grp, rects in groups.items():
        grid = np.zeros((50, 51), bool)  # 10 km pixels
        for xmin, ymin, xmax, ymax in rects:
            grid[
                int(xmin // 10_000) : int(xmax // 10_000),
                int(ymin // 10_000) : int(ymax // 10_000),
            ] = True
        expect_km2 = grid.sum() * 100.0  # (10 km)^2 pixels
        x0 = np.array([r[0] / 1000.0 for r in rects])
        y0 = np.array([r[1] / 1000.0 for r in rects])
        x1 = np.array([r[2] / 1000.0 for r in rects])
        y1 = np.array([r[3] / 1000.0 for r in rects])
        xs = np.unique(np.concatenate([x0, x1]))
        ys = np.unique(np.concatenate([y0, y1]))
        mx = (xs[:-1] + xs[1:]) / 2.0
        my = (ys[:-1] + ys[1:]) / 2.0
        cx, cy = np.meshgrid(mx, my, indexing="ij")
        cov = np.zeros(cx.shape, bool)
        for i in range(len(x0)):
            cov |= (x0[i] <= cx) & (cx < x1[i]) & (y0[i] <= cy) & (cy < y1[i])
        w = np.diff(xs)[:, None] * np.diff(ys)[None, :]
        union = float((w * cov).sum())
        assert union == pytest.approx(expect_km2, abs=1e-6)


def test_map_match_projection_law():
    # point projects onto segment interior / clamps to endpoints
    from pygridmap_ray.pipelines.queries import ROAD_SEGS

    s, ax, ay, bx, by = ROAD_SEGS[0]
    l2 = (bx - ax) ** 2 + (by - ay) ** 2
    for px, py, expect_t in [
        (ax, ay, 0.0),
        (bx, by, 1.0),
        ((ax + bx) / 2.0, (ay + by) / 2.0, 0.5),
        (ax - 1e6, ay - 1e6, 0.0),  # far behind A -> clamp 0
    ]:
        t = ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / l2
        t = min(max(t, 0.0), 1.0)
        assert t == pytest.approx(expect_t, abs=1e-9)


def test_geometric_median_beats_centroid(ray_session):
    # Weiszfeld output must not increase the sum of distances vs the
    # cluster centroid (the defining property of the geometric median)
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.queries import q_geometric_median
    from pygridmap_ray.synth import derive_xy

    out = q_geometric_median("/root/testdata/sf0.001").to_pandas()
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    did = np.asarray(t["doc_id"], np.int64)
    did = did[did % 10 < 3]
    x, y = derive_xy(did)
    g = did % 3
    for row in out.itertuples():
        xs, ys = x[g == row.g], y[g == row.g]
        d_med = np.hypot(xs - row.mx, ys - row.my).sum()
        d_cen = np.hypot(xs - xs.mean(), ys - ys.mean()).sum()
        assert d_med <= d_cen + 1e-6
        assert int(row.n) == len(xs)


def test_traj_dp_small_cases(ray_session):
    # DP law pinned on hand-checked 1- and 2-point trajectories
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.queries import (
        HAUS_REF, TRAJ_L, q_traj_frechet, q_traj_dtw,
    )
    from pygridmap_ray.synth import derive_xy

    fre = q_traj_frechet("/root/testdata/sf0.001").to_pandas()
    dtw = q_traj_dtw("/root/testdata/sf0.001").to_pandas()
    assert (fre["n_pts"] <= TRAJ_L).all()
    assert set(fre["user_id"]) == set(dtw["user_id"])
    # frechet <= dtw always (max-of-path vs sum-of-path over >= 1 step)
    j = fre.merge(dtw, on="user_id", suffixes=("_f", "_d"))
    assert (j["dist_f"] <= j["dist_d"] + 1e-9).all()
    # brute-force one user end-to-end
    t = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "event_id", "ts"],
    ).to_pandas()
    u = int(fre["user_id"].iloc[0])
    g = t[t["user_id"] == u].sort_values(["ts", "event_id"]).head(TRAJ_L)
    x, y = derive_xy(g["event_id"].to_numpy(np.int64))
    rx = np.array([p[0] for p in HAUS_REF])
    ry = np.array([p[1] for p in HAUS_REF])
    d = np.sqrt((x[:, None] - rx) ** 2 + (y[:, None] - ry) ** 2)
    n, m = d.shape
    F = np.full((n, m), np.inf)
    for i in range(n):
        for j2 in range(m):
            if i == 0 and j2 == 0:
                F[0, 0] = d[0, 0]
            elif i == 0:
                F[0, j2] = max(d[0, j2], F[0, j2 - 1])
            elif j2 == 0:
                F[i, 0] = max(d[i, 0], F[i - 1, 0])
            else:
                F[i, j2] = max(
                    d[i, j2],
                    min(F[i - 1, j2], F[i, j2 - 1], F[i - 1, j2 - 1]),
                )
    expect = np.floor(abs(F[n - 1, m - 1]) * 1e6 + 0.5) / 1e6
    got = float(fre[fre["user_id"] == u]["dist"].iloc[0])
    assert got == expect


def test_hilbert_is_a_space_filling_curve():
    from pygridmap_ray.pipelines.queries import _hilbert_d

    # bijection on the full 64x64 grid (order 6), and consecutive curve
    # positions are 4-neighbor adjacent (the defining Hilbert property)
    p = 6
    n = 1 << p
    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = _hilbert_d(ix.ravel(), iy.ravel(), p)
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    sx, sy = ix.ravel()[order], iy.ravel()[order]
    step = np.abs(np.diff(sx)) + np.abs(np.diff(sy))
    assert (step == 1).all()


def test_cost_allocation_partitions_reached_cells(ray_session):
    from pygridmap_ray.pipelines.queries import (
        COST_SRCS, _COST_KW, q_raster_cost_allocation,
    )
    from pygridmap_ray.raster import SyntheticRaster, cost_distance

    alloc = q_raster_cost_allocation("/root/testdata/sf0.001").to_pandas()
    assert set(alloc["src"].unique()) <= {0, 1, 2}
    # each cell's allocated cost equals the min of the per-source fields
    per_src = [
        cost_distance(SyntheticRaster(**_COST_KW), s).to_pandas()
        for s in COST_SRCS
    ]
    key = lambda df: {(x, y): c for x, y, c in
                      zip(df["x"], df["y"], df["cost"])}
    maps = [key(d) for d in per_src]
    for x, y, src, cost in zip(
        alloc["x"], alloc["y"], alloc["src"], alloc["cost"]
    ):
        best = min(m.get((x, y), np.inf) for m in maps)
        assert cost == best
        assert maps[int(src)].get((x, y)) == best
