"""Terrain-analysis raster operators: flow accumulation, cost distance,
viewshed — law-level invariants against brute-force recomputation."""

import numpy as np
import pytest

from pygridmap_ray.raster import NODATA, BowlRaster, SyntheticRaster


def _bowl_field(h=32, w=32):
    r = BowlRaster(height=h, width=w)
    z = r.read_window("elev", 0, 0, h, w)
    return r, z


def test_flow_accum_bellman_identity(ray_session):
    from pygridmap_ray.raster import flow_accumulation, _D8

    h = w = 32
    r, z = _bowl_field(h, w)
    out = flow_accumulation(r, tile_size_cell=16).to_pandas()
    ci = np.rint(out["x"].to_numpy() / 1000.0).astype(int)
    ri = (h - 1 - np.rint(out["y"].to_numpy() / 1000.0)).astype(int)
    acc = dict(zip(zip(ri, ci), out["acc"].to_numpy()))

    # recompute D8 next-cell brute force and check A[t] = sum (A[u] + 1)
    valid = np.ones((h, w), bool)
    for rr in range(h):
        for cc in range(w):
            win = z[max(rr - 1, 0) : rr + 2, max(cc - 1, 0) : cc + 2]
            if (
                rr == 0
                or cc == 0
                or rr == h - 1
                or cc == w - 1
                or (win == NODATA).any()
            ):
                valid[rr, cc] = False
    assert set(acc) == {tuple(p) for p in np.argwhere(valid)}
    nxt = {}
    for rr, cc in np.argwhere(valid):
        drops = [
            (z[rr, cc] - z[rr + dr, cc + dc])
            / (1000.0 * np.sqrt(2.0) if dr and dc else 1000.0)
            for dr, dc, _ in _D8
        ]
        best = int(np.argmax(drops))
        if drops[best] > 0:
            dr, dc, _ = _D8[best]
            t = (rr + dr, cc + dc)
            if t in acc:
                nxt[(rr, cc)] = t
    expect = {k: 0 for k in acc}
    # acyclic: iterate until stable
    changed = True
    while changed:
        changed = False
        new = {k: 0 for k in acc}
        for u, t in nxt.items():
            new[t] += expect[u] + 1
        if new != expect:
            expect, changed = new, True
    assert acc == expect


def test_cost_distance_is_optimal(ray_session):
    from pygridmap_ray.raster import cost_distance

    h = w = 28
    r = SyntheticRaster(height=h, width=w)
    z = r.read_window("pop", 0, 0, h, w)
    out = cost_distance(r, (14, 14)).to_pandas()
    ci = np.rint(out["x"].to_numpy() / 1000.0).astype(int)
    ri = (h - 1 - np.rint(out["y"].to_numpy() / 1000.0)).astype(int)
    dist = np.full((h, w), np.inf)
    dist[ri, ci] = out["cost"].to_numpy()
    assert dist[14, 14] == 0.0
    # Bellman optimality: d[c] = min over neighbors d[n] + cost(c)
    for rr, cc in zip(ri, ci):
        if (rr, cc) == (14, 14):
            continue
        best = min(
            dist[rr + dr, cc + dc]
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0))
            if 0 <= rr + dr < h and 0 <= cc + dc < w
        )
        assert dist[rr, cc] == best + (z[rr, cc] + 1.0)
    # nodata cells are never reached
    assert not np.isfinite(dist[z == NODATA]).any()


def test_viewshed_adjacent_always_visible(ray_session):
    from pygridmap_ray.raster import viewshed_raster

    h = w = 40
    r = SyntheticRaster(height=h, width=w)
    out = viewshed_raster(r, (20, 20), tile_size_cell=16).to_pandas()
    ci = np.rint(out["x"].to_numpy() / 1000.0).astype(int)
    ri = (h - 1 - np.rint(out["y"].to_numpy() / 1000.0)).astype(int)
    vis = dict(zip(zip(ri, ci), out["vis"].to_numpy()))
    z = r.read_window("elev", 0, 0, h, w)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            cell = (20 + dr, 20 + dc)
            if cell == (20, 20):
                assert cell not in vis  # observer excluded
            elif z[cell] != NODATA:
                assert vis[cell] == 1  # K=1: nothing can block


def test_viewshed_brute_force_rays(ray_session):
    from pygridmap_ray.raster import viewshed_raster

    h = w = 40
    ro = co = 20
    r = SyntheticRaster(height=h, width=w)
    z = r.read_window("elev", 0, 0, h, w)
    out = viewshed_raster(r, (ro, co), tile_size_cell=16).to_pandas()
    ci = np.rint(out["x"].to_numpy() / 1000.0).astype(int)
    ri = (h - 1 - np.rint(out["y"].to_numpy() / 1000.0)).astype(int)
    vis = dict(zip(zip(ri, ci), out["vis"].to_numpy()))
    zo = z[ro, co]
    rng = np.random.default_rng(2)
    cells = list(vis)
    for idx in rng.choice(len(cells), 60, replace=False):
        rt, ct = cells[idx]
        k = max(abs(rt - ro), abs(ct - co))
        blocked = False
        for i in range(1, k):
            sr = ro + int(np.floor(((rt - ro) * i) / k + 0.5))
            sc = co + int(np.floor(((ct - co) * i) / k + 0.5))
            if z[sr, sc] == NODATA:
                continue
            if (z[sr, sc] - zo) / i >= (z[rt, ct] - zo) / k:
                blocked = True
                break
        assert vis[(rt, ct)] == (0 if blocked else 1)


def test_watershed_sinks_are_fixpoints(ray_session):
    from pygridmap_ray.raster import BowlRaster, watershed_raster

    h = w = 32
    out = watershed_raster(BowlRaster(height=h, width=w), tile_size_cell=16).to_pandas()
    ci = np.rint(out["x"].to_numpy() / 1000.0).astype(int)
    ri = (h - 1 - np.rint(out["y"].to_numpy() / 1000.0)).astype(int)
    lab = dict(zip(zip(ri, ci), zip(out["sink_ri"], out["sink_ci"])))
    # every sink labels itself, and every label is a valid pixel
    for cell, sink in lab.items():
        sink = (int(sink[0]), int(sink[1]))
        assert sink in lab
        assert lab[sink] == sink


def test_cost_path_is_contiguous_and_monotone(ray_session):
    from pygridmap_ray.raster import SyntheticRaster, cost_path

    out = cost_path(SyntheticRaster(height=28, width=28), (14, 14)).to_pandas()
    out = out.sort_values("seq", ignore_index=True)
    assert out["cost"].iloc[-1] == 0.0  # path ends at the source
    dx = np.abs(np.diff(out["x"].to_numpy()))
    dy = np.abs(np.diff(out["y"].to_numpy()))
    assert ((dx + dy) == 1000.0).all()  # 4-neighbor steps
    assert (np.diff(out["cost"].to_numpy()) < 0).all()  # strictly cheaper


def test_skyline_matches_brute_force():
    from pygridmap_ray.pipelines.queries import _skyline_idx

    rng = np.random.default_rng(9)
    for _ in range(80):
        n = int(rng.integers(2, 60))
        # small integer lattice -> plenty of duplicates and ties
        x = rng.integers(0, 8, n).astype(np.float64)
        y = rng.integers(0, 8, n).astype(np.float64)
        got = sorted(_skyline_idx(x, y).tolist())
        exp = [
            a
            for a in range(n)
            if not any(
                x[b] <= x[a]
                and y[b] <= y[a]
                and (x[b] < x[a] or y[b] < y[a])
                for b in range(n)
            )
        ]
        assert got == exp


def _rasterio_available():
    try:
        import rasterio  # noqa: F401

        return True
    except ImportError:
        return False


def test_rasterio_adapter_gated():
    """Without rasterio the adapter must raise a CLEAR ImportError at
    construction — never a silent stub."""
    import pytest as _pytest

    from pygridmap_ray.raster import RasterioRaster

    if _rasterio_available():
        _pytest.skip("rasterio present; gating path not reachable")
    with _pytest.raises(ImportError, match="rasterio"):
        RasterioRaster("/tmp/nonexistent.tif")


def test_rasterio_adapter_when_available(tmp_path):
    """Activates wherever rasterio exists: a tiny in-memory GeoTIFF must
    flow through the SAME tiling driver as SyntheticRaster."""
    import pytest as _pytest

    if not _rasterio_available():
        _pytest.skip("rasterio not installed (env-blocked)")
    import rasterio
    from rasterio.transform import from_origin

    from pygridmap_ray.raster import RasterioRaster

    path = str(tmp_path / "t.tif")
    data = np.arange(64, dtype=np.float64).reshape(8, 8)
    with rasterio.open(
        path, "w", driver="GTiff", height=8, width=8, count=1,
        dtype="float64", transform=from_origin(0, 8000, 1000, 1000),
    ) as dst:
        dst.write(data, 1)
    src = RasterioRaster(path, bands={"pop": 1})
    assert (src.height, src.width) == (8, 8)
    w = src.read_window("pop", 2, 3, 2, 2)
    assert w.shape == (2, 2) and w[0, 0] == data[2, 3]
