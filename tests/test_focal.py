"""focal.focal_counts — neighbourhood sums over sparse cells."""

import numpy as np
import pyarrow as pa
import pytest


def _run(rows, **kw):
    import ray.data as rd

    from pygridmap_ray.focal import focal_counts

    ds = rd.from_arrow(
        pa.table(
            {
                "ix": pa.array([r[0] for r in rows], pa.int64()),
                "iy": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = focal_counts(ds, **kw).to_pandas()
    return out.sort_values(["ix", "iy"], ignore_index=True)


def test_focal_isolated_cell(ray_session):
    # one occupied cell, 3 points: focal sum = its own count only
    out = _run([(5, 5)] * 3)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_docs"], r["focal_sum"]) == (3, 3)
    assert r["focal_mean"] == pytest.approx(3 / 9.0, abs=1e-6)


def test_focal_adjacent_and_diagonal(ray_session):
    # (0,0)x2, (1,0)x1, (2,2)x5: (0,0) and (1,0) are mutual neighbours;
    # (2,2) is Chebyshev distance 2 from both -> isolated at ksize=1
    out = _run([(0, 0), (0, 0), (1, 0), (2, 2)] + [(2, 2)] * 4)
    got = {(r.ix, r.iy): (r.n_docs, r.focal_sum) for r in out.itertuples()}
    assert got[(0, 0)] == (2, 3)  # self 2 + neighbour (1,0) 1
    assert got[(1, 0)] == (1, 3)  # self 1 + neighbour (0,0) 2
    assert got[(2, 2)] == (5, 5)  # no occupied cell within distance 1


def test_focal_ksize2(ray_session):
    # ksize=2: (0,0) and (2,2) now see each other (Chebyshev distance 2)
    out = _run([(0, 0), (2, 2), (2, 2)], ksize=2)
    got = {(r.ix, r.iy): (r.n_docs, r.focal_sum) for r in out.itertuples()}
    assert got[(0, 0)] == (1, 3)
    assert got[(2, 2)] == (2, 3)
    assert out["focal_mean"].iloc[0] == pytest.approx(3 / 25.0, abs=1e-6)


def test_focal_negative_cell_rejected(ray_session):
    with pytest.raises(Exception):
        _run([(-1, 0)])


def _run_clusters(rows, **kw):
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.focal import cell_clusters

    ds = rd.from_arrow(
        pa.table(
            {
                "ix": pa.array([r[0] for r in rows], pa.int64()),
                "iy": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = cell_clusters(ds, **kw).to_pandas()
    return out.sort_values("cluster_id", ignore_index=True)


def test_clusters_4adjacency_not_diagonal(ray_session):
    # L-shape (0,0)-(1,0)-(1,1) is ONE cluster; (3,3)+(4,4) are diagonal
    # -> TWO singletons (4-adjacency, not 8)
    out = _run_clusters([(0, 0), (1, 0), (1, 1), (3, 3), (4, 4)])
    assert len(out) == 3
    got = {r.cluster_id: (r.n_cells, r.n_docs) for r in out.itertuples()}
    assert got[0] == (3, 3)  # min packed key of the L = (0,0) -> 0
    assert got[3 * (1 << 32) + 3] == (1, 1)
    assert got[4 * (1 << 32) + 4] == (1, 1)


def test_clusters_min_count_threshold(ray_session):
    # (0,0) has 1 doc < min_count=2 -> dropped, breaking the bridge
    # between (1,0)x2 and ... nothing else; (0,1)x3 is its own cluster
    out = _run_clusters(
        [(0, 0), (1, 0), (1, 0), (0, 1), (0, 1), (0, 1)], min_count=2
    )
    assert len(out) == 2
    assert sorted(out["n_docs"].tolist()) == [2, 3]


def test_clusters_doc_floor(ray_session):
    # cluster floor keeps only components totalling >= 4 docs
    out = _run_clusters(
        [(0, 0), (1, 0), (1, 0), (1, 0), (5, 5)], min_cluster_docs=4
    )
    assert len(out) == 1
    assert out["n_docs"].iloc[0] == 4 and out["n_cells"].iloc[0] == 2


def test_majority_tiebreak_lex_smallest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.focal import cell_majority

    # cell (0,0): 2x "fr", 2x "de" -> tie -> "de" (lex smallest); cell
    # (1,1): clear "en" majority with share 2/3
    ds = rd.from_arrow(
        pa.table(
            {
                "ix": pa.array([0, 0, 0, 0, 1, 1, 1], pa.int64()),
                "iy": pa.array([0, 0, 0, 0, 1, 1, 1], pa.int64()),
                "lang": pa.array(["fr", "de", "fr", "de", "en", "en", "fr"]),
            }
        )
    )
    out = cell_majority(ds).to_pandas().sort_values(["ix", "iy"], ignore_index=True)
    assert out.loc[0, "top_cat"] == "de" and out.loc[0, "n_top"] == 2
    assert out.loc[0, "n_total"] == 4 and out.loc[0, "share"] == 0.5
    assert out.loc[1, "top_cat"] == "en" and out.loc[1, "n_total"] == 3
    assert abs(out.loc[1, "share"] - 0.666667) < 1e-9


def test_hillshade_halo_matches_whole_raster(ray_session):
    """Tile-parallel stencil with halo reads == one whole-raster stencil."""
    from pygridmap_ray.raster import (
        NODATA,
        HillshadeKernel,
        SyntheticRaster,
        hillshade_raster,
    )

    r = SyntheticRaster(height=96, width=80, resolution=500.0)
    tiled = (
        hillshade_raster(r, tile_size_cell=32)
        .to_pandas()
        .sort_values(["y", "x"])
        .reset_index(drop=True)
    )
    # whole raster as ONE tile (tile size covers everything)
    whole = HillshadeKernel(r, 128)._tile(0, 0)
    assert whole is not None
    wdf = (
        whole.to_pandas().sort_values(["y", "x"]).reset_index(drop=True)
    )
    assert len(tiled) == len(wdf)
    for c in ["x", "y", "slope", "aspect", "hillshade"]:
        assert np.allclose(tiled[c].to_numpy(), wdf[c].to_numpy()), c

    # every output pixel's 3x3 window is interior and fully valid
    z = r.read_window("elev", 0, 0, r.height, r.width)
    col = ((tiled["x"] - r.x_min) / r.resolution).round().astype(int)
    row = r.height - 1 - ((tiled["y"] - r.y_min) / r.resolution).round().astype(int)
    assert (row > 0).all() and (row < r.height - 1).all()
    assert (col > 0).all() and (col < r.width - 1).all()
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            assert (z[row + dr, col + dc] != NODATA).all()


def test_d8_halo_matches_whole_and_semantics(ray_session):
    from pygridmap_ray.raster import (
        NODATA,
        D8Kernel,
        SyntheticRaster,
        d8_flow_raster,
    )

    r = SyntheticRaster(height=96, width=80, resolution=500.0)
    tiled = (
        d8_flow_raster(r, tile_size_cell=32)
        .to_pandas()
        .sort_values(["y", "x"])
        .reset_index(drop=True)
    )
    whole = (
        D8Kernel(r, 128)
        ._tile(0, 0)
        .to_pandas()
        .sort_values(["y", "x"])
        .reset_index(drop=True)
    )
    assert len(tiled) == len(whole)
    assert (tiled["d8"].to_numpy() == whole["d8"].to_numpy()).all()
    assert set(tiled["d8"].unique()) <= {0, 1, 2, 4, 8, 16, 32, 64, 128}

    # brute re-derivation for a sample of pixels
    z = r.read_window("elev", 0, 0, r.height, r.width)
    col = ((tiled["x"] - r.x_min) / r.resolution).round().astype(int).to_numpy()
    row = (
        r.height - 1 - ((tiled["y"] - r.y_min) / r.resolution).round().astype(int)
    ).to_numpy()
    d8s = tiled["d8"].to_numpy()
    offs = [(0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
            (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128)]
    import math

    for i in range(0, len(tiled), 97):
        rr, cc = row[i], col[i]
        best, bestcode = -math.inf, 0
        for dr, dc, code in offs:
            zn = z[rr + dr, cc + dc]
            assert zn != NODATA
            d = (z[rr, cc] - zn) / (
                r.resolution * math.sqrt(2.0) if dr and dc else r.resolution
            )
            if d > best:
                best, bestcode = d, code
        assert d8s[i] == (bestcode if best > 0 else 0), i


def test_bilinear_interpolates_exactly_on_smooth_field(ray_session):
    """On a nodata-free LINEAR synthetic field, bilinear interpolation
    must reproduce the plane exactly at every sample point."""
    import numpy as np

    from pygridmap_ray.raster import RasterSource, bilinear_raster

    class Plane(RasterSource):
        bands = ("elev",)
        height, width = 64, 64
        x_min = y_min = 0.0
        resolution = 1000.0

        def read_window(self, band, row0, col0, h, w):
            rows = np.arange(row0, min(row0 + h, self.height))
            cols = np.arange(col0, min(col0 + w, self.width))
            r, c = np.meshgrid(rows, cols, indexing="ij")
            # value linear in map coords: y decreases with array row
            return 2.0 * c + 3.0 * (self.height - 1 - r)

    r = Plane()
    out = bilinear_raster(r, 1500.0, band="elev").to_pandas()
    assert len(out) > 0
    # plane in pixel units: v = 2*px + 3*py with px=(x-x0)/res-0.5 offset
    px = (out["x"] + 750.0 - r.x_min) / r.resolution - 0.5
    py = (out["y"] + 750.0 - r.y_min) / r.resolution - 0.5
    expect = 2.0 * px + 3.0 * py
    assert np.allclose(out["elev"].to_numpy(), expect, atol=1e-6)


def test_contour_halo_and_hand_block(ray_session):
    from pygridmap_ray.raster import (
        ContourKernel,
        RasterSource,
        SyntheticRaster,
        contour_raster,
    )

    r = SyntheticRaster(height=96, width=80, resolution=500.0)
    tiled = (
        contour_raster(r, threshold=500.0, tile_size_cell=32)
        .to_pandas()
        .sort_values(["r", "c", "seg"])
        .reset_index(drop=True)
    )
    whole = (
        ContourKernel(r, 128, "elev", 500.0)
        ._tile(0, 0)
        .to_pandas()
        .sort_values(["r", "c", "seg"])
        .reset_index(drop=True)
    )
    assert len(tiled) == len(whole) > 0
    for col in ["r", "c", "seg", "x1", "y1", "x2", "y2"]:
        assert np.allclose(tiled[col].to_numpy(), whole[col].to_numpy()), col

    class Two(RasterSource):
        """One 2x2 block: TL=0 TR=0 / BL=1000 BR=0 at T=500 -> case 1
        (BL only): segment from left edge midpoint to bottom midpoint."""

        bands = ("elev",)
        height = width = 2
        x_min = y_min = 0.0
        resolution = 10.0

        def read_window(self, band, row0, col0, h, w):
            z = np.array([[0.0, 0.0], [1000.0, 0.0]])
            return z[row0 : row0 + h, col0 : col0 + w]

    seg = ContourKernel(Two(), 4, "elev", 500.0)._tile(0, 0).to_pandas()
    assert len(seg) == 1
    row = seg.iloc[0]
    # left edge: from node (0,0)=(0,10) toward (1,0)=(0,0), t=0.5 -> (0,5)
    assert (row["x1"], row["y1"]) == (0.0, 5.0)
    # bottom edge: from node (1,0)=(0,0) toward (1,1)=(10,0), t=0.5 -> (5,0)
    assert (row["x2"], row["y2"]) == (5.0, 0.0)


def test_profile_on_linear_plane(ray_session):
    """Profile samples along a segment on a linear field reproduce the
    plane exactly, and dist is monotone."""
    import numpy as np

    from pygridmap_ray.raster import RasterSource, profile_raster

    class Plane(RasterSource):
        bands = ("elev",)
        height, width = 64, 64
        x_min = y_min = 0.0
        resolution = 100.0

        def read_window(self, band, row0, col0, h, w):
            rows = np.arange(row0, min(row0 + h, self.height))
            cols = np.arange(col0, min(col0 + w, self.width))
            r, c = np.meshgrid(rows, cols, indexing="ij")
            return 2.0 * c + 3.0 * (self.height - 1 - r)

    r = Plane()
    out = (
        profile_raster(r, (500.0, 600.0), (5500.0, 5100.0), n_steps=100)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) > 50
    px = (out["x"] - r.x_min) / r.resolution - 0.5
    py = (out["y"] - r.y_min) / r.resolution - 0.5
    assert np.allclose(out["elev"], 2.0 * px + 3.0 * py, atol=1e-6)
    assert (np.diff(out["dist"]) > 0).all()


def test_band_corr_and_path_density_laws(ray_session):
    """band_corr matches np.corrcoef on both-valid pixels; path_density
    counts equal brute per-cell distinct users over the paths."""
    from pygridmap_ray.pipelines.queries import (
        _RASTER_KW,
        q_band_corr,
        q_path_density,
    )
    from pygridmap_ray.pipelines.relational import events_od_paths
    from pygridmap_ray.raster import NODATA, SyntheticRaster

    out = q_band_corr("/root/testdata/sf0.001").to_pandas().iloc[0]
    r = SyntheticRaster(**_RASTER_KW)
    p = r.read_window("pop", 0, 0, r.height, r.width)
    e = r.read_window("elev", 0, 0, r.height, r.width)
    ok = (p != NODATA) & (e != NODATA)
    expect = np.corrcoef(p[ok], e[ok])[0, 1]
    assert out["n"] == int(ok.sum())
    assert abs(out["r"] - expect) < 1e-5

    dens = q_path_density("/root/testdata/sf0.001").to_pandas()
    paths = events_od_paths(
        "/root/testdata/sf0.001", hex_size=25_000.0
    ).to_pandas()
    brute = (
        paths.drop_duplicates(["hq", "hr", "user_id"])
        .groupby(["hq", "hr"])
        .size()
    )
    got = dens.set_index(["hq", "hr"])["n_users"].sort_index()
    assert (got == brute.sort_index()).all()


def test_f_function_and_band_index_laws(ray_session):
    """F is a monotone CDF on [0,1]; band index stays within [-1, 1]
    and matches the closed form on a sample."""
    from pygridmap_ray.pipelines.queries import q_band_index, q_f_function

    f = (
        q_f_function("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    import numpy as np

    assert (np.diff(f["f"]) >= 0).all()
    assert f["f"].between(0, 1).all()
    assert f["n_within"].iloc[-1] <= 400  # 20x20 probes

    nd = q_band_index("/root/testdata/sf0.001").to_pandas()
    assert nd["ndi"].between(-1, 1).all()
    assert len(nd) > 10_000
