"""Raster -> vector tiling (zonal sampling) without rasterio.

Ray-Data-native re-expression of the reference ``gridtiler_raster.py``:
tile-spec Dataset -> ``map_batches`` actor pool holding open raster
handles (the reference re-opens files per task, gridtiler_raster.py:60-65)
-> cell records -> partitioned tile write.

rasterio/GDAL are unavailable in this environment, so the raster source
is an interface (:class:`RasterSource`) with windowed reads; the bundled
:class:`SyntheticRaster` generates deterministic bands whose values are
closed-form in (row, col) — replicable in the DuckDB oracle
(:func:`sql_raster_cells`).  Swapping in a GeoTIFF source is a reader
change only.

Georeferencing (reference gridtiler_raster.py:73,110): row 0 is the TOP
raster row; cell coordinates are lower-left corners, so
``y = y_min + (H - row - 1) * res`` (the y-flip).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NODATA = -9999.0

# deterministic band formulas (integers < 2^24 -> exact in float32/float64)
#   value(band, row, col) = ((row * P1[band] + col * P2[band]) % 1000)
#   nodata where ((row * 7919 + col * 104729) % 100) < nodata_pct[band]
_BAND_P1 = {"pop": 92821, "elev": 68917}
_BAND_P2 = {"pop": 68917, "elev": 92821}
_BAND_NODATA_PCT = {"pop": 15, "elev": 10}


class RasterSource:
    """Interface: windowed band reads (the rasterio stand-in)."""

    bands: tuple[str, ...]
    height: int
    width: int
    x_min: float
    y_min: float
    resolution: float

    def read_window(self, band: str, row0: int, col0: int, h: int, w: int) -> np.ndarray:
        raise NotImplementedError


class RasterioRaster(RasterSource):
    """rasterio-backed :class:`RasterSource` — the real-data READER SWAP
    (reference ``tiling.py`` delegates all IO to rasterio; this sandbox
    cannot install it, so construction raises a clear ImportError and
    :class:`SyntheticRaster` carries the oracle-checked semantics).

    The tiling drivers (:func:`tiling_raster`,
    :func:`tiling_raster_generic`) consume ANY ``RasterSource`` through
    ``read_window`` — window addressing, y-flip, nodata and resample
    laws all live in the drivers — so pointing this adapter at a
    GeoTIFF runs the exact plan the oracles pin, over real pixels.

    Conventions: windows are ``(row0, col0, h, w)`` with a TOP-LEFT
    row origin, matching ``rasterio.windows.Window(col0, row0, w, h)``
    directly for north-up rasters; ``bands`` maps logical names to
    1-based rasterio band indexes (defaults to ``band_1..band_N``)."""

    def __init__(self, path: str, bands: dict[str, int] | None = None):
        try:
            import rasterio
        except ImportError as exc:  # env-blocked in this sandbox
            raise ImportError(
                "rasterio is not installed — RasterioRaster is the "
                "real-data reader swap for RasterSource; use "
                "SyntheticRaster here, or install rasterio on a real "
                "deployment"
            ) from exc
        self._src = rasterio.open(path)
        if bands is None:
            bands = {
                f"band_{i}": i for i in range(1, self._src.count + 1)
            }
        self._band_index = dict(bands)
        self.bands = tuple(bands)
        self.height = int(self._src.height)
        self.width = int(self._src.width)
        t = self._src.transform
        self.resolution = float(t.a)
        self.x_min = float(t.c)
        # north-up GeoTIFFs have e < 0 (row 0 at y_max): the engine's
        # y_min is the BOTTOM edge either way
        self.y_min = float(min(t.f, t.f + t.e * self._src.height))

    def read_window(self, band, row0, col0, h, w):
        from rasterio.windows import Window

        return np.asarray(
            self._src.read(
                self._band_index[band], window=Window(col0, row0, w, h)
            ),
            dtype=np.float64,
        )


class SyntheticRaster(RasterSource):
    """Deterministic raster (FIXTURES.md F5): bands pop/elev, closed-form
    values + sprinkled nodata; any window computed on the fly."""

    def __init__(
        self,
        height: int = 512,
        width: int = 512,
        x_min: float = 0.0,
        y_min: float = 0.0,
        resolution: float = 1000.0,
        bands: tuple[str, ...] = ("pop", "elev"),
    ):
        self.height = height
        self.width = width
        self.x_min = x_min
        self.y_min = y_min
        self.resolution = resolution
        self.bands = bands

    def read_window(self, band, row0, col0, h, w):
        rows = np.arange(row0, min(row0 + h, self.height))
        cols = np.arange(col0, min(col0 + w, self.width))
        r, c = np.meshgrid(rows, cols, indexing="ij")
        v = ((r * _BAND_P1[band] + c * _BAND_P2[band]) % 1000).astype(np.float64)
        nod = ((r * 7919 + c * 104729) % 100) < _BAND_NODATA_PCT[band]
        v[nod] = NODATA
        return v


class RasterTileKernel:
    """Actor-pool kernel: holds the open raster across all of an actor's
    tiles (reference re-opens per task)."""

    def __init__(self, raster: RasterSource, tile_size_cell: int, modif_fun=None):
        self.r = raster
        self.ts = int(tile_size_cell)
        self.modif_fun = modif_fun

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            parts.append(self._tile(int(xt), int(yt)))
        return (
            pa.concat_tables([p for p in parts if p is not None])
            if any(p is not None for p in parts)
            else self._empty()
        )

    def _empty(self):
        cols = {"xt": pa.array([], pa.int64()), "yt": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()), "y": pa.array([], pa.float64())}
        for b in self.r.bands:
            cols[b] = pa.array([], pa.float64())
        return pa.table(cols)

    def _tile(self, xt: int, yt: int):
        r = self.r
        ts = self.ts
        # window with the reference's y-flip (gridtiler_raster.py:71-75):
        # tile (xt, yt) covers rows [H-(yt+1)*ts, H-yt*ts)
        row0 = r.height - (yt + 1) * ts
        col0 = xt * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        if h <= 0 or col0 >= r.width:
            return None
        vals = {b: r.read_window(b, row0, col0, h, ts) for b in r.bands}
        some = next(iter(vals.values()))
        nrows, ncols = some.shape
        rr, cc = np.meshgrid(np.arange(nrows), np.arange(ncols), indexing="ij")
        # a cell exists when ANY band is valid (reference keys cells by
        # (col,row) and only sets valid bands, gridtiler_raster.py:104-113)
        any_valid = np.zeros((nrows, ncols), dtype=bool)
        for b in r.bands:
            any_valid |= vals[b] != NODATA
        rr, cc = rr[any_valid], cc[any_valid]
        if len(rr) == 0:
            return None
        abs_row = row0 + rr
        abs_col = col0 + cc
        x = r.x_min + abs_col * r.resolution
        y = r.y_min + (r.height - abs_row - 1) * r.resolution
        cols = {
            "xt": pa.array(np.full(len(rr), xt, dtype=np.int64)),
            "yt": pa.array(np.full(len(rr), yt, dtype=np.int64)),
            "x": pa.array(x),
            "y": pa.array(y),
        }
        for b in r.bands:
            v = vals[b][any_valid]
            # nodata mask comes from the RAW values; modif_fun sees only
            # valid entries (reference gridtiler_raster.py applies
            # modif_fun after the nodata skip — transforming the sentinel
            # would emit corrupted "valid" cells)
            nod = v == NODATA
            if self.modif_fun is not None:
                v = v.copy()
                v[~nod] = self.modif_fun(b, v[~nod])
            cols[b] = pa.array(v, pa.float64(), mask=nod)
        return pa.table(cols)


def tiling_raster(
    raster: RasterSource,
    output_dir: str | None = None,
    *,
    tile_size_cell: int = 128,
    modif_fun=None,
    concurrency=None,
):
    """Raster -> cell-record Dataset (one row per pixel with any valid
    band), optionally written as a partitioned tile tree (reference
    tiling_raster, gridtiler_raster.py:143-208)."""
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    if concurrency is not None:
        out = ds.map_batches(
            RasterTileKernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=(raster, tile_size_cell, modif_fun),
            concurrency=concurrency,
        )
    else:
        kern = RasterTileKernel(raster, tile_size_cell, modif_fun)
        out = ds.map_batches(kern, batch_format="pyarrow", batch_size=4)
    if output_dir is not None:
        import json as _json

        from .tiler import read_tiles, write_partitioned

        write_partitioned(out, output_dir, ["xt", "yt"], mode="overwrite")
        # consuming the return value must not recompute every tile —
        # hand back the written tree instead of the recipe
        out = read_tiles(output_dir)
        # info.json metadata (reference gridtiler_raster.py:181-202)
        import os as _os

        info = {
            "dims": list(raster.bands),
            "crs": getattr(raster, "crs", "EPSG:3035"),
            "tileSizeCell": int(tile_size_cell),
            "originPoint": {"x": raster.x_min, "y": raster.y_min},
            "resolutionGeo": raster.resolution,
            "tilingBounds": {
                "xMin": 0,
                "xMax": nxt - 1,
                "yMin": 0,
                "yMax": nyt - 1,
            },
        }
        with open(_os.path.join(output_dir, "info.json"), "w") as f:
            _json.dump(info, f, indent=2)
    return out


def resample_raster(
    raster: RasterSource,
    out_resolution: float,
    *,
    concurrency=None,
):
    """Center-point resampling to a coarser output grid (reference
    tiling_raster_generic, gridtiler_raster.py:294-313): for every output
    cell, sample the source pixel containing the cell CENTER; skip cells
    whose every band is nodata."""
    import math

    import ray.data as rd

    n_out_x = math.ceil(raster.width * raster.resolution / out_resolution)
    n_out_y = math.ceil(raster.height * raster.resolution / out_resolution)
    rows_per_task = max(1, 4096 // max(n_out_x, 1))
    specs = [
        {"oy0": oy, "oy1": min(oy + rows_per_task, n_out_y)}
        for oy in range(0, n_out_y, rows_per_task)
    ]

    def sample(batch: pa.Table) -> pa.Table:
        parts = []
        for oy0, oy1 in zip(
            np.asarray(batch["oy0"], dtype=np.int64),
            np.asarray(batch["oy1"], dtype=np.int64),
        ):
            oy = np.arange(oy0, oy1)
            ox = np.arange(n_out_x)
            gy, gx = np.meshgrid(oy, ox, indexing="ij")
            gy, gx = gy.ravel(), gx.ravel()
            cx = raster.x_min + gx * out_resolution + out_resolution / 2.0
            cy = raster.y_min + gy * out_resolution + out_resolution / 2.0
            col = np.floor((cx - raster.x_min) / raster.resolution).astype(np.int64)
            row = raster.height - 1 - np.floor(
                (cy - raster.y_min) / raster.resolution
            ).astype(np.int64)
            ok = (col >= 0) & (col < raster.width) & (row >= 0) & (row < raster.height)
            gx, gy, col, row = gx[ok], gy[ok], col[ok], row[ok]
            vals = {}
            any_valid = np.zeros(len(col), dtype=bool)
            r0 = int(row.min()) if len(row) else 0
            r1 = int(row.max()) if len(row) else 0
            for b in raster.bands:
                win = raster.read_window(b, r0, 0, r1 - r0 + 1, raster.width)
                v = win[row - r0, col]
                vals[b] = v
                any_valid |= v != NODATA
            cols = {
                "ox": pa.array(gx[any_valid]),
                "oy": pa.array(gy[any_valid]),
                "x": pa.array((raster.x_min + gx * out_resolution)[any_valid]),
                "y": pa.array((raster.y_min + gy * out_resolution)[any_valid]),
            }
            for b in raster.bands:
                v = vals[b][any_valid]
                cols[b] = pa.array(v, pa.float64(), mask=(v == NODATA))
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    return ds.map_batches(sample, batch_format="pyarrow", batch_size=2)


def bilinear_raster(
    raster: RasterSource,
    out_resolution: float,
    *,
    band: str = "elev",
    concurrency=None,
):
    """Bilinear resampling to a new output grid: every output cell center
    interpolates the FOUR surrounding source pixel centers (weights are
    the fractional offsets; pixel centers sit at (col + 0.5) * res).

    Law (twin-identical): ``g = (center - origin)/res - 0.5``; corner
    index = floor(g); skip output cells whose 2x2 support is out of
    bounds or touches nodata; value rounded half-away 6dp (the weights
    are exact-arithmetic doubles, so only summation ulps diverge —
    orders below the step).

    Scale shape: same row-strip task layout as :func:`resample_raster`
    (each strip reads only its source rows — partition-pruned reads, no
    shuffle).
    """
    import math

    import ray.data as rd

    n_out_x = math.ceil(raster.width * raster.resolution / out_resolution)
    n_out_y = math.ceil(raster.height * raster.resolution / out_resolution)
    rows_per_task = max(1, 4096 // max(n_out_x, 1))
    specs = [
        {"oy0": oy, "oy1": min(oy + rows_per_task, n_out_y)}
        for oy in range(0, n_out_y, rows_per_task)
    ]

    def sample(batch: pa.Table) -> pa.Table:
        parts = []
        for oy0, oy1 in zip(
            np.asarray(batch["oy0"], dtype=np.int64),
            np.asarray(batch["oy1"], dtype=np.int64),
        ):
            oy = np.arange(oy0, oy1)
            ox = np.arange(n_out_x)
            gyi, gxi = np.meshgrid(oy, ox, indexing="ij")
            gyi, gxi = gyi.ravel(), gxi.ravel()
            cx = raster.x_min + gxi * out_resolution + out_resolution / 2.0
            cy = raster.y_min + gyi * out_resolution + out_resolution / 2.0
            gx = (cx - raster.x_min) / raster.resolution - 0.5
            gy = (cy - raster.y_min) / raster.resolution - 0.5
            c0 = np.floor(gx).astype(np.int64)
            b0 = np.floor(gy).astype(np.int64)
            fx = gx - c0
            fy = gy - b0
            ok = (
                (c0 >= 0)
                & (c0 + 1 < raster.width)
                & (b0 >= 0)
                & (b0 + 1 < raster.height)
            )
            gxi, gyi = gxi[ok], gyi[ok]
            c0, b0, fx, fy = c0[ok], b0[ok], fx[ok], fy[ok]
            if not len(c0):
                continue
            # array rows for bottom-row indices b0 (y-flip)
            r1 = raster.height - 1 - b0  # row of b0 (lower y)
            r0 = r1 - 1  # row of b0 + 1
            lo = int(r0.min())
            hi = int(r1.max())
            win = raster.read_window(band, lo, 0, hi - lo + 1, raster.width)
            v00 = win[r1 - lo, c0]
            v10 = win[r1 - lo, c0 + 1]
            v01 = win[r0 - lo, c0]
            v11 = win[r0 - lo, c0 + 1]
            valid = (
                (v00 != NODATA)
                & (v10 != NODATA)
                & (v01 != NODATA)
                & (v11 != NODATA)
            )
            val = (
                v00 * (1.0 - fx) * (1.0 - fy)
                + v10 * fx * (1.0 - fy)
                + v01 * (1.0 - fx) * fy
                + v11 * fx * fy
            )
            val = np.sign(val) * np.floor(np.abs(val) * 1e6 + 0.5) / 1e6
            parts.append(
                pa.table(
                    {
                        "ox": pa.array(gxi[valid]),
                        "oy": pa.array(gyi[valid]),
                        "x": pa.array(
                            (raster.x_min + gxi * out_resolution)[valid]
                        ),
                        "y": pa.array(
                            (raster.y_min + gyi * out_resolution)[valid]
                        ),
                        band: pa.array(val[valid]),
                    }
                )
            )
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "ox": pa.array([], pa.int64()),
                "oy": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                band: pa.array([], pa.float64()),
            }
        )

    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    return ds.map_batches(sample, batch_format="pyarrow", batch_size=2)


def sql_bilinear(
    raster: SyntheticRaster, out_resolution: float, band: str = "elev"
) -> str:
    """Oracle: the same 2x2 bilinear law over generate_series output
    cells with closed-form corner values (identical constants/op order)."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    import math

    n_out_x = math.ceil(w * res / out_resolution)
    n_out_y = math.ceil(h * res / out_resolution)
    cx = f"({x0!r} + ox.i * {out_resolution!r} + {out_resolution!r} / 2.0)"
    cy = f"({y0!r} + oy.i * {out_resolution!r} + {out_resolution!r} / 2.0)"
    gx = f"(({cx} - {x0!r}) / {res!r} - 0.5)"
    gy = f"(({cy} - {y0!r}) / {res!r} - 0.5)"
    c0 = f"CAST(floor({gx}) AS BIGINT)"
    b0 = f"CAST(floor({gy}) AS BIGINT)"
    fx = f"({gx} - {c0})"
    fy = f"({gy} - {b0})"
    r1 = f"({h} - 1 - {b0})"
    r0 = f"({r1} - 1)"

    def zv(rr, cc):
        return f"((({rr}) * {p1} + ({cc}) * {p2}) % 1000)::DOUBLE"

    def okv(rr, cc):
        return f"((({rr}) * 7919 + ({cc}) * 104729) % 100) >= {pct}"

    v00 = zv(r1, c0)
    v10 = zv(r1, f"{c0} + 1")
    v01 = zv(r0, c0)
    v11 = zv(r0, f"{c0} + 1")
    val = (
        f"({v00} * (1.0 - {fx}) * (1.0 - {fy})"
        f" + {v10} * {fx} * (1.0 - {fy})"
        f" + {v01} * (1.0 - {fx}) * {fy}"
        f" + {v11} * {fx} * {fy})"
    )
    valid = " AND ".join(
        [
            okv(r1, c0),
            okv(r1, f"{c0} + 1"),
            okv(r0, c0),
            okv(r0, f"{c0} + 1"),
        ]
    )
    return f"""
SELECT ox.i AS ox, oy.i AS oy,
       {x0!r} + ox.i * {out_resolution!r} AS x,
       {y0!r} + oy.i * {out_resolution!r} AS y,
       ROUND(({val}) * 1000000.0) / 1000000.0 AS {band}
FROM (SELECT UNNEST(generate_series(0, {n_out_x - 1})) AS i) ox,
     (SELECT UNNEST(generate_series(0, {n_out_y - 1})) AS i) oy
WHERE {c0} >= 0 AND {c0} + 1 < {w} AND {b0} >= 0 AND {b0} + 1 < {h}
  AND {valid}
"""


# Marching-squares case table (public standard): corner bits TL=8 TR=4
# BR=2 BL=1 (bit set when value >= threshold); each case emits 0-2 contour
# segments between edge crossings.  Saddles (5, 10) disambiguate on the
# 4-corner average (avg >= T joins the high regions).  SHARED by the
# vectorized kernel and the generated DuckDB twin.
_MS_SEGS = {
    1: [("left", "bottom")],
    2: [("bottom", "right")],
    3: [("left", "right")],
    4: [("top", "right")],
    6: [("top", "bottom")],
    7: [("left", "top")],
    8: [("left", "top")],
    9: [("top", "bottom")],
    11: [("top", "right")],
    12: [("left", "right")],
    13: [("bottom", "right")],
    14: [("left", "bottom")],
}
_MS_SADDLE = {
    5: {
        True: [("left", "top"), ("bottom", "right")],
        False: [("left", "bottom"), ("top", "right")],
    },
    10: {
        True: [("top", "right"), ("left", "bottom")],
        False: [("left", "top"), ("bottom", "right")],
    },
}


class ContourKernel:
    """Actor-pool stencil kernel: marching-squares contour segments at a
    fixed threshold — the raster->vector isoline operator (GDAL contour
    parity).  Same tile + one-pixel-halo plan as :class:`HillshadeKernel`
    (blocks never cross workers; no shuffle at any raster size).

    Law (twin-identical): nodes are pixels at ``(x0 + c*res,
    y0 + (H-1-r)*res)``; each 2x2 block (TL TR BR BL) with no nodata
    corner classifies by the >=-threshold bit pattern; crossings
    interpolate linearly ``t = (T - v_a) / (v_b - v_a)`` along the edge;
    coordinates round half-away 6dp.
    """

    def __init__(self, raster: RasterSource, tile_size_cell: int,
                 band: str = "elev", threshold: float = 500.0):
        self.r = raster
        self.ts = int(tile_size_cell)
        self.band = band
        self.t = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            t = self._tile(int(xt), int(yt))
            if t is not None:
                parts.append(t)
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "r": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "seg": pa.array([], pa.int64()),
                "x1": pa.array([], pa.float64()),
                "y1": pa.array([], pa.float64()),
                "x2": pa.array([], pa.float64()),
                "y2": pa.array([], pa.float64()),
            }
        )

    def _edge_point(self, edge, rr, cc, tl, tr, br, bl):
        """Endpoint of the crossing on `edge` for block top-left (rr, cc):
        node coords with the y-flip, linear interpolation along the edge."""
        r0 = self.r
        nx = r0.x_min + cc * r0.resolution
        ny = r0.y_min + (r0.height - 1 - rr) * r0.resolution
        res = r0.resolution
        T = self.t
        with np.errstate(divide="ignore", invalid="ignore"):
            if edge == "top":
                t = (T - tl) / (tr - tl)
                return nx + t * res, ny
            if edge == "bottom":
                t = (T - bl) / (br - bl)
                return nx + t * res, ny - res
            if edge == "left":
                t = (T - tl) / (bl - tl)
                return nx, ny - t * res
            t = (T - tr) / (br - tr)  # right
            return nx + res, ny - t * res

    def _tile(self, xt: int, yt: int):
        r, ts = self.r, self.ts
        row0 = r.height - (yt + 1) * ts
        col0 = xt * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        if h <= 0 or col0 >= r.width:
            return None
        # blocks whose top-left node lies in this tile; +1 halo right/down
        hh = min(row0 + h + 1, r.height) - row0
        hw = min(col0 + ts + 1, r.width) - col0
        if hh < 2 or hw < 2:
            return None
        z = self.r.read_window(self.band, row0, col0, hh, hw)
        tl = z[:-1, :-1]
        tr = z[:-1, 1:]
        bl = z[1:, :-1]
        br = z[1:, 1:]
        valid = (
            (tl != NODATA) & (tr != NODATA) & (bl != NODATA) & (br != NODATA)
        )
        T = self.t
        cs = (
            (tl >= T).astype(np.int64) * 8
            + (tr >= T).astype(np.int64) * 4
            + (br >= T).astype(np.int64) * 2
            + (bl >= T).astype(np.int64) * 1
        )
        hi = (tl + tr + br + bl) / 4.0 >= T
        rows = {k: [] for k in ("r", "c", "seg", "x1", "y1", "x2", "y2")}
        rnd = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6

        def emit(mask, segs):
            if not mask.any():
                return
            rr_, cc_ = np.nonzero(mask)
            abs_r = row0 + rr_
            abs_c = col0 + cc_
            vt = (tl[mask], tr[mask], br[mask], bl[mask])
            for si, (ea, eb) in enumerate(segs):
                x1, y1 = self._edge_point(ea, abs_r, abs_c, *vt)
                x2, y2 = self._edge_point(eb, abs_r, abs_c, *vt)
                rows["r"].append(abs_r)
                rows["c"].append(abs_c)
                rows["seg"].append(np.full(len(abs_r), si, np.int64))
                rows["x1"].append(rnd(x1))
                rows["y1"].append(rnd(y1))
                rows["x2"].append(rnd(x2))
                rows["y2"].append(rnd(y2))

        for case, segs in _MS_SEGS.items():
            emit(valid & (cs == case), segs)
        for case, variants in _MS_SADDLE.items():
            emit(valid & (cs == case) & hi, variants[True])
            emit(valid & (cs == case) & ~hi, variants[False])
        if not rows["r"]:
            return None
        return pa.table(
            {k: pa.array(np.concatenate(v)) for k, v in rows.items()}
        )


def contour_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    threshold: float = 500.0,
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Raster -> contour-segment Dataset at one threshold (marching
    squares, tile + halo stencil)."""
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    args = (raster, tile_size_cell, band, threshold)
    if concurrency is not None:
        return ds.map_batches(
            ContourKernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=args,
            concurrency=concurrency,
        )
    return ds.map_batches(
        ContourKernel(*args), batch_format="pyarrow", batch_size=4
    )


def sql_contour(
    raster: SyntheticRaster,
    band: str = "elev",
    threshold: float = 500.0,
) -> str:
    """Oracle: the same case table unrolled into per-slot CASE chains over
    generate_series blocks (generated from _MS_SEGS/_MS_SADDLE — shared
    constants, shared interpolation expressions)."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    T = repr(float(threshold))

    corners = {
        "tl": (0, 0), "tr": (0, 1), "br": (1, 1), "bl": (1, 0),
    }

    def zv(name):
        dr, dc = corners[name]
        return f"(((r.i + {dr}) * {p1} + (c.i + {dc}) * {p2}) % 1000)::DOUBLE"

    def okv(name):
        dr, dc = corners[name]
        return (
            f"(((r.i + {dr}) * 7919 + (c.i + {dc}) * 104729) % 100) >= {pct}"
        )

    valid = " AND ".join(okv(n) for n in corners)
    # the segment stage sees the block columns (ri, ci, tl..bl), not r/c
    nx = f"({x0!r} + ci * {res!r})"
    ny = f"({y0!r} + ({h} - 1 - ri) * {res!r})"

    def edge_xy(edge):
        if edge == "top":
            t = f"(({T} - tl) / (tr - tl))"
            return f"({nx} + {t} * {res!r})", ny
        if edge == "bottom":
            t = f"(({T} - bl) / (br - bl))"
            return f"({nx} + {t} * {res!r})", f"({ny} - {res!r})"
        if edge == "left":
            t = f"(({T} - tl) / (bl - tl))"
            return nx, f"({ny} - {t} * {res!r})"
        t = f"(({T} - tr) / (br - tr))"
        return f"({nx} + {res!r})", f"({ny} - {t} * {res!r})"

    rnd = lambda e: f"(ROUND(({e}) * 1000000.0) / 1000000.0)"
    # (condition, slot) -> (x1, y1, x2, y2) expressions
    branches = []  # (cond_sql, slot, exprs)
    for case, segs in _MS_SEGS.items():
        for si, (ea, eb) in enumerate(segs):
            xa, ya = edge_xy(ea)
            xb, yb = edge_xy(eb)
            branches.append((f"cs = {case}", si, (xa, ya, xb, yb)))
    for case, variants in _MS_SADDLE.items():
        for flag, segs in variants.items():
            cond = f"cs = {case} AND {'hi' if flag else 'NOT hi'}"
            for si, (ea, eb) in enumerate(segs):
                xa, ya = edge_xy(ea)
                xb, yb = edge_xy(eb)
                branches.append((cond, si, (xa, ya, xb, yb)))

    def coord_case(ci):
        whens = " ".join(
            f"WHEN ({cond}) AND s.i = {slot} THEN {rnd(exprs[ci])}"
            for cond, slot, exprs in branches
        )
        return f"(CASE {whens} ELSE NULL END)"

    return f"""
WITH blocks AS (
  SELECT r.i AS ri, c.i AS ci,
         {zv('tl')} AS tl, {zv('tr')} AS tr,
         {zv('br')} AS br, {zv('bl')} AS bl
  FROM (SELECT UNNEST(generate_series(0, {h - 2})) AS i) r,
       (SELECT UNNEST(generate_series(0, {w - 2})) AS i) c
  WHERE {valid}
), cls AS (
  SELECT *, (CASE WHEN tl >= {T} THEN 8 ELSE 0 END
           + CASE WHEN tr >= {T} THEN 4 ELSE 0 END
           + CASE WHEN br >= {T} THEN 2 ELSE 0 END
           + CASE WHEN bl >= {T} THEN 1 ELSE 0 END) AS cs,
         ((tl + tr + br + bl) / 4.0 >= {T}) AS hi
  FROM blocks
), segs AS (
  SELECT cls.ri AS r, cls.ci AS c, s.i AS seg,
         {coord_case(0)} AS x1, {coord_case(1)} AS y1,
         {coord_case(2)} AS x2, {coord_case(3)} AS y2
  FROM cls, (SELECT UNNEST(generate_series(0, 1)) AS i) s
)
SELECT r, c, seg, x1, y1, x2, y2 FROM segs WHERE x1 IS NOT NULL
"""


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


class HillshadeKernel:
    """Actor-pool stencil kernel: Horn (1981) slope / aspect / hillshade
    per pixel, computed tile-by-tile with a ONE-PIXEL HALO read — the
    focal window never crosses workers, so there is no shuffle at any
    raster size (the 100 TB shape for every 3x3 raster derivative).

    Conventions (documented, twin-identical): array-space derivatives
    (``dy`` toward increasing row = decreasing map y), ``aspect =
    atan2(dy, -dx)``, ``hillshade = 255 * (cos(zen)*cos(slope) +
    sin(zen)*sin(slope)*cos(az - aspect))`` clamped at 0 — the classic
    public formulation.  Pixels on the raster border or whose 3x3 window
    touches nodata are skipped.  Float outputs rounded half-away 6dp
    (house law; trig ulp divergence vs the DuckDB twin is orders below
    the step).
    """

    def __init__(
        self,
        raster: RasterSource,
        tile_size_cell: int,
        band: str = "elev",
        azimuth_deg: float = 315.0,
        altitude_deg: float = 45.0,
        z_factor: float = 1.0,
    ):
        self.r = raster
        self.ts = int(tile_size_cell)
        self.band = band
        self.az = float(azimuth_deg)
        self.alt = float(altitude_deg)
        self.zf = float(z_factor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            t = self._tile(int(xt), int(yt))
            if t is not None:
                parts.append(t)
        return pa.concat_tables(parts) if parts else self._empty()

    def _empty(self):
        return pa.table(
            {
                "xt": pa.array([], pa.int64()),
                "yt": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "slope": pa.array([], pa.float64()),
                "aspect": pa.array([], pa.float64()),
                "hillshade": pa.array([], pa.float64()),
            }
        )

    def _tile(self, xt: int, yt: int):
        r, ts = self.r, self.ts
        row0 = r.height - (yt + 1) * ts
        col0 = xt * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        if h <= 0 or col0 >= r.width:
            return None
        # halo read, clipped at the raster edge
        hr0 = max(row0 - 1, 0)
        hc0 = max(col0 - 1, 0)
        hh = min(row0 + h + 1, r.height) - hr0
        hw = min(col0 + ts + 1, r.width) - hc0
        z = self.r.read_window(self.band, hr0, hc0, hh, hw)
        # output pixels: tile pixels that are interior to the GLOBAL grid
        o_r0 = max(row0, 1)
        o_r1 = min(row0 + h, r.height - 1)
        o_c0 = max(col0, 1)
        o_c1 = min(col0 + ts, r.width - 1)
        if o_r0 >= o_r1 or o_c0 >= o_c1:
            return None
        # local slices into the halo window for the 3x3 neighborhood
        lr0, lc0 = o_r0 - hr0, o_c0 - hc0
        nh, nw = o_r1 - o_r0, o_c1 - o_c0

        def win(dr, dc):
            return z[lr0 + dr : lr0 + dr + nh, lc0 + dc : lc0 + dc + nw]

        zc = win(0, 0)
        ztl, zt, ztr = win(-1, -1), win(-1, 0), win(-1, 1)
        zl, zr_ = win(0, -1), win(0, 1)
        zbl, zb, zbr = win(1, -1), win(1, 0), win(1, 1)
        valid = np.ones((nh, nw), dtype=bool)
        for wv in (zc, ztl, zt, ztr, zl, zr_, zbl, zb, zbr):
            valid &= wv != NODATA
        if not valid.any():
            return None
        res = r.resolution
        dx = ((ztr + 2.0 * zr_ + zbr) - (ztl + 2.0 * zl + zbl)) / (8.0 * res)
        dy = ((zbl + 2.0 * zb + zbr) - (ztl + 2.0 * zt + ztr)) / (8.0 * res)
        slope = np.arctan(self.zf * np.sqrt(dx * dx + dy * dy))
        aspect = np.arctan2(dy, -dx)
        az_rad = self.az * (np.pi / 180.0)
        zen = (90.0 - self.alt) * (np.pi / 180.0)
        hs = 255.0 * (
            np.cos(zen) * np.cos(slope)
            + np.sin(zen) * np.sin(slope) * np.cos(az_rad - aspect)
        )
        hs = np.maximum(hs, 0.0)
        rr, cc = np.nonzero(valid)
        abs_row = o_r0 + rr
        abs_col = o_c0 + cc
        rnd = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "xt": pa.array(np.full(len(rr), xt, dtype=np.int64)),
                "yt": pa.array(np.full(len(rr), yt, dtype=np.int64)),
                "x": pa.array(r.x_min + abs_col * r.resolution),
                "y": pa.array(
                    r.y_min + (r.height - abs_row - 1) * r.resolution
                ),
                "slope": pa.array(rnd(slope[valid])),
                "aspect": pa.array(rnd(aspect[valid])),
                "hillshade": pa.array(rnd(hs[valid])),
            }
        )


def hillshade_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    concurrency=None,
):
    """Raster -> per-pixel Horn slope / aspect / hillshade Dataset.

    Tile-parallel stencil with halo reads (see :class:`HillshadeKernel`);
    ``concurrency=`` switches the stage to an actor pool holding the open
    raster, the house broadcast-layer convention.
    """
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    args = (raster, tile_size_cell, band, azimuth_deg, altitude_deg, z_factor)
    if concurrency is not None:
        return ds.map_batches(
            HillshadeKernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=args,
            concurrency=concurrency,
        )
    kern = HillshadeKernel(*args)
    return ds.map_batches(kern, batch_format="pyarrow", batch_size=4)


# D8 neighbor order (ESRI code convention: E SE S SW W NW N NE as powers
# of two).  (dr, dc) in ARRAY space: r grows downward (south), c east.
_D8 = (
    (0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
    (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128),
)


class D8Kernel:
    """Actor-pool stencil kernel: D8 steepest-descent flow direction per
    pixel — the classic hydrology operator.  Same tile + one-pixel-halo
    shape as :class:`HillshadeKernel` (no shuffle at any raster size).

    Law (twin-identical): drop to each neighbor = (z_c - z_n) / dist with
    dist = res orthogonal, res * sqrt(2) diagonal; direction = ESRI code
    of the FIRST neighbor attaining the maximum drop in the fixed order
    E SE S SW W NW N NE; 0 when no drop is positive (pit / flat).  Border
    pixels and any pixel whose 3x3 window touches nodata are skipped.
    """

    def __init__(self, raster: RasterSource, tile_size_cell: int,
                 band: str = "elev"):
        self.r = raster
        self.ts = int(tile_size_cell)
        self.band = band

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            t = self._tile(int(xt), int(yt))
            if t is not None:
                parts.append(t)
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "xt": pa.array([], pa.int64()),
                "yt": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "d8": pa.array([], pa.int64()),
            }
        )

    def _tile(self, xt: int, yt: int):
        r, ts = self.r, self.ts
        row0 = r.height - (yt + 1) * ts
        col0 = xt * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        if h <= 0 or col0 >= r.width:
            return None
        hr0 = max(row0 - 1, 0)
        hc0 = max(col0 - 1, 0)
        hh = min(row0 + h + 1, r.height) - hr0
        hw = min(col0 + ts + 1, r.width) - hc0
        z = self.r.read_window(self.band, hr0, hc0, hh, hw)
        o_r0 = max(row0, 1)
        o_r1 = min(row0 + h, r.height - 1)
        o_c0 = max(col0, 1)
        o_c1 = min(col0 + ts, r.width - 1)
        if o_r0 >= o_r1 or o_c0 >= o_c1:
            return None
        lr0, lc0 = o_r0 - hr0, o_c0 - hc0
        nh, nw = o_r1 - o_r0, o_c1 - o_c0

        def win(dr, dc):
            return z[lr0 + dr : lr0 + dr + nh, lc0 + dc : lc0 + dc + nw]

        zc = win(0, 0)
        valid = zc != NODATA
        res = r.resolution
        diag = res * np.sqrt(2.0)
        drops = np.empty((8, nh, nw))
        for i, (dr, dc, _code) in enumerate(_D8):
            zn = win(dr, dc)
            valid &= zn != NODATA
            drops[i] = (zc - zn) / (diag if dr and dc else res)
        if not valid.any():
            return None
        best = np.argmax(drops, axis=0)  # first max wins ties
        maxdrop = np.take_along_axis(drops, best[None], 0)[0]
        codes = np.asarray([c for _, _, c in _D8], np.int64)
        d8 = np.where(maxdrop > 0.0, codes[best], 0)
        rr, cc = np.nonzero(valid)
        abs_row = o_r0 + rr
        abs_col = o_c0 + cc
        return pa.table(
            {
                "xt": pa.array(np.full(len(rr), xt, dtype=np.int64)),
                "yt": pa.array(np.full(len(rr), yt, dtype=np.int64)),
                "x": pa.array(r.x_min + abs_col * r.resolution),
                "y": pa.array(
                    r.y_min + (r.height - abs_row - 1) * r.resolution
                ),
                "d8": pa.array(d8[valid]),
            }
        )


def d8_flow_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Raster -> per-pixel D8 flow-direction Dataset (tile stencil)."""
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    if concurrency is not None:
        return ds.map_batches(
            D8Kernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=(raster, tile_size_cell, band),
            concurrency=concurrency,
        )
    return ds.map_batches(
        D8Kernel(raster, tile_size_cell, band),
        batch_format="pyarrow",
        batch_size=4,
    )


def sql_d8_flow(
    raster: SyntheticRaster, band: str = "elev", tile_size_cell: int = 128
) -> str:
    """Oracle: row-number argmax over the 8 unpivoted neighbor drops —
    ORDER BY dropv DESC, ordi ASC reproduces numpy's first-max tie law."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]

    def ok(dr, dc):
        return (
            f"(((r.i + {dr}) * 7919 + (c.i + {dc}) * 104729) % 100) >= {pct}"
        )

    valid = " AND ".join(
        ok(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    )

    def pz(dr, dc):
        # neighbor value in px-space (ri, ci)
        return f"(((ri + {dr}) * {p1} + (ci + {dc}) * {p2}) % 1000)::DOUBLE"

    branches = " UNION ALL ".join(
        f"SELECT ri, ci, {i} AS ordi, {code} AS code,"
        f" ({pz(0, 0)} - {pz(dr, dc)}) /"
        + (f" ({res!r} * sqrt(2.0))" if dr and dc else f" {res!r}")
        + " AS dropv FROM px"
        for i, (dr, dc, code) in enumerate(_D8)
    )
    return f"""
WITH px AS (
  SELECT r.i AS ri, c.i AS ci
  FROM (SELECT UNNEST(generate_series(1, {h - 2})) AS i) r,
       (SELECT UNNEST(generate_series(1, {w - 2})) AS i) c
  WHERE {valid}
), drops AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ri, ci
                               ORDER BY dropv DESC, ordi ASC) AS rn
  FROM ({branches})
)
SELECT (ci // {tile_size_cell})::BIGINT AS xt,
       (({h} - ri - 1) // {tile_size_cell})::BIGINT AS yt,
       {x0!r} + ci * {res!r} AS x,
       {y0!r} + ({h} - ri - 1) * {res!r} AS y,
       CASE WHEN dropv > 0.0 THEN code ELSE 0 END::BIGINT AS d8
FROM drops WHERE rn = 1
"""


def sql_hillshade(
    raster: SyntheticRaster,
    band: str = "elev",
    tile_size_cell: int = 128,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
) -> str:
    """Oracle: the same Horn stencil over generate_series interior pixels
    (closed-form neighbor values — identical constants and op order)."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]

    def zv(dr, dc):
        return f"(((r.i + {dr}) * {p1} + (c.i + {dc}) * {p2}) % 1000)::DOUBLE"

    def ok(dr, dc):
        return (
            f"(((r.i + {dr}) * 7919 + (c.i + {dc}) * 104729) % 100) >= {pct}"
        )

    valid = " AND ".join(
        ok(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    )
    dx = (
        f"((({zv(-1, 1)} + 2.0 * {zv(0, 1)} + {zv(1, 1)}) -"
        f" ({zv(-1, -1)} + 2.0 * {zv(0, -1)} + {zv(1, -1)})) / (8.0 * {res!r}))"
    )
    dy = (
        f"((({zv(1, -1)} + 2.0 * {zv(1, 0)} + {zv(1, 1)}) -"
        f" ({zv(-1, -1)} + 2.0 * {zv(-1, 0)} + {zv(-1, 1)})) / (8.0 * {res!r}))"
    )
    slope = f"atan({z_factor!r} * sqrt({dx} * {dx} + {dy} * {dy}))"
    aspect = f"atan2({dy}, -{dx})"
    az_rad = f"({azimuth_deg!r} * (pi() / 180.0))"
    zen = f"((90.0 - {altitude_deg!r}) * (pi() / 180.0))"
    hs = (
        f"GREATEST(255.0 * (cos({zen}) * cos({slope}) +"
        f" sin({zen}) * sin({slope}) * cos({az_rad} - {aspect})), 0.0)"
    )
    rnd = lambda e: f"(ROUND(({e}) * 1000000.0) / 1000000.0)"
    return f"""
SELECT (c.i // {tile_size_cell})::BIGINT AS xt,
       (({h} - r.i - 1) // {tile_size_cell})::BIGINT AS yt,
       {x0!r} + c.i * {res!r} AS x,
       {y0!r} + ({h} - r.i - 1) * {res!r} AS y,
       {rnd(slope)} AS slope,
       {rnd(aspect)} AS aspect,
       {rnd(hs)} AS hillshade
FROM (SELECT UNNEST(generate_series(1, {h - 2})) AS i) r,
     (SELECT UNNEST(generate_series(1, {w - 2})) AS i) c
WHERE {valid}
"""


def sql_raster_cells(raster: SyntheticRaster, tile_size_cell: int = 128) -> str:
    """Oracle: same closed-form band values over generate_series pixels."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    band_exprs, valid = [], []
    for b in raster.bands:
        v = f"((r.i * {_BAND_P1[b]} + c.i * {_BAND_P2[b]}) % 1000)::DOUBLE"
        nod = f"(((r.i * 7919 + c.i * 104729) % 100) < {_BAND_NODATA_PCT[b]})"
        band_exprs.append(f"CASE WHEN {nod} THEN NULL ELSE {v} END AS {b}")
        valid.append(f"NOT {nod}")
    return f"""
SELECT (c.i // {tile_size_cell})::BIGINT AS xt,
       (({h} - r.i - 1) // {tile_size_cell})::BIGINT AS yt,
       {x0!r} + c.i * {res!r} AS x,
       {y0!r} + ({h} - r.i - 1) * {res!r} AS y,
       {', '.join(band_exprs)}
FROM (SELECT UNNEST(generate_series(0, {h - 1})) AS i) r,
     (SELECT UNNEST(generate_series(0, {w - 1})) AS i) c
WHERE {' OR '.join(valid)}
"""


def sql_resample(raster: SyntheticRaster, out_resolution: float) -> str:
    import math

    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    n_out_x = math.ceil(w * res / out_resolution)
    n_out_y = math.ceil(h * res / out_resolution)
    col = f"CAST(FLOOR((({x0!r} + ox.i * {out_resolution!r} + {out_resolution / 2.0!r}) - {x0!r}) / {res!r}) AS BIGINT)"
    row = f"({h} - 1 - CAST(FLOOR((({y0!r} + oy.i * {out_resolution!r} + {out_resolution / 2.0!r}) - {y0!r}) / {res!r}) AS BIGINT))"
    band_exprs, valid = [], []
    for b in raster.bands:
        v = f"(({row} * {_BAND_P1[b]} + {col} * {_BAND_P2[b]}) % 1000)::DOUBLE"
        nod = f"((({row} * 7919 + {col} * 104729) % 100) < {_BAND_NODATA_PCT[b]})"
        band_exprs.append(f"CASE WHEN {nod} THEN NULL ELSE {v} END AS {b}")
        valid.append(f"NOT {nod}")
    return f"""
SELECT ox.i AS ox, oy.i AS oy,
       {x0!r} + ox.i * {out_resolution!r} AS x,
       {y0!r} + oy.i * {out_resolution!r} AS y,
       {', '.join(band_exprs)}
FROM (SELECT UNNEST(generate_series(0, {n_out_x - 1})) AS i) ox,
     (SELECT UNNEST(generate_series(0, {n_out_y - 1})) AS i) oy
WHERE ({col} >= 0 AND {col} < {w} AND {row} >= 0 AND {row} < {h})
  AND ({' OR '.join(valid)})
"""


def profile_raster(
    raster: RasterSource,
    p0: tuple[float, float],
    p1: tuple[float, float],
    *,
    n_steps: int,
    band: str = "elev",
    steps_per_task: int = 64,
):
    """Elevation profile along the segment p0 -> p1: n_steps + 1 evenly
    spaced samples, each BILINEARLY interpolated from its 2x2 pixel
    support (same law as :func:`bilinear_raster`); samples whose support
    is out of bounds or touches nodata are dropped.  Output rows
    (k, dist, x, y, value), value rounded 6dp — the route-sampling /
    terrain-profile operator.

    Scale shape: contiguous step strips become tasks; each strip reads
    only the source rows its samples touch (pruned windowed reads, no
    shuffle)."""
    import ray.data as rd

    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    seg = float(np.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)))
    specs = [
        {"k0": k, "k1": min(k + steps_per_task, n_steps + 1)}
        for k in range(0, n_steps + 1, steps_per_task)
    ]

    def sample(b: pa.Table) -> pa.Table:
        parts = []
        for k0, k1 in zip(
            np.asarray(b["k0"], np.int64), np.asarray(b["k1"], np.int64)
        ):
            k = np.arange(k0, k1, dtype=np.int64)
            t = k.astype(np.float64) / float(n_steps)
            sx = x0 + t * (x1 - x0)
            sy = y0 + t * (y1 - y0)
            gx = (sx - raster.x_min) / raster.resolution - 0.5
            gy = (sy - raster.y_min) / raster.resolution - 0.5
            c0 = np.floor(gx).astype(np.int64)
            b0 = np.floor(gy).astype(np.int64)
            fx = gx - c0
            fy = gy - b0
            ok = (
                (c0 >= 0)
                & (c0 + 1 < raster.width)
                & (b0 >= 0)
                & (b0 + 1 < raster.height)
            )
            if not ok.any():
                continue
            k, t, sx, sy = k[ok], t[ok], sx[ok], sy[ok]
            c0, b0, fx, fy = c0[ok], b0[ok], fx[ok], fy[ok]
            r1 = raster.height - 1 - b0
            r0 = r1 - 1
            lo, hi = int(r0.min()), int(r1.max())
            win = raster.read_window(band, lo, 0, hi - lo + 1, raster.width)
            v00 = win[r1 - lo, c0]
            v10 = win[r1 - lo, c0 + 1]
            v01 = win[r0 - lo, c0]
            v11 = win[r0 - lo, c0 + 1]
            valid = (
                (v00 != NODATA)
                & (v10 != NODATA)
                & (v01 != NODATA)
                & (v11 != NODATA)
            )
            val = (
                v00 * (1.0 - fx) * (1.0 - fy)
                + v10 * fx * (1.0 - fy)
                + v01 * (1.0 - fx) * fy
                + v11 * fx * fy
            )
            val = np.sign(val) * np.floor(np.abs(val) * 1e6 + 0.5) / 1e6
            dist = t * seg
            dist = np.sign(dist) * np.floor(np.abs(dist) * 1e6 + 0.5) / 1e6
            parts.append(
                pa.table(
                    {
                        "k": pa.array(k[valid]),
                        "dist": pa.array(dist[valid]),
                        "x": pa.array(sx[valid]),
                        "y": pa.array(sy[valid]),
                        band: pa.array(val[valid]),
                    }
                )
            )
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                band: pa.array([], pa.float64()),
            }
        )

    ds = rd.from_items(specs).repartition(min(len(specs), 32))
    return ds.map_batches(sample, batch_format="pyarrow", batch_size=2)


def sql_profile(
    raster: SyntheticRaster,
    p0: tuple[float, float],
    p1: tuple[float, float],
    n_steps: int,
    band: str = "elev",
) -> str:
    """Oracle: the same parametric bilinear law over generate_series k."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0r, y0r = raster.x_min, raster.y_min
    p1x, p1y = float(p1[0]), float(p1[1])
    p0x, p0y = float(p0[0]), float(p0[1])
    seg = float(np.sqrt((p1x - p0x) ** 2 + (p1y - p0y) ** 2))
    pp1, pp2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    t = f"(CAST(k.i AS DOUBLE) / {float(n_steps)!r})"
    sx = f"({p0x!r} + {t} * ({p1x!r} - {p0x!r}))"
    sy = f"({p0y!r} + {t} * ({p1y!r} - {p0y!r}))"
    gx = f"(({sx} - {x0r!r}) / {res!r} - 0.5)"
    gy = f"(({sy} - {y0r!r}) / {res!r} - 0.5)"
    c0 = f"CAST(floor({gx}) AS BIGINT)"
    b0 = f"CAST(floor({gy}) AS BIGINT)"
    fx = f"({gx} - {c0})"
    fy = f"({gy} - {b0})"
    r1 = f"({h} - 1 - {b0})"
    r0 = f"({r1} - 1)"

    def zv(rr, cc):
        return f"((({rr}) * {pp1} + ({cc}) * {pp2}) % 1000)::DOUBLE"

    def okv(rr, cc):
        return f"((({rr}) * 7919 + ({cc}) * 104729) % 100) >= {pct}"

    val = (
        f"({zv(r1, c0)} * (1.0 - {fx}) * (1.0 - {fy})"
        f" + {zv(r1, f'{c0} + 1')} * {fx} * (1.0 - {fy})"
        f" + {zv(r0, c0)} * (1.0 - {fx}) * {fy}"
        f" + {zv(r0, f'{c0} + 1')} * {fx} * {fy})"
    )
    valid = " AND ".join(
        [okv(r1, c0), okv(r1, f"{c0} + 1"), okv(r0, c0), okv(r0, f"{c0} + 1")]
    )
    return f"""
SELECT k.i AS k,
       ROUND(({t} * {seg!r}) * 1000000.0) / 1000000.0 AS dist,
       {sx} AS x, {sy} AS y,
       ROUND(({val}) * 1000000.0) / 1000000.0 AS {band}
FROM (SELECT UNNEST(generate_series(0, {n_steps})) AS i) k
WHERE {c0} >= 0 AND {c0} + 1 < {w} AND {b0} >= 0 AND {b0} + 1 < {h}
  AND {valid}
"""


# ---------------------------------------------------------------------------
# flow accumulation / cost distance / viewshed
# ---------------------------------------------------------------------------

_D8_BY_CODE = {code: (dr, dc) for dr, dc, code in _D8}


def _flow_forest(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Gather the D8 flow FOREST — one next-pointer per valid pixel —
    from the distributed stencil.  Returns (x, y, lin, nxt) sorted by
    linear pixel id; nxt[i] = position of i's flow target, -1 when the
    pixel is a pit/flat or its target is not a valid pixel."""
    d8 = d8_flow_raster(
        raster,
        band=band,
        tile_size_cell=tile_size_cell,
        concurrency=concurrency,
    )
    tbl = pa.concat_tables(d8.iter_batches(batch_size=None, batch_format="pyarrow"))
    x = np.asarray(tbl["x"], np.float64)
    y = np.asarray(tbl["y"], np.float64)
    code = np.asarray(tbl["d8"], np.int64)
    res, h, w = raster.resolution, raster.height, raster.width
    ci = np.rint((x - raster.x_min) / res).astype(np.int64)
    ri = (h - 1 - np.rint((y - raster.y_min) / res)).astype(np.int64)
    lin = ri * w + ci
    order = np.argsort(lin)
    lin, ci, ri, code, x, y = (
        lin[order], ci[order], ri[order], code[order], x[order], y[order]
    )
    dr = np.zeros(len(lin), np.int64)
    dc = np.zeros(len(lin), np.int64)
    for cd, (drr, dcc) in _D8_BY_CODE.items():
        m = code == cd
        dr[m], dc[m] = drr, dcc
    tgt = (ri + dr) * w + (ci + dc)
    pos = np.searchsorted(lin, tgt)
    pos = np.clip(pos, 0, len(lin) - 1)
    has = (code != 0) & (lin[pos] == tgt)
    nxt = np.where(has, pos, -1)
    return x, y, lin, nxt


def flow_accumulation(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Upstream-cell count per pixel over the D8 flow forest: for every
    valid pixel, how many other pixels' steepest-descent paths pass
    through it.  An edge u -> t exists when u's D8 target t is itself a
    valid pixel; D8 targets strictly lower ground, so the forest is
    acyclic and accumulation is the ancestor count.

    Scale shape: the D8 field is the tile+halo stencil (distributed);
    the forest fold here is the lattice-bounded driver peel (vectorized
    Kahn waves over one int per pixel — the hex_bfs shape).  At planet
    rasters the same edges feed pointer-doubling reach-pair emission
    (graph.py's pointer-jump machinery) instead of a driver array.
    """
    import ray.data as rd

    x, y, lin, nxt = _flow_forest(
        raster, band=band, tile_size_cell=tile_size_cell,
        concurrency=concurrency,
    )
    n = len(lin)
    acc = np.zeros(n, np.int64)
    indeg = np.bincount(nxt[nxt >= 0], minlength=n)
    done = np.zeros(n, bool)
    ready = indeg == 0
    while ready.any():
        u = np.flatnonzero(ready & ~done)
        if not len(u):
            break
        done[u] = True
        uh = u[nxt[u] >= 0]
        t = nxt[uh]
        np.add.at(acc, t, acc[uh] + 1)
        np.subtract.at(indeg, t, 1)
        ready = (indeg == 0) & ~done
    return rd.from_arrow(
        pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "acc": pa.array(acc, pa.int64()),
            }
        )
    )


class BowlRaster(RasterSource):
    """Synthetic convergent elevation surface for hydrology fixtures: a
    paraboloid bowl (minimum at the raster center) plus a small LCG
    roughness term so no two neighbor drops tie, with a sparse nodata
    sprinkle.  All values are small integers — every engine/oracle
    comparison is exact.  The sawtooth ``SyntheticRaster`` law has an
    almost-constant gradient (parallel flow, no convergence), which makes
    flow accumulation trivially 0/1; the bowl drains to the center and
    exercises deep accumulation chains."""

    def __init__(
        self,
        height: int = 64,
        width: int = 64,
        x_min: float = 0.0,
        y_min: float = 0.0,
        resolution: float = 1000.0,
        nodata_pct: int = 3,
    ):
        self.height = height
        self.width = width
        self.x_min = x_min
        self.y_min = y_min
        self.resolution = resolution
        self.nodata_pct = int(nodata_pct)
        self.bands = ("elev",)

    def read_window(self, band, row0, col0, h, w):
        rows = np.arange(row0, min(row0 + h, self.height))
        cols = np.arange(col0, min(col0 + w, self.width))
        r, c = np.meshgrid(rows, cols, indexing="ij")
        ch, cw = self.height // 2, self.width // 2
        v = (
            (r - ch) * (r - ch)
            + (c - cw) * (c - cw)
            + (r * 68917 + c * 92821) % 7
        ).astype(np.float64)
        nod = ((r * 7919 + c * 104729) % 100) < self.nodata_pct
        v[nod] = NODATA
        return v

    def sql_value_expr(self, rr: str, cc: str) -> str:
        ch, cw = self.height // 2, self.width // 2
        return (
            f"((({rr}) - {ch}) * (({rr}) - {ch})"
            f" + (({cc}) - {cw}) * (({cc}) - {cw})"
            f" + ((({rr}) * 68917 + ({cc}) * 92821) % 7))::DOUBLE"
        )

    def sql_ok_expr(self, rr: str, cc: str) -> str:
        return (
            f"((({rr}) * 7919 + ({cc}) * 104729) % 100) >= {self.nodata_pct}"
        )


def sql_flow_accum(raster: BowlRaster, tile_size_cell: int = 128) -> str:
    """Oracle: a D8 twin over the raster's own law expressions feeding a
    WITH RECURSIVE reach-pair closure; accumulation = ancestors per cell
    (COUNT of reach pairs)."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min

    def pz(dr, dc):
        return raster.sql_value_expr(f"ri + {dr}", f"ci + {dc}")

    valid = " AND ".join(
        raster.sql_ok_expr(f"r.i + {dr}", f"c.i + {dc}")
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
    )
    branches = " UNION ALL ".join(
        f"SELECT ri, ci, {i} AS ordi, {code} AS code,"
        f" ({pz(0, 0)} - {pz(dr, dc)}) /"
        + (f" ({res!r} * sqrt(2.0))" if dr and dc else f" {res!r}")
        + " AS dropv FROM px"
        for i, (dr, dc, code) in enumerate(_D8)
    )
    dirs = ", ".join(
        f"({code}, {dr}, {dc})" for dr, dc, code in _D8
    )
    return f"""
WITH RECURSIVE px AS (
  SELECT r.i AS ri, c.i AS ci
  FROM (SELECT UNNEST(generate_series(1, {h - 2})) AS i) r,
       (SELECT UNNEST(generate_series(1, {w - 2})) AS i) c
  WHERE {valid}
), drops AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ri, ci
                               ORDER BY dropv DESC, ordi ASC) AS rn
  FROM ({branches})
), flow AS (
  SELECT ri, ci,
         {x0!r} + ci * {res!r} AS x,
         {y0!r} + ({h} - ri - 1) * {res!r} AS y,
         CASE WHEN dropv > 0.0 THEN code ELSE 0 END::BIGINT AS d8
  FROM drops WHERE rn = 1
), dirs(code, dr, dc) AS (VALUES {dirs}),
edges AS (
  SELECT f.ri, f.ci, f.ri + d.dr AS tr, f.ci + d.dc AS tc
  FROM flow f JOIN dirs d ON f.d8 = d.code
  WHERE f.d8 != 0 AND EXISTS (
    SELECT 1 FROM flow t WHERE t.ri = f.ri + d.dr AND t.ci = f.ci + d.dc)
), reach(sr, sc, cr, cc) AS (
  SELECT ri, ci, tr, tc FROM edges
  UNION
  SELECT r.sr, r.sc, e.tr, e.tc FROM reach r
  JOIN edges e ON e.ri = r.cr AND e.ci = r.cc
), acc AS (
  SELECT cr, cc, COUNT(*) AS acc FROM reach GROUP BY cr, cc
)
SELECT f.x, f.y, COALESCE(a.acc, 0)::BIGINT AS acc
FROM flow f LEFT JOIN acc a ON a.cr = f.ri AND a.cc = f.ci
"""


def cost_distance(
    raster: RasterSource,
    source_rc: tuple[int, int],
    *,
    band: str = "pop",
    strip_rows: int = 64,
):
    """Least-cost distance field from a source cell over a cost raster:
    4-neighbor moves, cost of a move = value of the ENTERED cell + 1
    (strictly positive), nodata impassable.  Costs are integer-valued
    doubles, so every distance is exact and order-free.

    Scale shape: the cost/validity field is read in distributed row
    strips; the fold is an exact driver Dijkstra over one (cost, valid)
    pair per cell — lattice-bounded like hex_bfs.  At planet rasters the
    same strip reads feed distributed delta-stepping supersteps.
    Returns (x, y, cost) for every REACHED cell.
    """
    import ray.data as rd

    h, res = raster.height, raster.resolution
    dist, valid, _cost = _cost_field(
        raster, source_rc, band=band, strip_rows=strip_rows
    )
    rr, cc = np.nonzero(np.isfinite(dist) & valid)
    return rd.from_arrow(
        pa.table(
            {
                "x": pa.array(raster.x_min + cc * res),
                "y": pa.array(raster.y_min + (h - rr - 1) * res),
                "cost": pa.array(dist[rr, cc]),
            }
        )
    )


def sql_cost_distance(
    raster: SyntheticRaster,
    source_rc: tuple[int, int],
    band: str = "pop",
) -> str:
    """Oracle: staged Bellman-Ford generated to the exact fixpoint
    depth of the same recurrence on this fixture (the stage count is a
    fixture constant, computed from the same closed-form law)."""
    h, w = raster.height, raster.width
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    res, x0, y0 = raster.resolution, raster.x_min, raster.y_min

    # exact stage count: run the staged Bellman recurrence itself
    # (d_k = MIN(d_{k-1}, relax(d_{k-1}))) to its fixpoint — the SQL
    # stages below compute the identical recurrence, so k_stages is by
    # construction enough and integer-valued doubles make it exact.
    val = (np.arange(h)[:, None] * p1 + np.arange(w)[None, :] * p2) % 1000
    nod = (
        np.arange(h)[:, None] * 7919 + np.arange(w)[None, :] * 104729
    ) % 100 < pct
    valid = ~nod
    cost = val.astype(np.float64) + 1.0
    r0, c0 = source_rc
    INF = np.inf
    dist = np.full((h, w), INF)
    dist[r0, c0] = 0.0
    k_stages = 0
    while True:
        nd = dist.copy()
        for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
            shifted = np.full((h, w), INF)
            src = dist[
                max(0, -dr) : h - max(0, dr), max(0, -dc) : w - max(0, dc)
            ]
            shifted[
                max(0, dr) : h - max(0, -dr), max(0, dc) : w - max(0, -dc)
            ] = src
            cand = shifted + cost
            nd = np.minimum(nd, np.where(valid, cand, INF))
        nd[~valid] = INF
        k_stages += 1
        if np.array_equal(nd, dist, equal_nan=False) or np.all(
            (nd == dist) | (np.isinf(nd) & np.isinf(dist))
        ):
            break
        dist = nd

    zc = f"(((r.i) * {p1} + (c.i) * {p2}) % 1000)::DOUBLE"
    okc = f"(((r.i) * 7919 + (c.i) * 104729) % 100) >= {pct}"
    parts = [
        (
            f"cells AS (SELECT r.i AS ri, c.i AS ci, {zc} + 1.0 AS w"
            f" FROM (SELECT UNNEST(generate_series(0, {h - 1})) AS i) r,"
            f" (SELECT UNNEST(generate_series(0, {w - 1})) AS i) c"
            f" WHERE {okc})"
        ),
        (
            "edges AS (SELECT a.ri AS fr, a.ci AS fc, b.ri AS tr,"
            " b.ci AS tc, b.w FROM cells a JOIN cells b"
            " ON (abs(a.ri - b.ri) + abs(a.ci - b.ci)) = 1)"
        ),
        f"d0(ri, ci, d) AS (VALUES ({r0}, {c0}, 0.0))",
    ]
    for k in range(1, k_stages + 1):
        # MATERIALIZED: each stage references its predecessor twice, and
        # DuckDB inlines plain CTEs -> exponential expansion without it.
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT ri, ci, MIN(d) AS d FROM ("
            f"SELECT ri, ci, d FROM d{k - 1}"
            f" UNION ALL"
            f" SELECT e.tr AS ri, e.tc AS ci, p.d + e.w AS d"
            f" FROM d{k - 1} p JOIN edges e ON e.fr = p.ri AND e.fc = p.ci"
            f") GROUP BY ri, ci)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT {x0!r} + ci * {res!r} AS x,"
        f" {y0!r} + ({h} - ri - 1) * {res!r} AS y, d AS cost"
        f" FROM d{k_stages}"
    )


def _cost_field(
    raster: RasterSource,
    source_rc: tuple[int, int],
    *,
    band: str = "pop",
    strip_rows: int = 64,
):
    """Distributed row-strip read of the cost band + exact driver
    Dijkstra.  Returns (dist, valid, cost) dense grids (see
    :func:`cost_distance` for the law and the scale notes)."""
    import heapq

    import ray.data as rd

    h, w = raster.height, raster.width
    strips = [
        {"r0": r0, "nr": min(strip_rows, h - r0)}
        for r0 in range(0, h, strip_rows)
    ]

    def read_strip(b: pa.Table) -> pa.Table:
        parts_r, parts_c, parts_v = [], [], []
        for r0, nr in zip(
            np.asarray(b["r0"], np.int64), np.asarray(b["nr"], np.int64)
        ):
            z = raster.read_window(band, int(r0), 0, int(nr), w)
            rr, cc = np.meshgrid(
                np.arange(r0, r0 + nr), np.arange(w), indexing="ij"
            )
            parts_r.append(rr.ravel())
            parts_c.append(cc.ravel())
            parts_v.append(z.ravel())
        return pa.table(
            {
                "ri": np.concatenate(parts_r).astype(np.int64),
                "ci": np.concatenate(parts_c).astype(np.int64),
                "v": np.concatenate(parts_v),
            }
        )

    cells = rd.from_items(strips).map_batches(
        read_strip, batch_format="pyarrow"
    )
    tbl = pa.concat_tables(cells.iter_batches(batch_size=None, batch_format="pyarrow"))
    grid = np.full((h, w), np.nan)
    grid[
        np.asarray(tbl["ri"], np.int64), np.asarray(tbl["ci"], np.int64)
    ] = np.asarray(tbl["v"], np.float64)
    valid = grid != NODATA
    cost = grid + 1.0

    r0, c0 = source_rc
    if not valid[r0, c0]:
        raise ValueError("source cell is nodata")
    dist = np.full((h, w), np.inf)
    dist[r0, c0] = 0.0
    pq = [(0.0, r0, c0)]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < h and 0 <= nc < w and valid[nr, nc]:
                nd = d + cost[nr, nc]
                if nd < dist[nr, nc]:
                    dist[nr, nc] = nd
                    heapq.heappush(pq, (nd, nr, nc))
    return dist, valid, cost


def cost_path(
    raster: RasterSource,
    source_rc: tuple[int, int],
    *,
    band: str = "pop",
    strip_rows: int = 64,
):
    """Extract THE least-cost path from the source to the most expensive
    reachable cell (ties -> largest (ri, ci)): backtrack from the target
    along predecessors, where the predecessor of a cell is the smallest
    (ri, ci) neighbor n with dist[n] + cost[cell] == dist[cell] — exact
    on integer-valued doubles, so engine and oracle walk the same cells.
    Rows (seq, x, y, cost) with seq = 0 at the target, increasing toward
    the source."""
    import ray.data as rd

    h, w, res = raster.height, raster.width, raster.resolution
    dist, valid, cost = _cost_field(
        raster, source_rc, band=band, strip_rows=strip_rows
    )
    reach = np.isfinite(dist) & valid
    rr, cc = np.nonzero(reach)
    order = np.lexsort((cc, rr, dist[rr, cc]))
    tr, tc = int(rr[order[-1]]), int(cc[order[-1]])

    seq_r, seq_c = [tr], [tc]
    cur = (tr, tc)
    while cur != tuple(source_rc):
        r, c = cur
        pred = None
        for dr, dc in ((-1, 0), (0, -1), (0, 1), (1, 0)):  # (ri, ci) order
            nr, nc = r + dr, c + dc
            if (
                0 <= nr < h
                and 0 <= nc < w
                and reach[nr, nc]
                and dist[nr, nc] + cost[r, c] == dist[r, c]
            ):
                pred = (nr, nc)
                break
        assert pred is not None, "broken backtrack"
        seq_r.append(pred[0])
        seq_c.append(pred[1])
        cur = pred
    sr = np.asarray(seq_r, np.int64)
    sc = np.asarray(seq_c, np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "seq": pa.array(np.arange(len(sr)), pa.int64()),
                "x": pa.array(raster.x_min + sc * res),
                "y": pa.array(raster.y_min + (h - sr - 1) * res),
                "cost": pa.array(dist[sr, sc]),
            }
        )
    )


def sql_cost_path(
    raster: SyntheticRaster,
    source_rc: tuple[int, int],
    band: str = "pop",
) -> str:
    """Oracle: the staged Bellman field + a per-cell predecessor table
    (QUALIFY smallest (ri, ci) exact-relaxation neighbor) + a recursive
    backtrack walk from the argmax target."""
    base = sql_cost_distance(raster, source_rc, band)
    # reuse the generated stages: strip the trailing SELECT, keep the WITH
    head, _, _tail = base.rpartition(" SELECT ")
    h, res = raster.height, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    import re

    k_stages = max(
        int(m) for m in re.findall(r"\bd(\d+) AS", base)
    )
    return (
        head.replace("WITH ", "WITH RECURSIVE ", 1)
        + f", dist AS (SELECT ri, ci, d FROM d{k_stages}), "
        f"tgt AS (SELECT ri, ci FROM dist"
        f" ORDER BY d DESC, ri DESC, ci DESC LIMIT 1), "
        f"pred AS (SELECT c.ri, c.ci, n.ri AS pr, n.ci AS pc"
        f" FROM dist c JOIN edges e ON e.tr = c.ri AND e.tc = c.ci"
        f" JOIN dist n ON n.ri = e.fr AND n.ci = e.fc"
        f" WHERE n.d + e.w = c.d"
        f" QUALIFY ROW_NUMBER() OVER (PARTITION BY c.ri, c.ci"
        f" ORDER BY n.ri, n.ci) = 1), "
        f"path(seq, ri, ci) AS ("
        f"SELECT 0, ri, ci FROM tgt"
        f" UNION ALL"
        f" SELECT p.seq + 1, q.pr, q.pc FROM path p"
        f" JOIN pred q ON q.ri = p.ri AND q.ci = p.ci) "
        f"SELECT p.seq::BIGINT AS seq,"
        f" {x0!r} + p.ci * {res!r} AS x,"
        f" {y0!r} + ({h} - p.ri - 1) * {res!r} AS y,"
        f" dd.d AS cost"
        f" FROM path p JOIN dist dd ON dd.ri = p.ri AND dd.ci = p.ci"
    )


def watershed_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Watershed labeling over the D8 flow forest: every valid pixel is
    labeled with the SINK its steepest-descent path terminates at (a
    pit/flat or a pixel whose target leaves the valid set).  Rows
    (x, y, sink_ri, sink_ci).

    Scale shape: the D8 field is the tile+halo stencil; the root find is
    pointer DOUBLING (ptr = ptr[ptr] until fixpoint, log-depth), here on
    the gathered forest array, at planet scale as join supersteps over
    the same (pixel, next) pair table."""
    import ray.data as rd

    x, y, lin, nxt = _flow_forest(
        raster, band=band, tile_size_cell=tile_size_cell,
        concurrency=concurrency,
    )
    n = len(lin)
    ptr = np.where(nxt >= 0, nxt, np.arange(n))
    while True:
        ptr2 = ptr[ptr]
        if np.array_equal(ptr2, ptr):
            break
        ptr = ptr2
    sink = lin[ptr]
    w = raster.width
    return rd.from_arrow(
        pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "sink_ri": pa.array(sink // w, pa.int64()),
                "sink_ci": pa.array(sink % w, pa.int64()),
            }
        )
    )


def sql_watershed(raster: BowlRaster, tile_size_cell: int = 128) -> str:
    """Oracle: the bowl D8 twin + a recursive walk to the terminal cell
    (the row of the closure whose current cell has no outgoing edge)."""
    accum = sql_flow_accum(raster, tile_size_cell)
    head, _, _tail = accum.rpartition("), reach(")
    # rebuild from the shared px/drops/flow/dirs/edges prefix
    prefix = head + ")"
    return (
        prefix
        + """, walk(ri, ci, cr, cc) AS (
  SELECT ri, ci, ri, ci FROM flow
  UNION
  SELECT w.ri, w.ci, e.tr, e.tc FROM walk w
  JOIN edges e ON e.ri = w.cr AND e.ci = w.cc
), sinks AS (
  SELECT w.ri, w.ci, w.cr AS sink_ri, w.cc AS sink_ci FROM walk w
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e WHERE e.ri = w.cr AND e.ci = w.cc)
)
SELECT f.x, f.y, s.sink_ri, s.sink_ci
FROM flow f JOIN sinks s ON s.ri = f.ri AND s.ci = f.ci
"""
    )


class ViewshedKernel:
    """Actor-pool kernel: line-of-sight visibility of every valid cell
    from a fixed observer.  Law (twin-identical, division-free in the
    sampling): target at Chebyshev distance K is sampled at steps
    i = 1..K-1, sample cell = obs + floor((delta * i) / K + 0.5) per
    axis (the rational midpoint walk); a VALID sample blocks the target
    when its slope (z_s - z_o) / i >= target slope (z_t - z_o) / K;
    nodata samples are transparent.  Each tile task reads ONE window —
    the bbox of the observer and the tile (all its rays live inside it);
    for planet rasters swap in the R2/reference-plane sweep, which needs
    only a ring halo per tile.
    """

    def __init__(
        self,
        raster: RasterSource,
        obs_rc: tuple[int, int],
        tile_size_cell: int,
        band: str = "elev",
    ):
        self.r = raster
        self.ro, self.co = int(obs_rc[0]), int(obs_rc[1])
        self.ts = int(tile_size_cell)
        self.band = band

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            t = self._tile(int(xt), int(yt))
            if t is not None:
                parts.append(t)
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "vis": pa.array([], pa.int64()),
            }
        )

    def _tile(self, xt: int, yt: int):
        r, ts = self.r, self.ts
        row0 = r.height - (yt + 1) * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        col0 = xt * ts
        if h <= 0 or col0 >= r.width:
            return None
        r1 = min(row0 + h, r.height)
        c1 = min(col0 + ts, r.width)
        # one window covering the observer and the whole tile
        wr0 = min(row0, self.ro)
        wc0 = min(col0, self.co)
        wr1 = max(r1, self.ro + 1)
        wc1 = max(c1, self.co + 1)
        z = r.read_window(self.band, wr0, wc0, wr1 - wr0, wc1 - wc0)
        zo = z[self.ro - wr0, self.co - wc0]
        if zo == NODATA:
            raise ValueError("observer cell is nodata")

        rr, cc = np.meshgrid(
            np.arange(row0, r1), np.arange(col0, c1), indexing="ij"
        )
        rr, cc = rr.ravel(), cc.ravel()
        zt = z[rr - wr0, cc - wc0]
        keep = (zt != NODATA) & ~((rr == self.ro) & (cc == self.co))
        rr, cc, zt = rr[keep], cc[keep], zt[keep]
        if not len(rr):
            return None
        dr = rr - self.ro
        dc = cc - self.co
        K = np.maximum(np.abs(dr), np.abs(dc))
        kmax = int(K.max())
        vis = np.ones(len(rr), bool)
        if kmax >= 2:
            i = np.arange(1, kmax, dtype=np.int64)[None, :]
            live = i < K[:, None]
            sr = self.ro + np.floor((dr[:, None] * i) / K[:, None] + 0.5).astype(
                np.int64
            )
            sc = self.co + np.floor((dc[:, None] * i) / K[:, None] + 0.5).astype(
                np.int64
            )
            sr_c = np.clip(sr, wr0, wr1 - 1)
            sc_c = np.clip(sc, wc0, wc1 - 1)
            zs = z[sr_c - wr0, sc_c - wc0]
            valid_s = live & (zs != NODATA)
            slope_s = (zs - zo) / i.astype(np.float64)
            slope_t = (zt - zo) / K.astype(np.float64)
            blocked = (valid_s & (slope_s >= slope_t[:, None])).any(axis=1)
            vis = ~blocked
        return pa.table(
            {
                "x": pa.array(r.x_min + cc * r.resolution),
                "y": pa.array(
                    r.y_min + (r.height - rr - 1) * r.resolution
                ),
                "vis": pa.array(vis.astype(np.int64)),
            }
        )


def viewshed_raster(
    raster: RasterSource,
    obs_rc: tuple[int, int],
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Raster -> per-cell observer-visibility Dataset (tile kernel)."""
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    if concurrency is not None:
        return ds.map_batches(
            ViewshedKernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=(raster, obs_rc, tile_size_cell, band),
            concurrency=concurrency,
        )
    return ds.map_batches(
        ViewshedKernel(raster, obs_rc, tile_size_cell, band),
        batch_format="pyarrow",
        batch_size=4,
    )


def sql_viewshed(
    raster: SyntheticRaster,
    obs_rc: tuple[int, int],
    band: str = "elev",
) -> str:
    """Oracle: correlated generate_series sampling along each ray with
    the identical floor(+0.5) midpoint walk and slope comparison."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    ro, co = int(obs_rc[0]), int(obs_rc[1])

    def zv(rr, cc):
        return f"((({rr}) * {p1} + ({cc}) * {p2}) % 1000)::DOUBLE"

    def okv(rr, cc):
        return f"((({rr}) * 7919 + ({cc}) * 104729) % 100) >= {pct}"

    zo = zv(ro, co)
    sr = f"({ro} + CAST(FLOOR(((t.ri - {ro}) * s.i) / t.k + 0.5) AS BIGINT))"
    sc = f"({co} + CAST(FLOOR(((t.ci - {co}) * s.i) / t.k + 0.5) AS BIGINT))"
    return f"""
WITH t AS (
  SELECT r.i AS ri, c.i AS ci,
         GREATEST(abs(r.i - {ro}), abs(c.i - {co})) AS k
  FROM (SELECT UNNEST(generate_series(0, {h - 1})) AS i) r,
       (SELECT UNNEST(generate_series(0, {w - 1})) AS i) c
  WHERE {okv("r.i", "c.i")} AND NOT (r.i = {ro} AND c.i = {co})
), blocked AS (
  SELECT DISTINCT t.ri, t.ci
  FROM t, UNNEST(generate_series(1, t.k - 1)) AS s(i)
  WHERE {okv(sr, sc)}
    AND ({zv(sr, sc)} - {zo}) / s.i >= ({zv("t.ri", "t.ci")} - {zo}) / t.k
)
SELECT {x0!r} + t.ci * {res!r} AS x,
       {y0!r} + ({h} - t.ri - 1) * {res!r} AS y,
       CASE WHEN b.ri IS NULL THEN 1 ELSE 0 END::BIGINT AS vis
FROM t LEFT JOIN blocked b ON b.ri = t.ri AND b.ci = t.ci
"""


def cost_allocation(
    raster: RasterSource,
    sources: tuple[tuple[int, int], ...],
    *,
    band: str = "pop",
    strip_rows: int = 64,
):
    """Cost allocation (network-Voronoi over a cost surface): every
    reached cell is labeled with the source it is cheapest to reach
    (tie -> smallest source index).  Distances are integer-valued
    doubles, so the argmin is exact.  Rows (x, y, src, cost).

    Scale shape: one strip-read + driver Dijkstra per source (the
    fields are independent — at scale they run as parallel jobs), then
    a vectorized argmin."""
    import ray.data as rd

    h, res = raster.height, raster.resolution
    fields = [
        _cost_field(raster, s, band=band, strip_rows=strip_rows)[0]
        for s in sources
    ]
    dist = np.stack(fields)  # (ns, h, w)
    best = np.argmin(dist, axis=0)  # first min = smallest src index
    dmin = np.take_along_axis(dist, best[None], 0)[0]
    reach = np.isfinite(dmin)
    rr, cc = np.nonzero(reach)
    return rd.from_arrow(
        pa.table(
            {
                "x": pa.array(raster.x_min + cc * res),
                "y": pa.array(raster.y_min + (h - rr - 1) * res),
                "src": pa.array(best[rr, cc].astype(np.int64)),
                "cost": pa.array(dmin[rr, cc]),
            }
        )
    )


def sql_cost_allocation(
    raster: SyntheticRaster,
    sources: tuple[tuple[int, int], ...],
    band: str = "pop",
) -> str:
    """Oracle: one staged Bellman field carrying a src column (GROUP BY
    cell+src), stages generated to the max per-source fixpoint depth,
    then a QUALIFY argmin per cell with the smallest-src tie law."""
    h, w = raster.height, raster.width
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    res, x0, y0 = raster.resolution, raster.x_min, raster.y_min

    val = (np.arange(h)[:, None] * p1 + np.arange(w)[None, :] * p2) % 1000
    nod = (
        np.arange(h)[:, None] * 7919 + np.arange(w)[None, :] * 104729
    ) % 100 < pct
    valid = ~nod
    cost = val.astype(np.float64) + 1.0
    INF = np.inf

    def depth(r0, c0):
        dist = np.full((h, w), INF)
        dist[r0, c0] = 0.0
        k = 0
        while True:
            nd = dist.copy()
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                shifted = np.full((h, w), INF)
                shifted[
                    max(0, dr) : h - max(0, -dr), max(0, dc) : w - max(0, -dc)
                ] = dist[
                    max(0, -dr) : h - max(0, dr), max(0, -dc) : w - max(0, dc)
                ]
                nd = np.minimum(nd, np.where(valid, shifted + cost, INF))
            nd[~valid] = INF
            k += 1
            if np.all((nd == dist) | (np.isinf(nd) & np.isinf(dist))):
                return k
            dist = nd

    k_stages = max(depth(r0, c0) for r0, c0 in sources)
    zc = f"(((r.i) * {p1} + (c.i) * {p2}) % 1000)::DOUBLE"
    okc = f"(((r.i) * 7919 + (c.i) * 104729) % 100) >= {pct}"
    seeds = ", ".join(
        f"({r0}, {c0}, {s}, 0.0)" for s, (r0, c0) in enumerate(sources)
    )
    parts = [
        (
            f"cells AS (SELECT r.i AS ri, c.i AS ci, {zc} + 1.0 AS w"
            f" FROM (SELECT UNNEST(generate_series(0, {h - 1})) AS i) r,"
            f" (SELECT UNNEST(generate_series(0, {w - 1})) AS i) c"
            f" WHERE {okc})"
        ),
        (
            "edges AS (SELECT a.ri AS fr, a.ci AS fc, b.ri AS tr,"
            " b.ci AS tc, b.w FROM cells a JOIN cells b"
            " ON (abs(a.ri - b.ri) + abs(a.ci - b.ci)) = 1)"
        ),
        f"d0(ri, ci, src, d) AS (VALUES {seeds})",
    ]
    for k in range(1, k_stages + 1):
        parts.append(
            f"d{k} AS MATERIALIZED (SELECT ri, ci, src, MIN(d) AS d FROM ("
            f"SELECT ri, ci, src, d FROM d{k - 1}"
            f" UNION ALL"
            f" SELECT e.tr AS ri, e.tc AS ci, p.src, p.d + e.w AS d"
            f" FROM d{k - 1} p JOIN edges e ON e.fr = p.ri AND e.fc = p.ci"
            f") GROUP BY ri, ci, src)"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT {x0!r} + ci * {res!r} AS x,"
        f" {y0!r} + ({h} - ri - 1) * {res!r} AS y,"
        f" src::BIGINT AS src, d AS cost"
        f" FROM d{k_stages}"
        f" QUALIFY ROW_NUMBER() OVER (PARTITION BY ri, ci"
        f" ORDER BY d, src) = 1"
    )


class TerrainIndexKernel:
    """Actor-pool stencil kernel: the three classic terrain-morphology
    indices per pixel in ONE 3x3 pass — TPI (topographic position:
    center minus 8-neighbor mean), TRI (Riley ruggedness: sqrt of the
    sum of squared center-neighbor differences) and roughness (window
    max - min).  Same tile + one-pixel-halo shape as
    :class:`HillshadeKernel` (no shuffle at any raster size).

    Exactness: band values are integer-valued doubles (the synthetic
    band law), so every sum/square is exact and IEEE sqrt is correctly
    rounded — the DuckDB twin (:func:`sql_terrain_index`) compares RAW
    doubles, no rounding step.  Border pixels and any pixel whose 3x3
    window touches nodata are skipped (the d8 validity law)."""

    def __init__(self, raster: RasterSource, tile_size_cell: int,
                 band: str = "elev"):
        self.r = raster
        self.ts = int(tile_size_cell)
        self.band = band

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = []
        for xt, yt in zip(
            np.asarray(batch["xt"], dtype=np.int64),
            np.asarray(batch["yt"], dtype=np.int64),
        ):
            t = self._tile(int(xt), int(yt))
            if t is not None:
                parts.append(t)
        if parts:
            return pa.concat_tables(parts)
        return pa.table(
            {
                "xt": pa.array([], pa.int64()),
                "yt": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
                "tpi": pa.array([], pa.float64()),
                "tri": pa.array([], pa.float64()),
                "rough": pa.array([], pa.float64()),
            }
        )

    def _tile(self, xt: int, yt: int):
        r, ts = self.r, self.ts
        row0 = r.height - (yt + 1) * ts
        col0 = xt * ts
        h = ts + min(row0, 0)
        row0 = max(row0, 0)
        if h <= 0 or col0 >= r.width:
            return None
        hr0 = max(row0 - 1, 0)
        hc0 = max(col0 - 1, 0)
        hh = min(row0 + h + 1, r.height) - hr0
        hw = min(col0 + ts + 1, r.width) - hc0
        z = self.r.read_window(self.band, hr0, hc0, hh, hw)
        o_r0 = max(row0, 1)
        o_r1 = min(row0 + h, r.height - 1)
        o_c0 = max(col0, 1)
        o_c1 = min(col0 + ts, r.width - 1)
        if o_r0 >= o_r1 or o_c0 >= o_c1:
            return None
        lr0, lc0 = o_r0 - hr0, o_c0 - hc0
        nh, nw = o_r1 - o_r0, o_c1 - o_c0

        def win(dr, dc):
            return z[lr0 + dr : lr0 + dr + nh, lc0 + dc : lc0 + dc + nw]

        zc = win(0, 0)
        valid = zc != NODATA
        nsum = np.zeros((nh, nw))
        sq = np.zeros((nh, nw))
        zmax = zc.copy()
        zmin = zc.copy()
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                zn = win(dr, dc)
                valid &= zn != NODATA
                nsum += zn
                d = zc - zn
                sq += d * d
                np.maximum(zmax, zn, out=zmax)
                np.minimum(zmin, zn, out=zmin)
        if not valid.any():
            return None
        tpi = zc - nsum / 8.0
        tri = np.sqrt(sq)
        rough = zmax - zmin
        rr, cc = np.nonzero(valid)
        abs_row = o_r0 + rr
        abs_col = o_c0 + cc
        return pa.table(
            {
                "xt": pa.array(np.full(len(rr), xt, dtype=np.int64)),
                "yt": pa.array(np.full(len(rr), yt, dtype=np.int64)),
                "x": pa.array(r.x_min + abs_col * r.resolution),
                "y": pa.array(
                    r.y_min + (r.height - abs_row - 1) * r.resolution
                ),
                "tpi": pa.array(tpi[valid]),
                "tri": pa.array(tri[valid]),
                "rough": pa.array(rough[valid]),
            }
        )


def terrain_index_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
    concurrency=None,
):
    """Raster -> per-pixel (tpi, tri, rough) Dataset (tile stencil)."""
    import math

    import ray.data as rd

    nxt = math.ceil(raster.width / tile_size_cell)
    nyt = math.ceil(raster.height / tile_size_cell)
    specs = [{"xt": xt, "yt": yt} for yt in range(nyt) for xt in range(nxt)]
    ds = rd.from_items(specs).repartition(min(len(specs), 128))
    if concurrency is not None:
        return ds.map_batches(
            TerrainIndexKernel,
            batch_format="pyarrow",
            batch_size=4,
            fn_constructor_args=(raster, tile_size_cell, band),
            concurrency=concurrency,
        )
    return ds.map_batches(
        TerrainIndexKernel(raster, tile_size_cell, band),
        batch_format="pyarrow",
        batch_size=4,
    )


def sql_terrain_index(
    raster: SyntheticRaster, band: str = "elev", tile_size_cell: int = 128
) -> str:
    """Oracle for :func:`terrain_index_raster`: the 8 neighbor values as
    closed-form band expressions; all arithmetic is exact on the
    integer-valued synthetic band, so no rounding step is needed."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]

    def ok(dr, dc):
        return (
            f"(((r.i + {dr}) * 7919 + (c.i + {dc}) * 104729) % 100) >= {pct}"
        )

    valid = " AND ".join(
        ok(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    )

    def pz(dr, dc):
        return f"(((ri + {dr}) * {p1} + (ci + {dc}) * {p2}) % 1000)::DOUBLE"

    nbrs = [
        (dr, dc)
        for dr in (-1, 0, 1)
        for dc in (-1, 0, 1)
        if not (dr == 0 and dc == 0)
    ]
    nsum = " + ".join(pz(dr, dc) for dr, dc in nbrs)
    sq = " + ".join(
        f"({pz(0, 0)} - {pz(dr, dc)}) * ({pz(0, 0)} - {pz(dr, dc)})"
        for dr, dc in nbrs
    )
    allv = ", ".join([pz(0, 0)] + [pz(dr, dc) for dr, dc in nbrs])
    return f"""
WITH px AS (
  SELECT r.i AS ri, c.i AS ci
  FROM (SELECT UNNEST(generate_series(1, {h - 2})) AS i) r,
       (SELECT UNNEST(generate_series(1, {w - 2})) AS i) c
  WHERE {valid}
)
SELECT (ci // {tile_size_cell})::BIGINT AS xt,
       (({h} - ri - 1) // {tile_size_cell})::BIGINT AS yt,
       {x0!r} + ci * {res!r} AS x,
       {y0!r} + ({h} - ri - 1) * {res!r} AS y,
       {pz(0, 0)} - ({nsum}) / 8.0 AS tpi,
       sqrt({sq}) AS tri,
       GREATEST({allv}) - LEAST({allv}) AS rough
FROM px
"""


def equalize_raster(
    raster: RasterSource,
    *,
    band: str = "elev",
    tile_size_cell: int = 128,
):
    """Histogram equalization of a band: every valid pixel maps to
    ``eq = ((cdf(z) - cdf_min) * 255) // (n_valid - cdf_min)`` — the
    classic image-contrast op, PURE INTEGER arithmetic (band values are
    integer-valued), so both sides are exact with no rounding step.

    Two passes over the tiled cell stream: pass 1 reduces to a (z,
    count) histogram (value-domain cardinality, not pixels) via Sum
    groupby; the CDF broadcasts in the map closure; pass 2 is a
    stateless per-batch lookup."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cells = tiling_raster(raster, tile_size_cell=tile_size_cell)

    def hist_partial(b: pa.Table) -> pa.Table:
        v = np.asarray(b[band], np.float64)
        ok = ~np.isnan(v)
        z, c = np.unique(v[ok].astype(np.int64), return_counts=True)
        return pa.table(
            {"z": pa.array(z), "c": pa.array(c.astype(np.int64))}
        )

    agg = (
        cells.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("z")
        .aggregate(Sum("c", alias_name="c"))
    )
    ht = pa.concat_tables(
        t
        for t in agg.iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    )
    z = np.asarray(ht["z"], np.int64)
    c = np.asarray(ht["c"], np.int64)
    order = np.argsort(z)
    z, c = z[order], c[order]
    cdf = np.cumsum(c)
    m = int(cdf[0])
    n = int(cdf[-1])
    lut = np.zeros(int(z.max()) + 1, np.int64)
    lut[z] = ((cdf - m) * 255) // max(n - m, 1)

    def apply(b: pa.Table) -> pa.Table:
        v = np.asarray(b[band], np.float64)
        ok = ~np.isnan(v)
        zz = v[ok].astype(np.int64)
        return pa.table(
            {
                "x": pa.array(np.asarray(b["x"], np.float64)[ok]),
                "y": pa.array(np.asarray(b["y"], np.float64)[ok]),
                "z": pa.array(zz),
                "eq": pa.array(lut[zz]),
            }
        )

    return cells.select_columns(["x", "y", band]).map_batches(
        apply, batch_format="pyarrow"
    )


def sql_equalize(raster: SyntheticRaster, band: str = "elev") -> str:
    """DuckDB twin of :func:`equalize_raster` (same integer CDF law)."""
    h, w, res = raster.height, raster.width, raster.resolution
    x0, y0 = raster.x_min, raster.y_min
    p1, p2 = _BAND_P1[band], _BAND_P2[band]
    pct = _BAND_NODATA_PCT[band]
    return f"""
WITH px AS (
  SELECT r.i AS ri, c.i AS ci,
         ((r.i * {p1} + c.i * {p2}) % 1000)::BIGINT AS z
  FROM (SELECT UNNEST(generate_series(0, {h - 1})) AS i) r,
       (SELECT UNNEST(generate_series(0, {w - 1})) AS i) c
  WHERE ((r.i * 7919 + c.i * 104729) % 100) >= {pct}
),
hi AS (SELECT z, COUNT(*)::BIGINT AS c FROM px GROUP BY z),
cd AS (
  SELECT z, SUM(c) OVER (ORDER BY z
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cdf
  FROM hi
),
mm AS (SELECT MIN(cdf) AS m, (SELECT SUM(c) FROM hi) AS n FROM cd)
SELECT {x0!r} + px.ci * {res!r} AS x,
       {y0!r} + ({h} - px.ri - 1) * {res!r} AS y,
       px.z,
       (((cd.cdf - mm.m) * 255) // GREATEST(mm.n - mm.m, 1))::BIGINT AS eq
FROM px JOIN cd ON cd.z = px.z CROSS JOIN mm
"""
