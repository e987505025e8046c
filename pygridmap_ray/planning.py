"""Driver-side grid / tile planning math.

Re-expresses the reference's ``GridProcessor`` geometry planning
(reference base.py:271-429) as pure functions over scalars.  These run on
the driver to build the tile-spec Dataset that ``map_batches`` kernels
fan out over — the tile is a *data row*, not a scheduling unit.

Conventions (identical to the reference):
- bbox = (xmin, ymin, xmax, ymax)                       (base.py:277)
- cellsize = (width, height)
- grid shape = (nrows, ncols) = ceil(extent/size)        (base.py:271-279)
- tile id = ix_tile + iy_tile * nxtiles                  (gridding.py:165-167)
- xypos in {LLc, LRc, URc, ULc, CC}: which corner/center of a cell the
  (x, y) columns reference                               (base.py:347-370)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

XYPOS = ("LLc", "LRc", "URc", "ULc", "CC")


def get_grid_shape(
    cellsize: tuple[float, float],
    bbox: tuple[float, float, float, float],
    buffer: tuple[float, float] = (0.0, 0.0),
) -> tuple[int, int]:
    """(nrows, ncols) of the cell grid covering bbox (reference base.py:271-279)."""
    w, h = cellsize
    xmin, ymin, xmax, ymax = bbox
    ncols = int(math.ceil((xmax - xmin + 2 * buffer[0]) / w))
    nrows = int(math.ceil((ymax - ymin + 2 * buffer[1]) / h))
    return nrows, ncols


def set_tile_shape(ntiles: int, gridshape: tuple[int, int]) -> tuple[int, int]:
    """Factor a tile COUNT into a near-square (nytiles, nxtiles) tiling that
    matches the grid aspect ratio (reference base.py:282-294)."""
    nrows, ncols = gridshape
    best = (1, ntiles)
    best_err = float("inf")
    for ny in range(1, ntiles + 1):
        if ntiles % ny:
            continue
        nx = ntiles // ny
        # aspect mismatch between tile grid and cell grid
        err = abs((nrows / max(ny, 1)) - (ncols / max(nx, 1)))
        if err < best_err:
            best_err = err
            best = (ny, nx)
    return best


def get_tile_shape(
    tilesize: tuple[int, int], gridshape: tuple[int, int]
) -> tuple[int, int]:
    """#tiles (nytiles, nxtiles) covering the grid given tile size in cells
    (reference base.py:297-308)."""
    nrows, ncols = gridshape
    return int(math.ceil(nrows / tilesize[0])), int(math.ceil(ncols / tilesize[1]))


def get_tile_size(
    tileshape: tuple[int, int], gridshape: tuple[int, int]
) -> tuple[int, int]:
    """Cells per tile (rows, cols) given the tile grid shape
    (reference base.py:311-322)."""
    nrows, ncols = gridshape
    return (
        int(math.ceil(nrows / tileshape[0])),
        int(math.ceil(ncols / tileshape[1])),
    )


def get_tile_bbox(
    iy: int,
    ix: int,
    cellsize: tuple[float, float],
    tilesize: tuple[int, int],
    bbox: tuple[float, float, float, float],
    crop: bool = True,
    buffer: tuple[float, float] = (0.0, 0.0),
) -> tuple[float, float, float, float] | None:
    """Bbox of tile [iy, ix]; ``crop`` clamps the last row/col to the grid
    extent; returns None for fully-outside tiles (reference base.py:325-344)."""
    w, h = cellsize
    xmin = bbox[0] + ix * tilesize[1] * w
    ymin = bbox[1] + iy * tilesize[0] * h
    if xmin >= bbox[2] or ymin >= bbox[3]:
        return None
    xmax = xmin + tilesize[1] * w
    ymax = ymin + tilesize[0] * h
    if crop:
        xmax = min(xmax, bbox[2])
        ymax = min(ymax, bbox[3])
    return (xmin - buffer[0], ymin - buffer[1], xmax + buffer[0], ymax + buffer[1])


def pos_offset(xypos: str, cellsize: tuple[float, float]) -> tuple[float, float]:
    """Offset from a cell's lower-left corner to its ``xypos`` reference
    point (reference base.py:347-370 corner semantics)."""
    w, h = cellsize
    if xypos == "LLc":
        return 0.0, 0.0
    if xypos == "LRc":
        return w, 0.0
    if xypos == "URc":
        return w, h
    if xypos == "ULc":
        return 0.0, h
    if xypos == "CC":
        return w / 2.0, h / 2.0
    raise ValueError(f"xypos must be one of {XYPOS}, got {xypos!r}")


def align_pos_location(
    cellsize: tuple[float, float],
    bbox: tuple[float, float, float, float],
    loc: tuple[float, float] = (0.0, 0.0),
) -> tuple[float, float, float, float]:
    """Expand a bbox so grid lines pass through the anchor location —
    INSPIRE-style grid-origin snapping (reference base.py:391-429): the
    min corner moves down/left to the nearest anchor-aligned grid line,
    the max corner up/right."""
    import math

    w, h = cellsize
    lx, ly = loc
    xmin = lx + math.floor((bbox[0] - lx) / w) * w
    ymin = ly + math.floor((bbox[1] - ly) / h) * h
    xmax = lx + math.ceil((bbox[2] - lx) / w) * w
    ymax = ly + math.ceil((bbox[3] - ly) / h) * h
    return (xmin, ymin, xmax, ymax)


def dataset_bbox(ds, x_col: str = "x", y_col: str = "y"):
    """Bounds of a point Dataset via a streaming Min/Max aggregate — the
    engine's ``get_bbox`` (reference base.py:223-234, which materializes
    ``total_bounds`` on the driver)."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(
        Min(x_col, alias_name="xmin"),
        Min(y_col, alias_name="ymin"),
        Max(x_col, alias_name="xmax"),
        Max(y_col, alias_name="ymax"),
    )
    return (row["xmin"], row["ymin"], row["xmax"], row["ymax"])


@dataclass(frozen=True)
class GridSpec:
    """Planning result shared by every gridding/overlay stage."""

    bbox: tuple[float, float, float, float]
    cellsize: tuple[float, float]
    nrows: int
    ncols: int
    nytiles: int
    nxtiles: int
    tilesize: tuple[int, int]  # (rows, cols) of cells per tile
    xypos: str = "LLc"

    @property
    def ntiles(self) -> int:
        return self.nytiles * self.nxtiles

    def tile_id(self, iy: int, ix: int) -> int:
        return ix + iy * self.nxtiles  # reference gridding.py:165-167

    def cell_id(self, iy_cell, ix_cell):
        """Global row id of a cell = iy * ncols + ix (reference __gridx__ is
        the concat row index; we use a stable function of (ix, iy) instead —
        conformance comparisons sort by key, SURVEY.md §7.5.6)."""
        return iy_cell * self.ncols + ix_cell


def plan_grid(
    bbox: tuple[float, float, float, float],
    cellsize: float | tuple[float, float],
    tile: int | tuple[int, int] = 16,
    xypos: str = "LLc",
) -> GridSpec:
    """Build the full tiling plan for a bbox.

    ``tile``: int -> target tile COUNT (factored near-square, reference
    base.py:282-294); (rows, cols) tuple -> tile size in CELLS.
    """
    if isinstance(cellsize, (int, float)):
        cellsize = (float(cellsize), float(cellsize))
    cellsize = (float(cellsize[0]), float(cellsize[1]))
    nrows, ncols = get_grid_shape(cellsize, bbox)
    if isinstance(tile, int):
        nytiles, nxtiles = set_tile_shape(tile, (nrows, ncols))
        tilesize = get_tile_size((nytiles, nxtiles), (nrows, ncols))
        nytiles, nxtiles = get_tile_shape(tilesize, (nrows, ncols))
    else:
        tilesize = (int(tile[0]), int(tile[1]))
        nytiles, nxtiles = get_tile_shape(tilesize, (nrows, ncols))
    if xypos not in XYPOS:
        raise ValueError(f"xypos must be one of {XYPOS}")
    return GridSpec(
        bbox=tuple(float(v) for v in bbox),
        cellsize=cellsize,
        nrows=nrows,
        ncols=ncols,
        nytiles=nytiles,
        nxtiles=nxtiles,
        tilesize=tilesize,
        xypos=xypos,
    )
