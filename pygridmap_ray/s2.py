"""S2-style sphere cells: cube-face projection + quadratic ST + Morton.

The reference indexes planar LAEA grids only (pygridmap gridding.py); the
north-star pipeline cell-encodes geo-tagged documents with "batched H3/S2
indexing inside map_batches".  The H3-style hexagonal lattice lives in
:mod:`pygridmap_ray.hex`; this module is the S2-style counterpart, built
from the PUBLIC s2geometry cell model (s2coords.h):

* a direction (px, py, pz) is assigned to one of six cube FACES
  (0:+x 1:+y 2:+z 3:-x 4:-y 5:-z) by its largest |component|,
* face-local (u, v) are component ratios in [-1, 1] (the canonical
  faceXYZtoUV table),
* (u, v) -> (s, t) in [0, 1] via the S2_QUADRATIC_PROJECTION law
  ``s = 0.5*sqrt(1+3u)`` for u >= 0 else ``1 - 0.5*sqrt(1-3u)`` (area
  distortion ~2.1x max instead of ~5.2x for linear),
* (s, t) quantized at `level` and interleaved into one int64 cell id:
  ``cell = face << 2*level | morton(si, ti)``.

Divergence from real S2, documented: the position code uses the MORTON
curve (shared with :mod:`pygridmap_ray.hier`) instead of Hilbert.  The
prefix/containment algebra is identical (parent = ``cell >> 2k``); only
inter-cell locality ordering differs, which no operator here relies on.

Everything is trig-free (ratios, sqrt, floor — all IEEE-correctly-rounded
and therefore bit-identical in the DuckDB twins below) and vectorized;
encoding is a stateless Arrow ``map_batches`` stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hier import MAX_LEVEL, morton_encode, sql_morton_expr

__all__ = [
    "face_uv",
    "uv_to_st",
    "s2_encode",
    "s2_parent",
    "with_s2_cells",
    "sql_s2_cte",
]


def face_uv(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, u, v) of direction vectors — the s2coords.h face table.

    Scale-invariant (pure ratios), so inputs need not be normalized; any
    component may not be exactly 0 when it is the largest.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pz = np.asarray(pz, dtype=np.float64)
    ax, ay, az = np.abs(px), np.abs(py), np.abs(pz)
    major = np.where((ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2))
    comp = np.choose(major, (px, py, pz))
    face = major + np.where(comp >= 0.0, 0, 3)
    # np.select evaluates every branch; a 0 in a non-major component is fine
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [py / px, -px / py, -px / pz, pz / px, pz / py],
            -py / pz,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [pz / px, pz / py, -py / pz, py / px, -px / py],
            -px / pz,
        )
    return face.astype(np.int64), u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic cell-size correction (S2_QUADRATIC_PROJECTION UVtoST)."""
    u = np.asarray(u, dtype=np.float64)
    # np.where evaluates both branches; the inactive one sqrts a negative
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def s2_encode(
    px: np.ndarray,
    py: np.ndarray,
    pz: np.ndarray,
    level: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(face, si, ti, cell) at `level`; cell = face << 2*level | morton."""
    if not 0 < level <= MAX_LEVEL - 2:
        raise ValueError(f"level must be in 1..{MAX_LEVEL - 2}, got {level}")
    face, u, v = face_uv(px, py, pz)
    lim = np.int64(1) << level
    scale = float(lim)
    si = np.minimum(np.floor(uv_to_st(u) * scale).astype(np.int64), lim - 1)
    ti = np.minimum(np.floor(uv_to_st(v) * scale).astype(np.int64), lim - 1)
    cell = (face << np.int64(2 * level)) | morton_encode(si, ti, level)
    return face, si, ti, cell


def s2_parent(cell: np.ndarray, levels_up: int = 1) -> np.ndarray:
    """Ancestor cell `levels_up` coarser (face prefix is preserved)."""
    return np.asarray(cell, dtype=np.int64) >> (2 * levels_up)


def with_s2_cells(
    ds,
    *,
    level: int,
    x_col: str = "px",
    y_col: str = "py",
    z_col: str = "pz",
    prefix: str = "s2_",
):
    """Stateless Arrow map_batches stage appending face/si/ti/cell columns."""

    def enc(b: pa.Table) -> pa.Table:
        face, si, ti, cell = s2_encode(
            np.asarray(b[x_col]), np.asarray(b[y_col]), np.asarray(b[z_col]),
            level,
        )
        for name, arr in (
            ("face", face), ("si", si), ("ti", ti), ("cell", cell)
        ):
            b = b.append_column(prefix + name, pa.array(arr))
        return b

    return ds.map_batches(enc, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DuckDB twins (same op order as the numpy above; ratios / sqrt / floor are
# IEEE-correctly-rounded on both sides, so doubles are bit-identical)
# ---------------------------------------------------------------------------


def _sql_st(u: str) -> str:
    return (
        f"(CASE WHEN {u} >= 0.0 THEN 0.5 * sqrt(1.0 + 3.0 * {u})"
        f" ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {u}) END)"
    )


def sql_s2_cte(level: int, xyz_cte: str = "xyz", prefix: str = "") -> str:
    """CTE chain `{p}fsel, {p}fuv, {p}s2` over `xyz_cte(doc_id, px, py,
    pz)`: `{p}s2` carries (doc_id, ..., face, si, ti, s2_cell) — twin of
    :func:`s2_encode`.  Append after the xyz CTE:
    ``WITH xyz AS (...), {sql_s2_cte(level)} SELECT ... FROM s2``."""
    p = prefix
    lim = 1 << level
    scale = repr(float(lim))
    fsel = (
        f"{p}fsel AS (SELECT *, (CASE WHEN abs(px) >= abs(py) AND"
        f" abs(px) >= abs(pz) THEN (CASE WHEN px >= 0.0 THEN 0 ELSE 3 END)"
        f" WHEN abs(py) >= abs(pz) THEN (CASE WHEN py >= 0.0 THEN 1 ELSE 4 END)"
        f" ELSE (CASE WHEN pz >= 0.0 THEN 2 ELSE 5 END) END) AS face"
        f" FROM {xyz_cte})"
    )
    uexp = (
        "(CASE face WHEN 0 THEN py / px WHEN 1 THEN -px / py"
        " WHEN 2 THEN -px / pz WHEN 3 THEN pz / px"
        " WHEN 4 THEN pz / py ELSE -py / pz END)"
    )
    vexp = (
        "(CASE face WHEN 0 THEN pz / px WHEN 1 THEN pz / py"
        " WHEN 2 THEN -py / pz WHEN 3 THEN py / px"
        " WHEN 4 THEN -px / py ELSE -px / pz END)"
    )
    fuv = f"{p}fuv AS (SELECT *, {uexp} AS fu, {vexp} AS fv FROM {p}fsel)"
    si = f"LEAST(CAST(floor({_sql_st('fu')} * {scale}) AS BIGINT), {lim - 1})"
    ti = f"LEAST(CAST(floor({_sql_st('fv')} * {scale}) AS BIGINT), {lim - 1})"
    s2 = (
        f"{p}s2 AS (SELECT *, si, ti,"
        f" (CAST(face AS BIGINT) << {2 * level}) |"
        f" {sql_morton_expr('si', 'ti')} AS s2_cell"
        f" FROM (SELECT *, {si} AS si, {ti} AS ti FROM {p}fuv))"
    )
    return f"{fsel}, {fuv}, {s2}"
