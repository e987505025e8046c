"""Map projections from first principles (no pyproj).

Upgrades ``set_ref_proj`` (reference ``base.py:215-220``, which delegates
to ``geopandas.to_crs``) from "assert CRS equal" to a real reprojection
for the CRS family the reference's domain actually uses:

- ``EPSG:4326``  — geographic lon/lat, degrees (ETRS89/WGS84 axes x=lon).
- ``EPSG:3035``  — ETRS89-extended / LAEA Europe, the Eurostat grid CRS.
- ``EPSG:3857``  — WGS84 Web (spherical) Mercator.

All formulas are public closed forms: J.P. Snyder, *Map Projections — A
Working Manual*, USGS Professional Paper 1395 (1987), §24 pp. 187-190
(Lambert Azimuthal Equal-Area on the ellipsoid, eqs. 3-11/3-12/3-16 and
24-2..24-31) and §7 pp. 41-44 (Mercator); parameterisation as published
in the IOGP/EPSG registry for the two projected CRSs.  Everything is
vectorised numpy over float64 columns; no per-row Python.

Oracle parity: :func:`sql_laea_forward` emits a DuckDB expression that
replays the forward LAEA computation CONSTANT-FOR-CONSTANT and
OP-FOR-OP against :func:`laea_forward` (the shared derived constants are
interpolated via ``repr`` so both sides parse the identical float64),
which is what lets ``oracle_sql()`` check reprojection bit-for-bit after
6-dp rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# --- GRS80 / WGS84 ellipsoid ------------------------------------------------
# GRS80 (EPSG:7019): a = 6378137, 1/f = 298.257222101.  WGS84's flattening
# differs only in the 12th digit; EPSG treats ETRS89/WGS84 as coincident at
# grid accuracy, and so do we.
A = 6378137.0
F_INV = 298.257222101
E2 = (2.0 - 1.0 / F_INV) / F_INV  # e^2 = f(2-f)
E = float(np.sqrt(E2))
K_LN = 1.0 / (2.0 * E)  # the 1/(2e) factor in q(phi)

# --- EPSG:3035 projection constants (ETRS89-extended / LAEA Europe) ---------
LAEA_LAT0 = 52.0
LAEA_LON0 = 10.0
LAEA_FE = 4321000.0
LAEA_FN = 3210000.0


def _q(sinphi):
    """Snyder eq. 3-12: the authalic-latitude kernel q(phi)."""
    return (1.0 - E2) * (
        sinphi / (1.0 - E2 * sinphi * sinphi)
        - K_LN * np.log((1.0 - E * sinphi) / (1.0 + E * sinphi))
    )


# derived constants (plain float64 so repr() round-trips exactly into SQL)
QP = float(_q(1.0))  # q at the pole
RQ = float(A * np.sqrt(QP / 2.0))  # radius of the authalic sphere
_SIN0 = float(np.sin(np.radians(LAEA_LAT0)))
_COS0 = float(np.cos(np.radians(LAEA_LAT0)))
BETA0 = float(np.arcsin(_q(_SIN0) / QP))
SINB0 = float(np.sin(BETA0))
COSB0 = float(np.cos(BETA0))
D = float(A * _COS0 / np.sqrt(1.0 - E2 * _SIN0 * _SIN0) / (RQ * COSB0))


def laea_forward(lon, lat):
    """(lon, lat) degrees -> EPSG:3035 (easting, northing) metres.

    Snyder eqs. 24-30/24-31 (oblique ellipsoidal LAEA).  Vectorised; the
    op order here is mirrored verbatim by :func:`sql_laea_forward`.
    """
    lam = np.radians(np.asarray(lon, dtype=np.float64) - LAEA_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sinphi = np.sin(phi)
    q = _q(sinphi)
    beta = np.arcsin(np.clip(q / QP, -1.0, 1.0))
    sinb, cosb = np.sin(beta), np.cos(beta)
    coslam = np.cos(lam)
    b = RQ * np.sqrt(2.0 / (1.0 + SINB0 * sinb + COSB0 * cosb * coslam))
    easting = LAEA_FE + b * D * (cosb * np.sin(lam))
    northing = LAEA_FN + (b / D) * (COSB0 * sinb - SINB0 * cosb * coslam)
    return easting, northing


def laea_inverse(easting, northing):
    """EPSG:3035 (easting, northing) -> (lon, lat) degrees.

    Snyder eqs. 24-32..24-36 with the iterative phi recovery of eq. 3-16
    (converges quadratically; 6 sweeps reach float64 round-off).
    """
    x = (np.asarray(easting, dtype=np.float64) - LAEA_FE) / D
    y = (np.asarray(northing, dtype=np.float64) - LAEA_FN) * D
    rho = np.sqrt(x * x + y * y)
    with np.errstate(invalid="ignore", divide="ignore"):
        c = 2.0 * np.arcsin(np.clip(rho / (2.0 * RQ), -1.0, 1.0))
        q = QP * (
            np.cos(c) * SINB0 + np.where(rho == 0.0, 0.0, y * np.sin(c) * COSB0 / rho)
        )
        lam = np.arctan2(
            x * np.sin(c),
            rho * COSB0 * np.cos(c) - y * SINB0 * np.sin(c),
        )
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))  # first trial (spherical)
    for _ in range(6):
        sinphi = np.sin(phi)
        denom = 1.0 - E2 * sinphi * sinphi
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (denom * denom / (2.0 * np.cos(phi))) * (
                q / (1.0 - E2)
                - sinphi / denom
                + K_LN * np.log((1.0 - E * sinphi) / (1.0 + E * sinphi))
            )
        phi = phi + np.where(np.isfinite(corr), corr, 0.0)  # poles: done
    return np.degrees(lam) + LAEA_LON0, np.degrees(phi)


# --- EPSG:3857 (spherical Web Mercator on the WGS84 semi-major axis) --------


def webmercator_forward(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    return A * lam, A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))


def webmercator_inverse(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / A)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / A)) - np.pi / 2.0
    )
    return lon, lat


def _identity2(a, b):
    return np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)


# crs -> (forward from lon/lat, inverse to lon/lat)
_CRS = {
    "EPSG:4326": (_identity2, _identity2),
    "EPSG:3035": (laea_forward, laea_inverse),
    "EPSG:3857": (webmercator_forward, webmercator_inverse),
}


def supported_crs() -> tuple[str, ...]:
    return tuple(_CRS)


def _lookup(crs: str):
    key = str(crs).upper().replace("CRS:", "EPSG:")
    if key.isdigit():
        key = f"EPSG:{key}"
    if key not in _CRS:
        raise ValueError(
            f"unsupported CRS {crs!r}; supported: {sorted(_CRS)} "
            "(reproject externally for other CRSs)"
        )
    return _CRS[key]


def transform_xy(src: str, dst: str, x, y):
    """Transform coordinate arrays src -> dst (through lon/lat)."""
    fwd_s, inv_s = _lookup(src)
    fwd_d, _ = _lookup(dst)
    if _lookup(src) is _lookup(dst):
        return _identity2(x, y)
    lon, lat = inv_s(x, y)
    return fwd_d(lon, lat)


# --- Ray Data surface -------------------------------------------------------


def reproject(ds, src: str, dst: str, x_col: str = "x", y_col: str = "y"):
    """Dataset stage: rewrite (x_col, y_col) from ``src`` to ``dst``.

    The engine's parity point for the reference's ``set_ref_proj``
    (``base.py:215-220``): where geopandas reprojects a whole
    GeoDataFrame, here the coordinate columns stream through one
    stateless Arrow ``map_batches`` stage (zero shuffle, zero state).
    """
    if _lookup(src) is _lookup(dst):
        return ds

    def _do(batch: pa.Table) -> pa.Table:
        x, y = transform_xy(
            src, dst, np.asarray(batch[x_col]), np.asarray(batch[y_col])
        )
        batch = batch.set_column(
            batch.schema.get_field_index(x_col), x_col, pa.array(x)
        )
        return batch.set_column(
            batch.schema.get_field_index(y_col), y_col, pa.array(y)
        )

    return ds.map_batches(_do, batch_format="pyarrow")


def reproject_rings(polygons: list[dict], src: str, dst: str) -> list[dict]:
    """Reproject a (small, broadcastable) polygon layer's ring coords.

    Layers are the driver-side lists of ``{"rings": [...], attrs...}``
    used by the overlay/join stages; rings are (N,2) arrays.  Note LAEA
    is equal-area but not conformal: straight edges curve under
    reprojection, so densify long edges BEFORE reprojecting if edge
    fidelity matters (the reference inherits the same caveat from
    geopandas, which also maps vertices only).
    """
    if _lookup(src) is _lookup(dst):
        return polygons
    out = []
    for p in polygons:
        p2 = dict(p)
        rings = p["rings"] if isinstance(p["rings"], list) else [p["rings"]]
        new_rings = []
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            x, y = transform_xy(src, dst, r[:, 0], r[:, 1])
            new_rings.append(np.column_stack([x, y]))
        p2["rings"] = new_rings
        out.append(p2)
    return out


def set_ref_crs(ds2, crs1: str, crs2: str | None):
    """Coerce the second layer onto the first layer's CRS (reference
    ``set_ref_proj``, base.py:215-220): passthrough when equal, else
    a streamed :func:`reproject` of ds2 -> crs1."""
    if crs2 is None or _lookup(crs1) is _lookup(crs2):
        return ds2
    return reproject(ds2, crs2, crs1)


# --- DuckDB twin ------------------------------------------------------------


def _f(c: float) -> str:
    """Float64 constant as a DuckDB DOUBLE literal.  Scientific notation
    forces DOUBLE typing (a plain decimal literal would parse as DECIMAL);
    17 significant digits round-trip any float64 exactly."""
    return f"{float(c):.16e}"


def sql_laea_forward(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """(easting_sql, northing_sql) replaying :func:`laea_forward` exactly.

    Every derived constant is interpolated as a 17-digit DOUBLE literal,
    so both sides run the identical float64 constants through the same
    op order; remaining divergence is libm trig ulps, dwarfed by the
    oracle's 6-dp rounding.
    """
    lam = f"RADIANS(({lon_expr}) - {_f(LAEA_LON0)})"
    phi = f"RADIANS({lat_expr})"
    s = f"SIN({phi})"
    q = (
        f"({_f(1.0 - E2)} * ({s} / (1.0 - {_f(E2)} * {s} * {s}) "
        f"- {_f(K_LN)} * LN((1.0 - {_f(E)} * {s}) / (1.0 + {_f(E)} * {s}))))"
    )
    beta = f"ASIN(LEAST(GREATEST({q} / {_f(QP)}, -1.0), 1.0))"
    b = (
        f"({_f(RQ)} * SQRT(2.0 / (1.0 + {_f(SINB0)} * SIN({beta}) "
        f"+ {_f(COSB0)} * COS({beta}) * COS({lam}))))"
    )
    easting = f"({_f(LAEA_FE)} + {b} * {_f(D)} * (COS({beta}) * SIN({lam})))"
    northing = (
        f"({_f(LAEA_FN)} + ({b} / {_f(D)}) * ({_f(COSB0)} * SIN({beta}) "
        f"- {_f(SINB0)} * COS({beta}) * COS({lam})))"
    )
    return easting, northing


def sql_webmercator_forward(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """(x_sql, y_sql) replaying :func:`webmercator_forward` exactly
    (same A constant, same op order; libm ulps land under 6-dp rounds)."""
    x = f"({_f(A)} * RADIANS({lon_expr}))"
    y = f"({_f(A)} * LN(TAN({_f(np.pi / 4.0)} + RADIANS({lat_expr}) / 2.0)))"
    return x, y
