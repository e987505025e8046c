"""Great-circle (haversine) kernels over geographic coordinates.

The reference reprojects lon/lat layers (pygridmap base.py set_ref_proj)
but never measures geodesic distance; web-scale geo pipelines constantly
do (nearest-facility joins, distance filters).  This module provides the
haversine law and the classic BROADCAST-SMALL-SIDE nearest-neighbour
stage: the hub table (a handful of rows) is shipped once inside the
batch closure, every batch computes a vectorized n×K distance matrix,
and an argmin picks the winner — no shuffle at all, the 100 TB shape
for small-side spatial joins.

Laws (DuckDB twin in ``sql_haversine_expr`` — same op order; ``pi()``
is the same double as ``np.pi``; sin/cos/asin may differ in the last
ulp between the two libms, so distance OUTPUTS are rounded half-away to
3 decimals of a km (~1 m) on both sides, a step that dwarfs trig ulp
noise at continental magnitudes):

    rad  = deg * (pi / 180.0)
    s1   = sin((rlat2 - rlat1) * 0.5);  s2 = sin((rlon2 - rlon1) * 0.5)
    a    = s1*s1 + cos(rlat1) * cos(rlat2) * (s2*s2)
    dist = (2.0 * R) * asin(sqrt(a)),   R = 6371.0 km

Ties in the nearest-hub argmin break on the LOWEST hub_id on both sides
(numpy argmin takes the first index; the SQL twin orders by (d, hub_id)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "EARTH_R_KM",
    "HUBS",
    "haversine_km",
    "nearest_hub",
    "sql_haversine_expr",
    "sql_hubs_cte",
]

EARTH_R_KM = 6371.0
_DEG = np.pi / 180.0

#: fixed hub fixture: (hub_id, lon, lat) inside the synth lon/lat domain
#: (lon in [-5, 25), lat in [38, 63) — synth.SQL_LON / SQL_LAT)
HUBS: tuple[tuple[int, float, float], ...] = (
    (0, -3.7, 40.4),
    (1, 2.35, 48.85),
    (2, 13.4, 52.5),
    (3, 12.5, 41.9),
    (4, 21.0, 52.2),
    (5, 4.9, 52.4),
    (6, 19.0, 47.5),
    (7, 24.1, 56.9),
)


def haversine_km(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in km (law above; inputs in degrees,
    broadcasting allowed)."""
    rlon1 = np.asarray(lon1, np.float64) * _DEG
    rlat1 = np.asarray(lat1, np.float64) * _DEG
    rlon2 = np.asarray(lon2, np.float64) * _DEG
    rlat2 = np.asarray(lat2, np.float64) * _DEG
    s1 = np.sin((rlat2 - rlat1) * 0.5)
    s2 = np.sin((rlon2 - rlon1) * 0.5)
    a = s1 * s1 + np.cos(rlat1) * np.cos(rlat2) * (s2 * s2)
    return (2.0 * EARTH_R_KM) * np.arcsin(np.sqrt(a))


def nearest_hub(
    ds,
    *,
    hubs: tuple[tuple[int, float, float], ...] = HUBS,
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Dataset(lon, lat, ...) -> + (hub_id, hub_km): nearest hub by
    haversine distance, ties to the lowest hub_id.  Stateless map_batches
    with the hub matrix captured in the closure (broadcast once per
    worker, never per batch); output distance rounded half-away to 3dp.
    """
    hub_id = np.array([h[0] for h in hubs], dtype=np.int64)
    hub_lon = np.array([h[1] for h in hubs], dtype=np.float64)
    hub_lat = np.array([h[2] for h in hubs], dtype=np.float64)
    order = np.argsort(hub_id, kind="stable")
    hub_id, hub_lon, hub_lat = hub_id[order], hub_lon[order], hub_lat[order]

    def assign(b: pa.Table) -> pa.Table:
        lon = np.asarray(b[lon_col], np.float64)
        lat = np.asarray(b[lat_col], np.float64)
        # (n, K) distance matrix; argmin's first-index rule == lowest
        # hub_id because rows were sorted by hub_id above
        d = haversine_km(
            lon[:, None], lat[:, None], hub_lon[None, :], hub_lat[None, :]
        )
        j = np.argmin(d, axis=1)
        best = d[np.arange(len(lon)), j]
        best = np.sign(best) * np.floor(np.abs(best) * 1e3 + 0.5) / 1e3
        return b.append_column("hub_id", pa.array(hub_id[j])).append_column(
            "hub_km", pa.array(best)
        )

    return ds.map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def sql_haversine_expr(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Haversine km — twin of :func:`haversine_km` (same op order)."""
    r1a = f"({lat1} * (pi() / 180.0))"
    r2a = f"({lat2} * (pi() / 180.0))"
    s1 = f"sin(({r2a} - {r1a}) * 0.5)"
    s2 = f"sin((({lon2} * (pi() / 180.0)) - ({lon1} * (pi() / 180.0))) * 0.5)"
    a = f"({s1} * {s1} + cos({r1a}) * cos({r2a}) * ({s2} * {s2}))"
    return f"((2.0 * {EARTH_R_KM!r}) * asin(sqrt({a})))"


def sql_hubs_cte(
    hubs: tuple[tuple[int, float, float], ...] = HUBS,
) -> str:
    """`hubs(hub_id, hlon, hlat)` VALUES CTE with the exact float reprs."""
    rows = ", ".join(f"({i}, {lon!r}, {lat!r})" for i, lon, lat in hubs)
    return f"hubs(hub_id, hlon, hlat) AS (VALUES {rows})"
