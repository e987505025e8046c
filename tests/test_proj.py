"""CRS reprojection (geom.proj) — closed-form LAEA/WebMercator kernels.

Covers the reference's set_ref_proj coercion path (base.py:215-220):
known EPSG worked-example point, inverse round-trips, the equal-area
property (the defining invariant of LAEA), the streamed Dataset stage,
ring-layer reprojection, and numpy-vs-DuckDB twin agreement.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.geom import proj


def test_epsg_worked_example():
    # IOGP Geomatics Guidance Note 7-2, LAEA (ETRS89 / EPSG:3035) example:
    # 50°N 5°E -> E 3962799.45, N 2999718.85
    e, n = proj.laea_forward(np.array([5.0]), np.array([50.0]))
    assert abs(e[0] - 3962799.45) < 0.01
    assert abs(n[0] - 2999718.85) < 0.01
    # projection centre maps exactly onto the false origin
    e0, n0 = proj.laea_forward(np.array([10.0]), np.array([52.0]))
    assert e0[0] == proj.LAEA_FE and n0[0] == proj.LAEA_FN


def test_laea_roundtrip_grid():
    lons, lats = np.meshgrid(np.linspace(-10, 35, 25), np.linspace(30, 72, 25))
    e, n = proj.laea_forward(lons.ravel(), lats.ravel())
    lo, la = proj.laea_inverse(e, n)
    np.testing.assert_allclose(lo, lons.ravel(), atol=1e-11)
    np.testing.assert_allclose(la, lats.ravel(), atol=1e-11)


def test_laea_equal_area():
    # area of the ellipsoidal quad [20,21]°E x [45,46]°N in closed form
    # (a² Δλ (q₂-q₁)/2) must equal the planar area of its projection
    a2 = proj.A**2
    q1 = proj._q(np.sin(np.radians(45.0)))
    q2 = proj._q(np.sin(np.radians(46.0)))
    ell = a2 * np.radians(1.0) * (q2 - q1) / 2.0
    t = np.linspace(0.0, 1.0, 2001)
    bx = np.concatenate([20 + t, np.full_like(t, 21), 21 - t, np.full_like(t, 20)])
    by = np.concatenate([np.full_like(t, 45), 45 + t, np.full_like(t, 46), 46 - t])
    px, py = proj.laea_forward(bx, by)
    shoelace = 0.5 * abs(np.dot(px, np.roll(py, -1)) - np.dot(py, np.roll(px, -1)))
    assert abs(shoelace / ell - 1.0) < 1e-6


def test_webmercator_and_composite():
    x, y = proj.webmercator_forward(np.array([10.0]), np.array([52.0]))
    # x = a * radians(lon) exactly
    assert abs(x[0] - proj.A * np.radians(10.0)) < 1e-9
    lo, la = proj.webmercator_inverse(x, y)
    assert abs(lo[0] - 10.0) < 1e-12 and abs(la[0] - 52.0) < 1e-12
    # 3035 -> 3857 goes through lon/lat; closing the loop recovers inputs
    e, n = proj.laea_forward(np.array([5.0]), np.array([50.0]))
    mx, my = proj.transform_xy("EPSG:3035", "EPSG:3857", e, n)
    lo2, la2 = proj.webmercator_inverse(mx, my)
    assert abs(lo2[0] - 5.0) < 1e-9 and abs(la2[0] - 50.0) < 1e-9


def test_unsupported_crs_raises():
    with pytest.raises(ValueError, match="unsupported CRS"):
        proj.transform_xy("EPSG:32632", "EPSG:3035", [0.0], [0.0])


def test_sql_twin_matches_numpy():
    lons = np.linspace(-5.0, 25.0, 200)
    lats = np.linspace(38.0, 63.0, 200)
    e, n = proj.laea_forward(lons, lats)
    esql, nsql = proj.sql_laea_forward("lon", "lat")
    con = duckdb.connect()
    con.register("ll", pa.table({"lon": lons, "lat": lats}))
    df = con.sql(f"SELECT {esql} AS e, {nsql} AS n FROM ll").df()
    # same constants + op order: only libm trig ulps remain (~1e-9 m)
    np.testing.assert_allclose(df["e"].to_numpy(), e, atol=1e-6)
    np.testing.assert_allclose(df["n"].to_numpy(), n, atol=1e-6)


def test_reproject_rings_and_stage(ray_session):
    import ray.data as rd

    ring = np.array([[5.0, 50.0], [6.0, 50.0], [6.0, 51.0], [5.0, 51.0]])
    out = proj.reproject_rings(
        [{"id": 1, "rings": [ring]}], "EPSG:4326", "EPSG:3035"
    )
    ex, ey = proj.laea_forward(ring[:, 0], ring[:, 1])
    np.testing.assert_array_equal(out[0]["rings"][0][:, 0], ex)
    np.testing.assert_array_equal(out[0]["rings"][0][:, 1], ey)

    ds = rd.from_arrow(
        pa.table({"x": [5.0, 10.0], "y": [50.0, 52.0], "tag": ["a", "b"]})
    )
    got = proj.set_ref_crs(ds, "EPSG:3035", "EPSG:4326").to_pandas()
    e, n = proj.laea_forward(np.array([5.0, 10.0]), np.array([50.0, 52.0]))
    np.testing.assert_array_equal(got["x"].to_numpy(), e)
    np.testing.assert_array_equal(got["y"].to_numpy(), n)
    assert list(got["tag"]) == ["a", "b"]
    # equal CRSs: passthrough returns the same dataset object
    assert proj.set_ref_crs(ds, "EPSG:3035", "epsg:3035") is ds
