"""Haversine law + broadcast nearest-hub stage."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pygridmap_ray.geodesic import (
    EARTH_R_KM,
    HUBS,
    haversine_km,
    nearest_hub,
)


def test_haversine_basics():
    z = haversine_km(np.array([5.0]), np.array([45.0]), np.array([5.0]), np.array([45.0]))
    assert z[0] == 0.0
    # 1 degree of longitude on the equator = R * 1deg-in-radians
    d = haversine_km(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert abs(d[0] - EARTH_R_KM * np.pi / 180.0) < 1e-9
    # symmetry
    a = haversine_km(np.array([2.0]), np.array([48.0]), np.array([13.0]), np.array([52.0]))
    b = haversine_km(np.array([13.0]), np.array([52.0]), np.array([2.0]), np.array([48.0]))
    assert a[0] == b[0]
    # antipodal-ish sanity: half circumference upper bound
    big = haversine_km(np.array([0.0]), np.array([0.0]), np.array([180.0]), np.array([0.0]))
    assert abs(big[0] - EARTH_R_KM * np.pi) < 1e-6


def test_nearest_hub_matches_bruteforce(ray_session):
    rng = np.random.default_rng(21)
    lon = rng.uniform(-5, 25, 2000)
    lat = rng.uniform(38, 63, 2000)
    ds = rd.from_arrow(
        pa.table({"i": np.arange(2000), "lon": lon, "lat": lat})
    ).repartition(5)
    out = nearest_hub(ds).to_pandas().sort_values("i").reset_index(drop=True)
    hub_lon = np.array([h[1] for h in HUBS])
    hub_lat = np.array([h[2] for h in HUBS])
    d = haversine_km(lon[:, None], lat[:, None], hub_lon[None, :], hub_lat[None, :])
    j = np.argmin(d, axis=1)
    assert np.array_equal(out["hub_id"].to_numpy(), j)
    best = d[np.arange(len(lon)), j]
    best = np.floor(best * 1e3 + 0.5) / 1e3
    assert np.array_equal(out["hub_km"].to_numpy(), best)


def test_accessibility_bruteforce(ray_session):
    """2SFCA == a direct two-step loop over the hub table."""
    import duckdb
    import numpy as np

    from pygridmap_ray.geodesic import HUBS, haversine_km
    from pygridmap_ray.pipelines.queries import SFCA_D_KM, q_accessibility
    from pygridmap_ray.synth import derive_lonlat

    sf_dir = "/root/testdata/sf0.001"
    out = (
        q_accessibility(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = np.sort(
        duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
        ).df()["doc_id"].to_numpy()
    )
    lon, lat = derive_lonlat(ids)
    ratios = {}
    for hid, hlon, hlat in HUBS:
        d = haversine_km(lon, lat, np.full_like(lon, hlon), np.full_like(lat, hlat))
        n = int((d <= SFCA_D_KM).sum())
        ratios[hid] = ((100.0 + 10.0 * hid) / n if n else 0.0, hlon, hlat)
    acc = np.zeros(len(ids))
    for hid, (r, hlon, hlat) in ratios.items():
        d = haversine_km(lon, lat, np.full_like(lon, hlon), np.full_like(lat, hlat))
        acc += np.where(d <= SFCA_D_KM, r, 0.0)
    assert (out["doc_id"].to_numpy() == ids).all()
    assert np.allclose(out["access"].to_numpy(), acc, atol=1e-5)
    assert (out["access"] > 0).any()
