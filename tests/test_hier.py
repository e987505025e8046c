"""Hierarchical (Morton/quadkey) cell index — encode laws + rollup."""

import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.hier import (
    children_codes,
    hier_rollup,
    morton_decode,
    morton_encode,
    parent_code,
    quadkey,
    with_hier_cells,
)


def _brute_interleave(ix: int, iy: int, level: int) -> int:
    code = 0
    for b in range(level):
        code |= ((ix >> b) & 1) << (2 * b)
        code |= ((iy >> b) & 1) << (2 * b + 1)
    return code


def test_encode_matches_bruteforce():
    rng = np.random.default_rng(7)
    level = 13
    ix = rng.integers(0, 1 << level, 500)
    iy = rng.integers(0, 1 << level, 500)
    codes = morton_encode(ix, iy, level)
    for a, b, c in zip(ix[:50], iy[:50], codes[:50]):
        assert c == _brute_interleave(int(a), int(b), level)


def test_decode_roundtrip():
    rng = np.random.default_rng(11)
    ix = rng.integers(0, 1 << 31, 1000)
    iy = rng.integers(0, 1 << 31, 1000)
    codes = morton_encode(ix, iy, 31)
    rx, ry = morton_decode(codes)
    assert (rx == ix).all() and (ry == iy).all()


def test_quadkey_digits():
    # ix=5 (101b), iy=3 (011b), level 3: digits 1,2,3
    codes = morton_encode(np.array([5]), np.array([3]), 3)
    assert quadkey(codes, 3)[0] == "123"
    # quadkey prefix IS the parent's quadkey
    codes = morton_encode(np.array([113]), np.array([92]), 8)
    q8 = quadkey(codes, 8)[0]
    q5 = quadkey(parent_code(codes, 3), 5)[0]
    assert q8[:5] == q5


def test_parent_children_inverse():
    kids = children_codes(37, 2)
    assert len(kids) == 16
    assert (parent_code(kids, 2) == 37).all()
    assert len(np.unique(kids)) == 16


def test_out_of_range_raises():
    with pytest.raises(ValueError):
        morton_encode(np.array([4]), np.array([0]), 2)
    with pytest.raises(ValueError):
        morton_encode(np.array([-1]), np.array([0]), 4)
    with pytest.raises(ValueError):
        morton_encode(np.array([0]), np.array([0]), 40)


def test_rollup_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 20_000
    x = rng.uniform(0, 512_000, n)
    y = rng.uniform(0, 512_000, n)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(8)
    ds = with_hier_cells(ds, resolution=1000.0, level=9)
    out = hier_rollup(ds, parent_level=3, level=9).to_pandas()

    ix = np.floor(x / 1000.0).astype(np.int64)
    iy = np.floor(y / 1000.0).astype(np.int64)
    codes = morton_encode(ix, iy, 9)
    import pandas as pd

    df = pd.DataFrame({"parent": codes >> 12, "code": codes})
    exp = df.groupby("parent").agg(n_docs=("code", "size"), n_cells=("code", "nunique"))
    got = out.set_index("parent_code").sort_index()
    assert (got["n_docs"] == exp["n_docs"].sort_index()).all()
    assert (got["n_cells"] == exp["n_cells"].sort_index()).all()


def test_zorder_locality():
    # consecutive codes along the curve stay within one cell step in x+y
    ix, iy = morton_decode(np.arange(4096, dtype=np.int64))
    d = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
    # Z-curve jumps exist, but the mean adjacency must be tight (locality)
    assert d.mean() < 2.5


def test_zrange_cover_exact_cell_set():
    from pygridmap_ray.hier import zrange_cover

    level, res = 5, 10.0
    bbox = (33.0, 71.0, 187.0, 240.0)
    ranges = zrange_cover(bbox, resolution=res, level=level)
    # expand ranges -> code set
    codes = np.concatenate(
        [np.arange(lo, hi + 1) for lo, hi in ranges]
    ) if len(ranges) else np.array([], dtype=np.int64)
    assert len(np.unique(codes)) == len(codes)  # disjoint
    # brute force: every cell whose rect intersects the bbox
    lim = 1 << level
    ix, iy = np.meshgrid(np.arange(lim), np.arange(lim), indexing="ij")
    ix, iy = ix.ravel(), iy.ravel()
    x0, y0, x1, y1 = bbox
    hit = (
        ((ix + 1) * res > x0) & (ix * res <= x1)
        & ((iy + 1) * res > y0) & (iy * res <= y1)
    )
    # the cover uses inclusive floor bounds: cells floor(x0/res)..floor(x1/res)
    qx0, qx1 = int(np.floor(x0 / res)), int(np.floor(x1 / res))
    qy0, qy1 = int(np.floor(y0 / res)), int(np.floor(y1 / res))
    hit = (ix >= qx0) & (ix <= qx1) & (iy >= qy0) & (iy <= qy1)
    expect = np.sort(morton_encode(ix[hit], iy[hit], level))
    assert np.array_equal(np.sort(codes), expect)


def test_zrange_shallow_is_superset():
    from pygridmap_ray.hier import zrange_cover

    level, res = 6, 10.0
    bbox = (55.0, 12.0, 300.0, 411.0)
    full = zrange_cover(bbox, resolution=res, level=level)
    shallow = zrange_cover(bbox, resolution=res, level=level, max_depth=3)
    def expand(r):
        return set(
            int(c) for lo, hi in r for c in range(int(lo), int(hi) + 1)
        )
    assert expand(full) <= expand(shallow)
    assert len(shallow) <= len(full)


def test_zrange_filter_matches_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hier import with_hier_cells, zrange_filter

    rng = np.random.default_rng(31)
    n = 4000
    x = rng.uniform(0, 5120, n)
    y = rng.uniform(0, 5120, n)
    ds = rd.from_arrow(pa.table({"i": np.arange(n), "x": x, "y": y})).repartition(6)
    bbox = (811.0, 73.5, 3119.0, 4805.25)
    ds = with_hier_cells(ds, resolution=10.0, level=9)
    out = zrange_filter(ds, bbox, resolution=10.0, level=9).to_pandas()
    keep = (x >= bbox[0]) & (x < bbox[2]) & (y >= bbox[1]) & (y < bbox[3])
    assert sorted(out["i"].tolist()) == np.flatnonzero(keep).tolist()


# --- geohash ----------------------------------------------------------------


def test_geohash_known_vector():
    # the classic public example: (lat 42.605, lon -5.603) -> "ezs42"
    from pygridmap_ray.hier import geohash_encode

    got = geohash_encode(np.array([-5.603]), np.array([42.605]), 6)
    assert got[0].startswith("ezs42")


def test_geohash_prefix_property_and_bruteforce():
    from pygridmap_ray.hier import GEOHASH_ALPHABET, geohash_encode

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 179.9, 300)
    lat = rng.uniform(-90, 89.9, 300)
    g8 = geohash_encode(lon, lat, 8)
    g4 = geohash_encode(lon, lat, 4)
    assert all(a[:4] == b for a, b in zip(g8, g4))

    # brute-force bit interleave for one point
    def brute(lo, la, nchars):
        half = 5 * nchars // 2
        qlo = int(np.floor((lo + 180.0) / 360.0 * (1 << half)))
        qla = int(np.floor((la + 90.0) / 180.0 * (1 << half)))
        bits = []
        for b in range(half - 1, -1, -1):
            bits.append((qlo >> b) & 1)
            bits.append((qla >> b) & 1)
        s = ""
        for j in range(nchars):
            v = 0
            for k in range(5):
                v = (v << 1) | bits[5 * j + k]
            s += GEOHASH_ALPHABET[v]
        return s

    for i in range(20):
        assert g8[i] == brute(lon[i], lat[i], 8), i


def test_geohash_validation():
    from pygridmap_ray.hier import geohash_encode

    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 5)  # odd
    with pytest.raises(ValueError):
        geohash_encode(np.array([200.0]), np.array([0.0]), 8)  # range


def test_with_geohash_stage(ray_session):
    import ray.data as rd

    from pygridmap_ray.hier import geohash_encode, with_geohash

    lon = np.linspace(-5, 24, 50)
    lat = np.linspace(38, 62, 50)
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat}))
    out = with_geohash(ds, nchars=6).to_pandas()
    assert (out["geohash"].to_numpy() == geohash_encode(lon, lat, 6)).all()
