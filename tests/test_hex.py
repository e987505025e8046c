"""H3-style hexagonal indexing — cube-round law, centers, density."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pygridmap_ray.hex import (
    _pack,
    _unpack,
    hex_axial,
    hex_center,
    hex_density,
    hex_neighbors,
    hex_rollup,
    with_hex_cells,
)

SIZE = 1000.0


def test_center_roundtrip():
    """The center of every cell assigns back to that cell."""
    rng = np.random.default_rng(11)
    q = rng.integers(-50, 51, 400)
    r = rng.integers(-50, 51, 400)
    cx, cy = hex_center(q, r, SIZE)
    q2, r2 = hex_axial(cx, cy, SIZE)
    assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_assignment_is_nearest_center():
    """Cube rounding == nearest-center (Voronoi) assignment: the chosen
    cell's center is at least as close as all six neighbours'."""
    rng = np.random.default_rng(12)
    x = rng.uniform(-20_000, 20_000, 2000)
    y = rng.uniform(-20_000, 20_000, 2000)
    q, r = hex_axial(x, y, SIZE)
    cx, cy = hex_center(q, r, SIZE)
    own = (x - cx) ** 2 + (y - cy) ** 2
    for dq, dr in hex_neighbors(0, 0):
        nx, ny = hex_center(q + dq, r + dr, SIZE)
        d = (x - nx) ** 2 + (y - ny) ** 2
        assert (own <= d + 1e-6).all()


def test_neighbors_equidistant():
    """All six neighbour centers sit exactly sqrt(3)*size away."""
    cx0, cy0 = hex_center(np.array([3]), np.array([-2]), SIZE)
    for nq, nr in hex_neighbors(3, -2):
        nx, ny = hex_center(np.array([nq]), np.array([nr]), SIZE)
        d = np.hypot(nx - cx0, ny - cy0)[0]
        assert abs(d - np.sqrt(3.0) * SIZE) < 1e-9


def test_pack_unpack_signed():
    rng = np.random.default_rng(13)
    q = rng.integers(-(1 << 30), 1 << 30, 1000)
    r = rng.integers(-(1 << 30), 1 << 30, 1000)
    q2, r2 = _unpack(_pack(q, r))
    assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_density_matches_numpy(ray_session):
    rng = np.random.default_rng(14)
    x = rng.uniform(0, 50_000, 3000)
    y = rng.uniform(0, 50_000, 3000)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(6)
    out = (
        hex_density(with_hex_cells(ds, size=SIZE), size=SIZE)
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )
    q, r = hex_axial(x, y, SIZE)
    key = _pack(q, r)
    u, c = np.unique(key, return_counts=True)
    uq, ur = _unpack(u)
    order = np.lexsort((ur, uq))
    uq, ur, c = uq[order], ur[order], c[order]
    assert np.array_equal(out["hq"].to_numpy(), uq)
    assert np.array_equal(out["hr"].to_numpy(), ur)
    assert np.array_equal(out["n_docs"].to_numpy(), c)
    assert int(out["n_docs"].sum()) == 3000


def test_rollup_matches_numpy(ray_session):
    rng = np.random.default_rng(15)
    x = rng.uniform(0, 30_000, 2000)
    y = rng.uniform(0, 30_000, 2000)
    w = rng.integers(0, 100, 2000)
    ds = rd.from_arrow(pa.table({"x": x, "y": y, "w": w})).repartition(5)
    out = (
        hex_rollup(with_hex_cells(ds, size=SIZE), sum_cols={"wsum": "w"})
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )
    key = _pack(*hex_axial(x, y, SIZE))
    u, inv = np.unique(key, return_inverse=True)
    uq, ur = _unpack(u)
    order = np.lexsort((ur, uq))
    assert np.array_equal(out["n_docs"].to_numpy(), np.bincount(inv)[order])
    assert np.array_equal(
        out["wsum"].to_numpy(),
        np.bincount(inv, weights=w).astype(np.int64)[order],
    )


def test_focal_matches_bruteforce(ray_session):
    from pygridmap_ray.hex import hex_focal

    rng = np.random.default_rng(16)
    x = rng.uniform(0, 20_000, 1500)
    y = rng.uniform(0, 20_000, 1500)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(4)
    out = (
        hex_focal(with_hex_cells(ds, size=SIZE), size=SIZE)
        .to_pandas()
        .set_index(["hq", "hr"])
        .sort_index()
    )
    q, r = hex_axial(x, y, SIZE)
    key = _pack(q, r)
    u, c = np.unique(key, return_counts=True)
    counts = dict(zip(u.tolist(), c.tolist()))
    for (hq, hr), row in out.iterrows():
        ring = [(hq, hr)] + hex_neighbors(hq, hr)
        expect = sum(counts.get(int(_pack(np.array([a]), np.array([b]))[0]), 0) for a, b in ring)
        assert row["focal_docs"] == expect
        assert row["n_docs"] == counts[int(_pack(np.array([hq]), np.array([hr]))[0])]
    assert len(out) == len(u)


def test_zscore_matches_numpy(ray_session):
    from pygridmap_ray.hex import hex_zscore

    rng = np.random.default_rng(17)
    x = rng.uniform(0, 40_000, 2500)
    y = rng.uniform(0, 40_000, 2500)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(5)
    out = (
        hex_zscore(with_hex_cells(ds, size=SIZE), size=SIZE)
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )
    key = _pack(*hex_axial(x, y, SIZE))
    u, c = np.unique(key, return_counts=True)
    k, s, ss = float(len(c)), float(c.sum()), float((c * c).sum())
    m = s / k
    denom = np.sqrt(ss / k - (s / k) * (s / k))
    zs = (c.astype(float) - m) / denom
    zs = np.sign(zs) * np.floor(np.abs(zs) * 1e6 + 0.5) / 1e6
    uq, ur = _unpack(u)
    order = np.lexsort((ur, uq))
    assert np.array_equal(out["n_docs"].to_numpy(), c[order])
    assert np.array_equal(out["z"].to_numpy(), zs[order])


def test_pyramid_levels_conserve_mass(ray_session):
    """Every pyramid level partitions the same points: per-level sums
    must all equal the input count."""
    from pygridmap_ray.pipelines.queries import q_hex_pyramid

    out = q_hex_pyramid("/root/testdata/sf0.001").to_pandas()
    sums = out.groupby("level")["n_docs"].sum()
    assert len(sums) == 3
    assert (sums == sums.iloc[0]).all()


def test_boundary_vertices_centered():
    """The 6 flat-top vertices average back to the hex center and sit at
    exactly the circumradius."""
    from pygridmap_ray.hex import hex_center

    size = 25_000.0
    q = np.array([3, -2, 0])
    r = np.array([-1, 4, 0])
    cx, cy = hex_center(q, r, size)
    ang = np.arange(6) * (np.pi / 3.0)
    vx = cx[:, None] + size * np.cos(ang)[None, :]
    vy = cy[:, None] + size * np.sin(ang)[None, :]
    assert np.allclose(vx.mean(axis=1), cx)
    assert np.allclose(vy.mean(axis=1), cy)
    d = np.hypot(vx - cx[:, None], vy - cy[:, None])
    assert np.allclose(d, size)


def test_hex_idw_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hex import (
        hex_axial,
        hex_center,
        hex_idw,
        kring_offsets,
    )

    rng = np.random.default_rng(11)
    n, size = 400, 10.0
    x = rng.uniform(0, 200, n)
    y = rng.uniform(0, 200, n)
    val = rng.uniform(1, 50, n)
    q, r = hex_axial(x, y, size)
    ds = rd.from_arrow(
        pa.table({"hq": q, "hr": r, "x": x, "y": y, "val": val})
    )
    out = (
        hex_idw(ds, size=size, k=1)
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )

    offs = kring_offsets(1)
    cells = sorted(set(zip(q.tolist(), r.tolist())))
    rows = []
    for cq, cr in cells:
        cx, cy = hex_center(np.array([cq]), np.array([cr]), size)
        swv = sw = 0.0
        for i in range(n):
            if (q[i] - cq, r[i] - cr) in [(-dq, -dr) for dq, dr in offs]:
                d2 = (x[i] - cx[0]) ** 2 + (y[i] - cy[0]) ** 2
                w = 1.0 / (d2 + 1.0)
                swv += w * val[i]
                sw += w
        rows.append((cq, cr, swv / sw))
    assert len(out) == len(rows)
    for (cq, cr, e), (_, got) in zip(rows, out.iterrows()):
        assert got["hq"] == cq and got["hr"] == cr
        assert abs(got["idw_val"] - e) < 1e-5, (cq, cr)


def test_hex_spatial_lag_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hex import hex_axial, hex_spatial_lag, kring_offsets

    rng = np.random.default_rng(5)
    n, size = 600, 10.0
    x = rng.uniform(0, 150, n)
    y = rng.uniform(0, 150, n)
    q, r = hex_axial(x, y, size)
    ds = rd.from_arrow(pa.table({"hq": q, "hr": r}))
    out = hex_spatial_lag(ds, size=size).to_pandas()

    from collections import Counter

    cnt = Counter(zip(q.tolist(), r.tolist()))
    neigh = [o for o in kring_offsets(1) if o != (0, 0)]
    xs, ys = [], []
    for (cq, cr), cn in cnt.items():
        lag = sum(cnt.get((cq + dq, cr + dr), 0) for dq, dr in neigh) / 6.0
        xs.append(lag)
        ys.append(float(cn))
    xs, ys = np.array(xs), np.array(ys)
    nn = float(len(xs))
    sx, sy = xs.sum(), ys.sum()
    cov = nn * (xs * ys).sum() - sx * sy
    varx = nn * (xs * xs).sum() - sx * sx
    vary = nn * (ys * ys).sum() - sy * sy
    b1 = cov / varx
    b0 = (sy - b1 * sx) / nn
    r2 = cov * cov / (varx * vary)
    row = out.iloc[0]
    assert row["n_cells"] == len(cnt)
    assert abs(row["beta1"] - b1) < 1e-5
    assert abs(row["beta0"] - b0) < 1e-5
    assert abs(row["r2"] - r2) < 1e-5
    assert 0.0 <= row["r2"] <= 1.0


def test_hex_lattice_stats_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hex import hex_lattice_stats

    # hand lattice: a filled 2-ring around origin (19 cells)
    from pygridmap_ray.hex import kring_offsets

    cells = kring_offsets(2)
    ds = rd.from_arrow(
        pa.table(
            {
                "hq": np.array([c[0] for c in cells], np.int64),
                "hr": np.array([c[1] for c in cells], np.int64),
            }
        )
    )
    out = hex_lattice_stats(ds, size=10.0).to_pandas().iloc[0]

    cyc = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
    cs = set(cells)
    edges = sum(
        1 for (q, r) in cs for dq, dr in cyc if (q + dq, r + dr) in cs
    ) // 2
    tris = (
        sum(
            1
            for (q, r) in cs
            for i in range(6)
            if (q + cyc[i][0], r + cyc[i][1]) in cs
            and (q + cyc[(i + 1) % 6][0], r + cyc[(i + 1) % 6][1]) in cs
        )
        // 3
    )
    assert out["n_cells"] == 19
    assert out["n_edges"] == edges
    assert out["n_triangles"] == tris

    # duplicate input rows must not change the profile
    ds2 = rd.from_arrow(
        pa.table(
            {
                "hq": np.array([c[0] for c in cells * 3], np.int64),
                "hr": np.array([c[1] for c in cells * 3], np.int64),
            }
        )
    )
    out2 = hex_lattice_stats(ds2, size=10.0).to_pandas().iloc[0]
    assert (out2 == out).all()


def test_hex_bfs_hand_lattice(ray_session):
    """BFS hop law on a hand lattice: a line of cells seeded at one end."""
    import ray.data as rd

    from pygridmap_ray.pipelines.queries import HEXB_MIN
    from pygridmap_ray.pipelines import queries as Q

    # emulate the query plumbing on a tiny in-memory lattice instead:
    # cells (0,0),(1,0),(2,0),(3,0) in a row plus isolated (10,10);
    # (0,0) holds HEXB_MIN docs -> seeds; hops should be 0,1,2,3 and
    # the isolated cell dropped.
    from pygridmap_ray.hex import _CYCLE, _pack, _unpack

    keys = np.sort(
        _pack(
            np.array([0, 1, 2, 3, 10], np.int64),
            np.array([0, 0, 0, 0, 10], np.int64),
        )
    )
    n_docs = np.where(keys == _pack(np.array([0]), np.array([0]))[0], HEXB_MIN, 1)
    dist = np.full(len(keys), -1, np.int64)
    frontier = np.flatnonzero(n_docs >= HEXB_MIN)
    dist[frontier] = 0
    q, r = _unpack(keys)
    hop = 0
    while len(frontier) and hop < 64:
        hop += 1
        nbr = np.concatenate(
            [_pack(q[frontier] + dq, r[frontier] + dr) for dq, dr in _CYCLE]
        )
        pos = np.clip(np.searchsorted(keys, nbr), 0, len(keys) - 1)
        hit = keys[pos] == nbr
        cand = np.unique(pos[hit])
        frontier = cand[dist[cand] < 0]
        dist[frontier] = hop
    got = {(qi, ri): d for qi, ri, d in zip(q, r, dist) if d >= 0}
    assert got == {(0, 0): 0, (1, 0): 1, (2, 0): 2, (3, 0): 3}


def test_general_g_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hex import general_g, hex_axial, kring_offsets

    rng = np.random.default_rng(9)
    n, size = 500, 10.0
    x = rng.uniform(0, 120, n)
    y = rng.uniform(0, 120, n)
    q, r = hex_axial(x, y, size)
    ds = rd.from_arrow(pa.table({"hq": q, "hr": r}))
    out = general_g(ds, size=size).to_pandas().iloc[0]

    from collections import Counter

    cnt = Counter(zip(q.tolist(), r.tolist()))
    neigh = [o for o in kring_offsets(1) if o != (0, 0)]
    num = w = 0
    for (cq, cr), ci in cnt.items():
        for dq, dr in neigh:
            cj = cnt.get((cq + dq, cr + dr))
            if cj is not None:
                num += ci * cj
                w += 1
    vals = np.array(list(cnt.values()), float)
    den = vals.sum() ** 2 - (vals * vals).sum()
    nn = len(cnt)
    assert out["n_cells"] == nn and out["w_sum"] == w
    assert abs(out["g"] - num / den) < 1e-5
    assert abs(out["e_g"] - w / (nn * (nn - 1))) < 1e-5


def test_hex_kde_bruteforce(ray_session):
    import ray.data as rd

    from pygridmap_ray.hex import hex_axial, hex_center, hex_kde, kring_offsets

    rng = np.random.default_rng(19)
    n, size, h = 300, 10.0, 10.0
    x = rng.uniform(0, 150, n)
    y = rng.uniform(0, 150, n)
    q, r = hex_axial(x, y, size)
    ds = rd.from_arrow(pa.table({"hq": q, "hr": r, "x": x, "y": y}))
    out = (
        hex_kde(ds, size=size, bandwidth=h, k=2)
        .to_pandas()
        .set_index(["hq", "hr"])
        .sort_index()
    )
    ring = set(kring_offsets(2))
    for (cq, cr), row in out.iterrows():
        cx, cy = hex_center(np.array([cq]), np.array([cr]), size)
        tot = 0.0
        for i in range(n):
            if (q[i] - cq, r[i] - cr) in {(-a, -b) for a, b in ring}:
                d2 = (x[i] - cx[0]) ** 2 + (y[i] - cy[0]) ** 2
                tot += np.exp(-d2 / (2 * h * h))
        assert abs(row["kde"] - tot) < 1e-5
    assert len(out) == len(set(zip(q.tolist(), r.tolist())))


def test_hex_gini_properties(ray_session):
    """Gini law: 0 for a uniform field; matches the pairwise-|diff|
    definition on a random field."""
    from pygridmap_ray.pipelines.queries import q_hex_gini

    out = q_hex_gini("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert 0.0 <= out["gini"] <= 1.0

    # closed-form rank law == mean-absolute-difference definition
    rng = np.random.default_rng(4)
    x = np.sort(rng.integers(1, 50, 200).astype(np.float64))
    n, tot = float(len(x)), float(x.sum())
    ranks = np.arange(1, len(x) + 1, dtype=np.float64)
    g_rank = 2.0 * float((ranks * x).sum()) / (n * tot) - (n + 1.0) / n
    g_mad = np.abs(x[:, None] - x[None, :]).sum() / (2.0 * n * tot)
    assert abs(g_rank - g_mad) < 1e-12


def test_correlogram_ring1_equals_morans_i(ray_session):
    """Correlogram at ring 1 must reproduce morans_i exactly (same law,
    annulus(1) == the 6 neighbors); rings partition: annuli are disjoint."""
    from pygridmap_ray.hex import (
        correlogram,
        hex_axial,
        kring_offsets,
        morans_i,
        ring_offsets,
        with_hex_cells,
    )

    rng = np.random.default_rng(21)
    x = rng.uniform(0, 60_000, 2500)
    y = rng.uniform(0, 60_000, 2500)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(5)
    hexed = with_hex_cells(ds, size=SIZE)
    cg = correlogram(hexed, size=SIZE, ks=(1, 2)).to_pandas()
    mi = morans_i(hexed, size=SIZE).to_pandas().iloc[0]
    r1 = cg[cg["ring"] == 1].iloc[0]
    assert r1["n_hexes"] == mi["n_hexes"]
    assert r1["w_pairs"] == mi["w_pairs"]
    assert r1["moran_i"] == mi["moran_i"]

    assert set(ring_offsets(1)) | set(ring_offsets(2)) | {(0, 0)} == set(
        kring_offsets(2)
    )
    assert not set(ring_offsets(1)) & set(ring_offsets(2))
    assert len(ring_offsets(3)) == 18


def test_hex_buffer_ring_bound_and_brute(ray_session):
    """Buffer cells == brute all-cells scan (the k-ring candidate bound
    misses nothing), and every buffered center is within R of a point."""
    import math

    from pygridmap_ray.hex import hex_axial, hex_center
    from pygridmap_ray.pipelines.queries import (
        BUFFER_R,
        HEX_SIZE,
        q_hex_buffer,
    )
    from pygridmap_ray.synth import derive_xy

    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    out = (
        q_hex_buffer(sf_dir)
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )
    df = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    x, y = derive_xy(df["doc_id"].to_numpy())
    # brute: scan a generous axial window around the occupied cells
    # (hex distance <= 5 > the query's k-ring bound of 2)
    pq, pr = hex_axial(x, y, HEX_SIZE)
    cells = []
    for cq in range(pq.min() - 5, pq.max() + 6):
        for cr in range(pr.min() - 5, pr.max() + 6):
            cx, cy = hex_center(np.array([cq]), np.array([cr]), HEX_SIZE)
            d2 = (x - cx[0]) ** 2 + (y - cy[0]) ** 2
            if (d2 <= BUFFER_R * BUFFER_R).any():
                cells.append((cq, cr))
    assert list(zip(out["hq"], out["hr"])) == sorted(cells)


def test_hex_erode_is_interior(ray_session):
    """Erosion == cells whose full 1-ring is occupied (brute set check
    on the real fixture)."""
    import duckdb

    from pygridmap_ray.hex import hex_axial, hex_neighbors
    from pygridmap_ray.pipelines.queries import HEXC_SIZE, q_hex_erode
    from pygridmap_ray.synth import derive_xy

    sf_dir = "/root/testdata/sf0.001"
    out = set(
        map(tuple, q_hex_erode(sf_dir).to_pandas()[["hq", "hr"]].to_numpy())
    )
    df = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    x, y = derive_xy(df["doc_id"].to_numpy())
    q, r = hex_axial(x, y, HEXC_SIZE)
    occ = set(zip(q.tolist(), r.tolist()))
    expect = {
        c for c in occ if all(n in occ for n in hex_neighbors(*c))
    }
    assert out == expect and len(expect) > 0


def test_join_counts_bruteforce(ray_session):
    import duckdb

    from pygridmap_ray.hex import hex_axial, kring_offsets
    from pygridmap_ray.pipelines.queries import (
        HEX_SIZE,
        JC_MIN_B,
        q_join_counts,
    )
    from pygridmap_ray.synth import derive_xy

    sf_dir = "/root/testdata/sf0.001"
    out = q_join_counts(sf_dir).to_pandas().iloc[0]
    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()["doc_id"].to_numpy()
    x, y = derive_xy(ids)
    q, r = hex_axial(x, y, HEX_SIZE)
    from collections import Counter

    cnt = Counter(zip(q.tolist(), r.tolist()))
    cls = {c: cnt[c] >= JC_MIN_B for c in cnt}
    neigh = [o for o in kring_offsets(1) if o != (0, 0)]
    bb = bw = ww = 0
    for (cq, cr), b in cls.items():
        for dq, dr in neigh:
            o = cls.get((cq + dq, cr + dr))
            if o is None:
                continue
            if b and o:
                bb += 1
            elif b != o:
                bw += 1
            else:
                ww += 1
    assert out["n_black"] == sum(cls.values())
    assert out["n_white"] == len(cls) - sum(cls.values())
    assert (out["bb"], out["bw"], out["ww"]) == (bb // 2, bw // 2, ww // 2)


def test_hex_entropy_bruteforce(ray_session):
    import duckdb

    from pygridmap_ray.hex import hex_axial
    from pygridmap_ray.pipelines.queries import HEX_SIZE, q_hex_entropy
    from pygridmap_ray.synth import derive_xy

    sf_dir = "/root/testdata/sf0.001"
    out = q_hex_entropy(sf_dir).to_pandas().iloc[0]
    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()["doc_id"].to_numpy()
    q, r = hex_axial(*derive_xy(ids), HEX_SIZE)
    _, c = np.unique(_pack(q, r), return_counts=True)
    p = c / c.sum()
    h = float(-(p * np.log(p)).sum())
    assert out["n_cells"] == len(c)
    assert abs(out["h"] - h) < 1e-5
    assert abs(out["evenness"] - h / np.log(len(c))) < 1e-5
    assert 0.0 < out["evenness"] <= 1.0
