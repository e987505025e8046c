"""Round-3 event-geo kernels: OD matrix, dwell runs — brute-force parity
on the real sf0.001 events table (partition-invariance via bucketed plans)."""

import duckdb
import numpy as np

from pygridmap_ray.hex import _pack, hex_axial
from pygridmap_ray.pipelines.relational import (
    events_hex_dwell,
    events_od_matrix,
)
from pygridmap_ray.synth import derive_xy

SIZE = 25_000.0


def _events(sf_dir):
    return duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).df()


def test_od_matrix_bruteforce(ray_session, sf_dir):
    out = (
        events_od_matrix(sf_dir, hex_size=SIZE)
        .to_pandas()
        .sort_values(["oq", "orr", "dq", "dr"])
        .reset_index(drop=True)
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    flows = {}
    for uid, g in ev.groupby("user_id", sort=True):
        fe = int(g["event_id"].iloc[0])
        le = int(g["event_id"].iloc[-1])
        ox, oy = derive_xy(np.array([fe]))
        dx, dy = derive_xy(np.array([le]))
        ok = tuple(int(v[0]) for v in hex_axial(ox, oy, SIZE))
        dk = tuple(int(v[0]) for v in hex_axial(dx, dy, SIZE))
        flows[(ok, dk)] = flows.get((ok, dk), 0) + 1
    assert len(out) == len(flows)
    for row in out.itertuples(index=False):
        assert flows[((row.oq, row.orr), (row.dq, row.dr))] == row.n_users


def test_hex_dwell_bruteforce(ray_session, sf_dir):
    out = (
        events_hex_dwell(sf_dir, hex_size=SIZE)
        .to_pandas()
        .set_index("user_id")["max_run"]
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    x, y = derive_xy(ev["event_id"].to_numpy(np.int64))
    ev = ev.assign(hkey=_pack(*hex_axial(x, y, SIZE)))
    for uid, g in ev.groupby("user_id", sort=True):
        k = g["hkey"].to_numpy()
        best = run = 1
        for i in range(1, len(k)):
            run = run + 1 if k[i] == k[i - 1] else 1
            best = max(best, run)
        assert out[uid] == best


def test_hex_cover_join_equals_broadcast_join(ray_session, sf_dir):
    """The hex-cover index strategy and the broadcast PIP kernel must
    produce the same (point, polygon) set."""
    import ray.data as rd
    import pyarrow as pa

    from pygridmap_ray.spatial import (
        join_points_to_polygons,
        join_points_via_hex_cover,
    )
    from pygridmap_ray.synth import polygon_layer

    rng = np.random.default_rng(41)
    n = 3000
    x = rng.uniform(0, 500_000, n)
    y = rng.uniform(0, 501_000, n)
    ds = rd.from_arrow(
        pa.table({"i": np.arange(n), "x": x, "y": y})
    ).repartition(5)
    via_cover = (
        join_points_via_hex_cover(
            ds, polygon_layer(), hex_size=25_000.0,
            q_range=(-2, 16), r_range=(-16, 32),
        )
        .to_pandas()[["i", "poly_id"]]
        .sort_values(["i", "poly_id"])
        .reset_index(drop=True)
    )
    via_bcast = (
        join_points_to_polygons(ds, polygon_layer(), how="inner", attr_cols=())
        .to_pandas()[["i", "poly_id"]]
        .sort_values(["i", "poly_id"])
        .reset_index(drop=True)
    )
    assert via_cover.equals(via_bcast)


def test_mann_kendall_bruteforce(ray_session, sf_dir):
    """Engine MK statistic == an O(L^2) reference loop per hex."""
    from collections import defaultdict

    from pygridmap_ray.pipelines.relational import events_hex_mann_kendall

    out = (
        events_hex_mann_kendall(sf_dir, hex_size=SIZE)
        .to_pandas()
        .sort_values(["hq", "hr"])
        .reset_index(drop=True)
    )

    df = _events(sf_dir)
    week = df["us"].to_numpy() // (7 * 86_400_000_000)
    x, y = derive_xy(df["event_id"].to_numpy())
    q, r = hex_axial(x, y, SIZE)
    series = defaultdict(lambda: defaultdict(int))
    for qi, ri, wi in zip(q, r, week):
        series[(qi, ri)][wi] += 1
    rows = []
    for (qi, ri), wk in series.items():
        ws = sorted(wk)
        n = [wk[w] for w in ws]
        L = len(n)
        if L < 2:
            continue
        s = sum(
            (n[j] > n[i]) - (n[j] < n[i])
            for i in range(L)
            for j in range(i + 1, L)
        )
        from collections import Counter

        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(n).values()
        )
        var = (L * (L - 1) * (2 * L + 5) - tt) / 18.0
        if var <= 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / np.sqrt(var)
        elif s < 0:
            z = (s + 1) / np.sqrt(var)
        else:
            z = 0.0
        rows.append((qi, ri, L, s, z))
    rows.sort()
    assert len(out) == len(rows)
    for (qi, ri, L, s, z), (_, got) in zip(rows, out.iterrows()):
        assert (got["hq"], got["hr"], got["n_weeks"], got["s"]) == (qi, ri, L, s)
        assert abs(got["z"] - z) < 1e-5


def test_od_gravity_bruteforce(ray_session, sf_dir):
    """Gravity fit == a brute per-user first/last + OLS reference."""
    from collections import Counter

    from pygridmap_ray.hex import hex_center
    from pygridmap_ray.pipelines.relational import events_od_gravity

    out = events_od_gravity(sf_dir, hex_size=SIZE).to_pandas().iloc[0]

    df = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    first = df.groupby("user_id").first()
    last = df.groupby("user_id").last()
    fx, fy = derive_xy(first["event_id"].to_numpy())
    lx, ly = derive_xy(last["event_id"].to_numpy())
    ok = _pack(*hex_axial(fx, fy, SIZE))
    dk = _pack(*hex_axial(lx, ly, SIZE))
    flows = Counter(zip(ok.tolist(), dk.tolist()))
    xs, ys = [], []
    from pygridmap_ray.hex import _unpack

    for (o, d), n in flows.items():
        if o == d:
            continue
        oq, orr = _unpack(np.array([o]))
        dq, dr = _unpack(np.array([d]))
        cox, coy = hex_center(oq, orr, SIZE)
        cdx, cdy = hex_center(dq, dr, SIZE)
        dist = np.sqrt((cox - cdx) ** 2 + (coy - cdy) ** 2)[0]
        xs.append(np.log(dist))
        ys.append(np.log(float(n)))
    xs, ys = np.array(xs), np.array(ys)
    nn = float(len(xs))
    sx, sy = xs.sum(), ys.sum()
    cov = nn * (xs * ys).sum() - sx * sy
    varx = nn * (xs * xs).sum() - sx * sx
    vary = nn * (ys * ys).sum() - sy * sy
    if nn < 2 or varx == 0.0 or vary == 0.0:
        alpha = beta = r2 = 0.0
    else:
        beta = cov / varx
        alpha = (sy - beta * sx) / nn
        r2 = cov * cov / (varx * vary)
    assert out["n_pairs"] == len(xs)
    assert abs(out["beta"] - beta) < 1e-5
    assert abs(out["alpha"] - alpha) < 1e-5
    assert abs(out["r2"] - r2) < 1e-5


def test_home_work_bruteforce(ray_session, sf_dir):
    from collections import Counter, defaultdict

    from pygridmap_ray.pipelines.relational import events_home_work

    out = (
        events_home_work(sf_dir, hex_size=SIZE)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    df = _events(sf_dir)
    hour = (df["us"].to_numpy() // 3_600_000_000) % 24
    x, y = derive_xy(df["event_id"].to_numpy())
    q, r = hex_axial(x, y, SIZE)
    uid = df["user_id"].to_numpy()
    night = defaultdict(Counter)
    day = defaultdict(Counter)
    for u, h, qi, ri in zip(uid, hour, q, r):
        if h < 6 or h >= 22:
            night[u][(qi, ri)] += 1
        if 9 <= h < 17:
            day[u][(qi, ri)] += 1

    def best(cnt):
        return min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))

    rows = []
    for u in sorted(set(night) & set(day)):
        (hq_, hr_), hc = best(night[u])
        (wq_, wr_), wc = best(day[u])
        rows.append((u, hq_, hr_, hc, wq_, wr_, wc))
    assert len(out) == len(rows)
    got = list(
        zip(
            out["user_id"], out["home_q"], out["home_r"], out["n_home"],
            out["work_q"], out["work_r"], out["n_work"],
        )
    )
    assert got == rows


def test_ripley_k_bruteforce(ray_session):
    """Ghost-cell pair counting == the O(n^2) direct count, including
    pairs that straddle cell boundaries."""
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.spatial import ripley_k

    rng = np.random.default_rng(23)
    n = 400
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(0, 1000, n)
    ds = rd.from_arrow(
        pa.table({"doc_id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    ).repartition(5)
    radii = [50.0, 120.0, 300.0]
    out = (
        ripley_k(ds, radii=radii, area=1000.0 * 1000.0)
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    for i, r in enumerate(radii):
        cnt = int((d2 <= r * r).sum())
        assert out.loc[i, "n_pairs"] == cnt
        assert abs(out.loc[i, "k"] - 1e6 * cnt / (n * n)) < 1e-5


def test_events_coloc_bruteforce(ray_session, tmp_path):
    """Brute parity on a synthetic events table dense enough to meet."""
    from collections import Counter, defaultdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import events_coloc

    rng = np.random.default_rng(31)
    n = 4000
    eid = rng.integers(1, 300, n)  # few distinct event points -> shared cells
    uid = rng.integers(1, 40, n)
    us = rng.integers(0, 48, n) * 3_600_000_000 + rng.integers(0, 3_600_000_000, n)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = (
        events_coloc(str(tmp_path), hex_size=SIZE, min_meets=2)
        .to_pandas()
        .sort_values(["user_a", "user_b"])
        .reset_index(drop=True)
    )

    x, y = derive_xy(eid)
    q, r = hex_axial(x, y, SIZE)
    hb = us // 3_600_000_000
    slot_users = defaultdict(set)
    for qi, ri, hi, ui in zip(q, r, hb, uid):
        slot_users[(qi, ri, hi)].add(ui)
    meets = Counter()
    for users in slot_users.values():
        us_ = sorted(users)
        for i in range(len(us_)):
            for j in range(i + 1, len(us_)):
                meets[(us_[i], us_[j])] += 1
    rows = sorted((a, b, m) for (a, b), m in meets.items() if m >= 2)
    assert len(rows) > 0
    got = list(zip(out["user_a"], out["user_b"], out["n_meets"]))
    assert got == rows


def test_clark_evans_bruteforce(ray_session, sf_dir):
    from pygridmap_ray.pipelines.queries import RIPLEY_AREA, q_clark_evans

    out = q_clark_evans(sf_dir).to_pandas().iloc[0]

    import duckdb

    df = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    x, y = derive_xy(df["doc_id"].to_numpy())
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d = np.sqrt(dx * dx + dy * dy)
    np.fill_diagonal(d, np.inf)
    nnd = d.min(axis=1)
    n = float(len(nnd))
    mean = nnd.sum() / n
    rho = n / RIPLEY_AREA
    expect = 0.5 / np.sqrt(rho)
    assert out["n"] == len(nnd)
    assert abs(out["mean_nn"] - mean) < 1e-4
    assert abs(out["r_index"] - mean / expect) < 1e-5
    assert abs(
        out["z"] - (mean - expect) / (0.26136 / np.sqrt(n * rho))
    ) < 1e-4


def test_quadrat_test_bruteforce(ray_session, sf_dir):
    from pygridmap_ray.pipelines.queries import q_quadrat_test

    out = q_quadrat_test(sf_dir).to_pandas().iloc[0]

    import duckdb

    df = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    x, y = derive_xy(df["doc_id"].to_numpy())
    ix = np.minimum((x / 50_000.0).astype(int), 9)
    iy = np.minimum((y / 50_100.0).astype(int), 9)
    obs = np.bincount(iy * 10 + ix, minlength=100).astype(float)
    n = obs.sum()
    exp = n / 100.0
    chi2 = (((obs - exp) ** 2) / exp).sum()
    assert out["n"] == int(n) and out["df"] == 99
    assert abs(out["chi2"] - chi2) < 1e-4
    # the synthetic field is clustered by construction
    assert out["chi2"] > 99


def test_variogram_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.spatial import variogram

    rng = np.random.default_rng(29)
    n = 300
    x = rng.uniform(0, 800, n)
    y = rng.uniform(0, 800, n)
    v = rng.uniform(0, 10, n)
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": np.arange(n, dtype=np.int64), "x": x, "y": y, "val": v}
        )
    ).repartition(4)
    bins = [(0.0, 60.0), (60.0, 150.0), (150.0, 400.0)]
    out = (
        variogram(ds, bins=bins)
        .to_pandas()
        .sort_values("bin_lo")
        .reset_index(drop=True)
    )
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    dz2 = (v[:, None] - v[None, :]) ** 2
    neq = ~np.eye(n, dtype=bool)
    for i, (lo, hi) in enumerate(bins):
        m = (d2 >= lo * lo) & (d2 < hi * hi) & neq
        cnt = int(m.sum())
        assert out.loc[i, "n_pairs"] == cnt
        if cnt:
            assert abs(out.loc[i, "gamma"] - dz2[m].sum() / (2 * cnt)) < 1e-5


def test_variogram_directional_partitions_pairs(ray_session):
    """The four sectors of each bin partition exactly the omnidirectional
    pair count, and sector assignment matches the comparison law."""
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.spatial import variogram

    rng = np.random.default_rng(33)
    n = 250
    x = rng.uniform(0, 700, n)
    y = rng.uniform(0, 700, n)
    v = rng.uniform(0, 5, n)
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": np.arange(n, dtype=np.int64), "x": x, "y": y, "val": v}
        )
    )
    bins = [(0.0, 100.0), (100.0, 350.0)]
    omni = variogram(ds, bins=bins).to_pandas().set_index("bin_lo")
    direc = variogram(ds, bins=bins, directional=True).to_pandas()
    per_bin = direc.groupby("bin_lo")["n_pairs"].sum()
    for lo, _ in bins:
        assert per_bin[lo] == omni.loc[lo, "n_pairs"]
    assert set(direc["sector"].unique()) <= {0, 1, 2, 3}


def test_std_ellipse_and_knn_r2_bruteforce(ray_session, sf_dir):
    import duckdb

    from pygridmap_ray.pipelines.queries import q_knn_loo_r2, q_std_ellipse

    df = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    x, y = derive_xy(df["doc_id"].to_numpy())

    ell = q_std_ellipse(sf_dir).to_pandas().iloc[0]
    mx, my = x.mean(), y.mean()
    cxx, cyy = x.var(), y.var()
    cxy = ((x - mx) * (y - my)).mean()
    assert abs(ell["mean_x"] - mx) < 1e-3
    assert abs(ell["std_dist"] - np.sqrt(cxx + cyy)) < 1e-3
    half = np.sqrt(((cxx - cyy) / 2) ** 2 + cxy**2)
    assert abs(ell["sigma_major"] - np.sqrt((cxx + cyy) / 2 + half)) < 1e-3
    assert ell["sigma_major"] >= ell["sigma_minor"] > 0

    r2row = q_knn_loo_r2(sf_dir).to_pandas().iloc[0]
    v = df["n_chars"].to_numpy(float)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    ids = df["doc_id"].to_numpy()
    preds = np.empty(len(v))
    for i in range(len(v)):
        order = np.lexsort((ids, d2[i]))[:4]
        preds[i] = v[order].sum() / 4.0
    sse = ((v - preds) ** 2).sum()
    sst = (v**2).sum() - v.sum() ** 2 / len(v)
    assert r2row["n"] == len(v)
    assert abs(r2row["r2"] - (1.0 - sse / sst)) < 1e-4


def test_od_paths_connectivity(ray_session, sf_dir):
    """Path laws: seq 0 is the origin cell, seq n the destination cell,
    consecutive path cells are lattice-adjacent or equal, and the step
    count is the hex distance."""
    from pygridmap_ray.hex import hex_neighbors
    from pygridmap_ray.pipelines.relational import events_od_paths

    out = (
        events_od_paths(sf_dir, hex_size=SIZE)
        .to_pandas()
        .sort_values(["user_id", "seq"])
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    for uid, g in out.groupby("user_id"):
        cells = list(zip(g["hq"], g["hr"]))
        ge = ev[ev["user_id"] == uid]
        fx, fy = derive_xy(np.array([ge["event_id"].iloc[0]]))
        lx, ly = derive_xy(np.array([ge["event_id"].iloc[-1]]))
        o = tuple(int(v[0]) for v in hex_axial(fx, fy, SIZE))
        d = tuple(int(v[0]) for v in hex_axial(lx, ly, SIZE))
        assert cells[0] == o and cells[-1] == d
        dq, dr = d[0] - o[0], d[1] - o[1]
        assert len(cells) == (abs(dq) + abs(dr) + abs(dq + dr)) // 2 + 1
        for a, b in zip(cells, cells[1:]):
            assert b == a or b in hex_neighbors(*a), (uid, a, b)


def test_speed_outliers_bruteforce(ray_session, sf_dir):
    from pygridmap_ray.pipelines.relational import events_speed_outliers

    out = (
        events_speed_outliers(sf_dir)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    x, y = derive_xy(ev["event_id"].to_numpy())
    ev = ev.assign(x=x, y=y)
    for uid, g in ev.groupby("user_id", sort=True):
        us = g["us"].to_numpy()
        xs = g["x"].to_numpy()
        ys = g["y"].to_numpy()
        if len(us) < 2:
            assert uid not in out.index
            continue
        n = len(us) - 1
        flags = 0
        speeds = []
        for i in range(n):
            dt = us[i + 1] - us[i]
            dist = np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])
            if dt <= 0 or dist / (dt / 1e6) > 30.0:
                flags += 1
            else:
                speeds.append(dist / (dt / 1e6))
        row = out.loc[uid]
        assert row["n_steps"] == n and row["n_flagged"] == flags
        exp = float(np.mean(speeds)) if speeds else 0.0
        assert abs(row["mean_speed"] - exp) < 1e-5


def test_colocation_quotient_bruteforce(ray_session, sf_dir):
    import duckdb
    from collections import Counter

    from pygridmap_ray.pipelines.queries import q_colocation_quotient

    out = (
        q_colocation_quotient(sf_dir)
        .to_pandas()
        .sort_values(["lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    df = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{sf_dir}/documents.parquet')"
        f" ORDER BY doc_id"
    ).df()
    ids = df["doc_id"].to_numpy()
    langs = df["lang"].to_numpy()
    x, y = derive_xy(ids)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    best = np.lexsort((np.broadcast_to(ids, d2.shape), d2), axis=1)[:, 0]
    cab = Counter(zip(langs, langs[best]))
    nl = Counter(langs)
    n = len(ids)
    rows = []
    for (la, lb), c in sorted(cab.items()):
        nb = nl[lb] - 1 if la == lb else nl[lb]
        rows.append((la, lb, c, (c / nl[la]) / (nb / (n - 1))))
    assert len(out) == len(rows)
    for (la, lb, c, clq), (_, got) in zip(rows, out.iterrows()):
        assert (got["lang_a"], got["lang_b"], got["c_ab"]) == (la, lb, c)
        assert abs(got["clq"] - clq) < 1e-5


def test_g_function_monotone_and_brute(ray_session, sf_dir):
    import duckdb

    from pygridmap_ray.pipelines.queries import GFUNC_RADII, q_g_function

    out = (
        q_g_function(sf_dir)
        .to_pandas()
        .sort_values("r")
        .reset_index(drop=True)
    )
    assert (np.diff(out["g"]) >= 0).all()
    assert out["g"].between(0, 1).all()

    ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()["doc_id"].to_numpy()
    x, y = derive_xy(ids)
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    nn = np.sqrt(d2.min(axis=1))
    for i, r in enumerate(GFUNC_RADII):
        assert out.loc[i, "n_within"] == int((nn <= r).sum())
