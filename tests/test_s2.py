"""S2-style sphere cells — face table, quadratic ST, Morton position."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.s2 import (
    face_uv,
    s2_encode,
    s2_parent,
    sql_s2_cte,
    uv_to_st,
    with_s2_cells,
)
from pygridmap_ray.synth import derive_xyz, sql_xyz_cte


def test_face_table_axis_points():
    # points straight down each axis land on the canonical face with u=v=0
    px = np.array([1.0, 0.0, 0.0, -1.0, 0.0, 0.0])
    py = np.array([0.0, 1.0, 0.0, 0.0, -1.0, 0.0])
    pz = np.array([0.0, 0.0, 1.0, 0.0, 0.0, -1.0])
    face, u, v = face_uv(px, py, pz)
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    assert np.allclose(u, 0) and np.allclose(v, 0)


def test_face_uv_in_range_and_scale_invariant():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(3, 500))
    face, u, v = face_uv(*p)
    assert ((face >= 0) & (face <= 5)).all()
    assert (np.abs(u) <= 1.0 + 1e-12).all() and (np.abs(v) <= 1.0 + 1e-12).all()
    f2, u2, v2 = face_uv(*(p * 7.5))
    assert (face == f2).all()
    assert np.allclose(u, u2) and np.allclose(v, v2)


def test_uv_to_st_endpoints_and_monotone():
    u = np.linspace(-1, 1, 101)
    s = uv_to_st(u)
    assert s[0] == 0.0 and s[-1] == 1.0 and abs(s[50] - 0.5) < 1e-15
    assert (np.diff(s) > 0).all()


def test_parent_is_coarser_encode():
    did = np.arange(1, 5001)
    px, py, pz = derive_xyz(did)
    _, _, _, c12 = s2_encode(px, py, pz, 12)
    _, _, _, c7 = s2_encode(px, py, pz, 7)
    assert (s2_parent(c12, 5) == c7).all()


def test_level_validation():
    one = np.array([1.0])
    with pytest.raises(ValueError):
        s2_encode(one, one, one, 0)
    with pytest.raises(ValueError):
        s2_encode(one, one, one, 30)


def test_sql_twin_bit_identical():
    did = np.arange(1, 20001)
    face, si, ti, cell = s2_encode(*derive_xyz(did), 12)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM range(1, 20001) t(doc_id)")
    df = con.sql(
        f"WITH xyz AS ({sql_xyz_cte()}), {sql_s2_cte(12)} "
        f"SELECT face, si, ti, s2_cell FROM s2 ORDER BY doc_id"
    ).df()
    assert (df["face"].to_numpy() == face).all()
    assert (df["si"].to_numpy() == si).all()
    assert (df["ti"].to_numpy() == ti).all()
    assert (df["s2_cell"].to_numpy() == cell).all()


def test_with_s2_cells_stage(ray_session):
    import ray.data as rd

    did = np.arange(1, 301)
    px, py, pz = derive_xyz(did)
    ds = rd.from_arrow(pa.table({"px": px, "py": py, "pz": pz}))
    out = with_s2_cells(ds, level=10).to_pandas()
    _, _, _, cell = s2_encode(px, py, pz, 10)
    assert (np.sort(out["s2_cell"].to_numpy()) == np.sort(cell)).all()


def test_s2_range_cover_is_exact():
    """Full-depth cover of an integer (si, ti) box == the box predicate
    on every cell id in range."""
    from pygridmap_ray.hier import morton_encode, zrange_cover

    a, b, c, d = 5, 20, 9, 17
    level = 6
    ranges = zrange_cover(
        (float(a), float(c), b + 0.5, d + 0.5), resolution=1.0, level=level
    )
    covered = set()
    for lo, hi in ranges:
        covered.update(range(int(lo), int(hi) + 1))
    expect = set()
    for si in range(a, b + 1):
        for ti in range(c, d + 1):
            expect.add(
                int(morton_encode(np.array([si]), np.array([ti]), level)[0])
            )
    assert covered == expect


def test_sphere_nn_bruteforce(ray_session):
    """Engine sphere-NN == brute argmax over normalized dots."""
    from pygridmap_ray.pipelines.queries import q_sphere_nn

    sf_dir = "/root/testdata/sf0.001"
    out = (
        q_sphere_nn(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import duckdb

    ids = np.sort(
        duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
        ).df()["doc_id"].to_numpy()
    )
    px, py, pz = derive_xyz(ids)
    m = np.stack([px, py, pz], axis=1)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    dots = m @ m.T
    np.fill_diagonal(dots, -np.inf)
    best = np.argmax(dots, axis=1)
    assert (out["doc_id"].to_numpy() == ids).all()
    assert (out["nn_id"].to_numpy() == ids[best]).all()
    got_dot = out["dot"].to_numpy()
    assert np.allclose(got_dot, dots[np.arange(len(ids)), best], atol=1e-5)
    # symmetry sanity: the mutual-NN relation is non-empty
    nn_map = dict(zip(out["doc_id"], out["nn_id"]))
    assert any(nn_map.get(v) == k for k, v in nn_map.items())


def test_mutual_nn_subset_and_symmetric(ray_session):
    """Mutual pairs are exactly the symmetric subset of the NN relation."""
    from pygridmap_ray.pipelines.queries import q_mutual_nn, q_sphere_nn

    sf_dir = "/root/testdata/sf0.001"
    nn = q_sphere_nn(sf_dir).to_pandas()
    rel = dict(zip(nn["doc_id"], nn["nn_id"]))
    expect = sorted(
        (a, b) for a, b in rel.items() if a < b and rel.get(b) == a
    )
    mut = (
        q_mutual_nn(sf_dir)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert list(zip(mut["doc_a"], mut["doc_b"])) == expect
    assert (mut["dot"] <= 1.0).all()
