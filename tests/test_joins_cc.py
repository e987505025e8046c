"""asof_join / interval_join (joins.py) and connected-components
clustering (dedup.py) — semantics beyond what the sf0.01 oracles cover:
forward direction, empty sides, direct-key grouping, interval overlap
guard, chain-graph transitivity vs a driver union-find ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pygridmap_ray.joins import _IntervalKernel, asof_join, interval_join


def _mk(table):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(us_list):
    return pa.array(np.asarray(us_list, dtype="int64")).cast(pa.timestamp("us"))


def test_asof_backward_and_forward(ray_session):
    left = _mk({"ts": _ts([100, 200, 300]), "user_id": [1, 1, 1], "v": [1.0, 2.0, 3.0]})
    right = _mk({"ts": _ts([150, 250]), "user_id": [1, 1], "w": [10.0, 20.0]})
    back = (
        asof_join(left, right, on="ts", by="user_id")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert back["w_r"].tolist()[0] != back["w_r"].tolist()[0]  # NaN: no prior
    assert back["w_r"].tolist()[1:] == [10.0, 20.0]
    fwd = (
        asof_join(left, right, on="ts", by="user_id", direction="forward")
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert fwd["w_r"].tolist()[:2] == [10.0, 20.0]
    assert fwd["w_r"].isna().tolist() == [False, False, True]


def test_asof_exact_match_and_missing_key(ray_session):
    left = _mk({"ts": _ts([100, 100]), "user_id": [1, 2], "v": [1.0, 2.0]})
    right = _mk({"ts": _ts([100]), "user_id": [1], "w": [5.0]})
    out = (
        asof_join(left, right, on="ts", by="user_id")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # equality counts as "at or before" (DuckDB ASOF >= semantics)
    assert out["w_r"].tolist()[0] == 5.0
    assert out["w_r"].isna().tolist() == [False, True]
    # int columns survive null-extension without float promotion
    assert out["user_id"].dtype == np.int64


def test_asof_direct_key_grouping(ray_session):
    left = _mk({"ts": _ts([10, 20]), "user_id": [7, 8], "v": [1.0, 2.0]})
    right = _mk({"ts": _ts([5, 15]), "user_id": [7, 8], "w": [1.5, 2.5]})
    out = (
        asof_join(left, right, on="ts", by="user_id", num_buckets=None)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["w_r"].tolist() == [1.5, 2.5]


def test_interval_join_left_and_inner(ray_session):
    iv = {
        "key": np.array([1, 1], dtype=np.int64),
        "start": np.array([100, 300], dtype=np.int64),
        "end": np.array([200, 400], dtype=np.int64),
        "iv_id": np.array([0, 1], dtype=np.int64),
    }
    pts = _mk({"ts": _ts([150, 250, 350, 50]), "user_id": [1, 1, 1, 2], "p": [1, 2, 3, 4]})
    inner = interval_join(pts, iv, how="inner").to_pandas().sort_values("p")
    assert inner["p"].tolist() == [1, 3]
    assert inner["iv_id"].tolist() == [0, 1]
    left = interval_join(pts, iv, how="left").to_pandas().sort_values("p")
    assert left["p"].tolist() == [1, 2, 3, 4]
    assert left["iv_id"].isna().tolist() == [False, True, False, True]
    # half-open: end boundary excluded, start included
    edge = _mk({"ts": _ts([100, 200]), "user_id": [1, 1], "p": [1, 2]})
    e = interval_join(edge, iv, how="inner").to_pandas()
    assert e["p"].tolist() == [1]


def test_interval_overlap_rejected():
    iv = {
        "key": np.array([1, 1], dtype=np.int64),
        "start": np.array([100, 150], dtype=np.int64),
        "end": np.array([200, 250], dtype=np.int64),
    }
    with pytest.raises(ValueError, match="overlap"):
        _IntervalKernel(iv, "ts", "user_id", "left")


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [0])
def test_connected_components_vs_union_find(ray_session, seed):
    from pygridmap_ray.dedup import connected_components

    rng = np.random.default_rng(seed)
    # a long chain (worst-case diameter for label propagation) + random
    # extra edges + disjoint singleton pairs
    chain = [(i, i + 1) for i in range(0, 30)]
    rand = [tuple(sorted(e)) for e in rng.integers(100, 140, size=(25, 2)) if e[0] != e[1]]
    far = [(1000, 2000), (3000, 4000)]
    edges = chain + rand + far
    ds = _mk(
        {
            "id_a": np.array([a for a, _ in edges], dtype=np.int64),
            "id_b": np.array([b for _, b in edges], dtype=np.int64),
        }
    )
    got = (
        connected_components(ds, max_iter=50, num_partitions=4)
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    # min-reachable ground truth: union-find labels then min per root
    uf = _union_find(edges)
    roots = {}
    for node, r in uf.items():
        roots.setdefault(r, []).append(node)
    expect = {n: min(mem) for r, mem in roots.items() for n in mem}
    assert got == expect


def test_neardup_dedup_keeps_min_per_component(ray_session):
    from pygridmap_ray.dedup import neardup_dedup

    docs = _mk({"doc_id": np.arange(10, dtype=np.int64)})
    pairs = _mk(
        {
            "id_a": np.array([0, 1, 5], dtype=np.int64),
            "id_b": np.array([1, 2, 6], dtype=np.int64),
        }
    )
    kept = sorted(neardup_dedup(docs, pairs, num_partitions=4).to_pandas()["doc_id"].tolist())
    # {0,1,2} -> 0, {5,6} -> 5, singletons 3,4,7,8,9 survive
    assert kept == [0, 3, 4, 5, 7, 8, 9]


def test_asof_hot_key(ray_session):
    """A single hot key (one user owning all rows) degrades to that key's
    volume, not to failure: 20k left rows + 5k right rows in ONE bucket
    resolve through the single vectorized merge_asof."""
    rng = np.random.default_rng(11)
    l_ts = np.sort(rng.integers(0, 10_000_000, size=20_000))
    r_ts = np.sort(rng.integers(0, 10_000_000, size=5_000))
    left = _mk(
        {
            "ts": _ts(l_ts),
            "user_id": np.zeros(20_000, dtype=np.int64),
            "v": np.arange(20_000, dtype=np.float64),
        }
    )
    right = _mk(
        {
            "ts": _ts(r_ts),
            "user_id": np.zeros(5_000, dtype=np.int64),
            "w": np.arange(5_000, dtype=np.float64),
        }
    )
    out = asof_join(left, right, on="ts", by="user_id").to_pandas()
    assert len(out) == 20_000
    # ground truth by searchsorted: last right ts <= left ts
    idx = np.searchsorted(r_ts, l_ts, side="right") - 1
    exp = np.where(idx >= 0, idx.astype(float), np.nan)
    got = out.sort_values("v")["w_r"].to_numpy()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    np.testing.assert_array_equal(got[~np.isnan(got)], exp[~np.isnan(exp)])


def test_null_order_keys(ray_session):
    """Null timestamps never match: asof keeps them with null right
    columns, interval inner drops them, interval left nulls the payload."""
    left = _mk(
        {
            "ts": pa.array([100, None, 300], pa.timestamp("us")),
            "user_id": [1, 1, 1],
            "v": [1.0, 2.0, 3.0],
        }
    )
    right = _mk({"ts": _ts([50]), "user_id": [1], "w": [9.0]})
    out = asof_join(left, right, on="ts", by="user_id").to_pandas()
    assert len(out) == 3
    byv = out.set_index("v")
    assert byv.loc[1.0, "w_r"] == 9.0 and byv.loc[3.0, "w_r"] == 9.0
    assert pd.isna(byv.loc[2.0, "w_r"]) and pd.isna(byv.loc[2.0, "ts_r"])

    iv = {
        "key": np.array([1], dtype=np.int64),
        "start": np.array([0], dtype=np.int64),
        "end": np.array([1000], dtype=np.int64),
        "iv_id": np.array([7], dtype=np.int64),
    }
    inner = interval_join(left, iv, how="inner", by="user_id", on="ts").to_pandas()
    assert sorted(inner["v"]) == [1.0, 3.0]
    lj = interval_join(left, iv, how="left", by="user_id", on="ts").to_pandas()
    assert len(lj) == 3
    assert pd.isna(lj.set_index("v").loc[2.0, "iv_id"])


def test_interval_join_actor_pool_parity(ray_session):
    """concurrency= (actor pool) and the default stateless-task path
    produce identical rows."""
    rng = np.random.default_rng(5)
    pts = _mk(
        {
            "ts": _ts(rng.integers(0, 1000, size=300)),
            "user_id": rng.integers(0, 5, size=300).astype(np.int64),
            "p": np.arange(300, dtype=np.int64),
        }
    )
    iv = {
        "key": np.arange(5, dtype=np.int64),
        "start": np.full(5, 100, dtype=np.int64),
        "end": np.full(5, 600, dtype=np.int64),
        "iv_id": np.arange(5, dtype=np.int64),
    }
    a = interval_join(pts, iv, how="inner").to_pandas().sort_values("p").reset_index(drop=True)
    b = (
        interval_join(pts, iv, how="inner", concurrency=2)
        .to_pandas()
        .sort_values("p")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_nearest_polygon_actor_pool_parity(ray_session):
    from pygridmap_ray.spatial import nearest_polygon_join
    from pygridmap_ray.synth import polygon_layer

    rng = np.random.default_rng(9)
    pts = _mk(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "x": rng.uniform(-1e5, 6e5, 200),
            "y": rng.uniform(-1e5, 6e5, 200),
        }
    )
    layer = polygon_layer()
    a = (
        nearest_polygon_join(pts, layer)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        nearest_polygon_join(pts, layer, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # interior points have distance exactly 0 and match the PIP join
    inside = a[a["dist"] == 0.0]
    assert len(inside) > 0


def test_lookup_join_inner_left_and_dup_key(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pygridmap_ray.joins import lookup_join

    dim = pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    facts = rd.from_arrow(
        pa.table({"fk": [3, 1, 9, 2, 1], "v": [10, 20, 30, 40, 50]})
    ).repartition(2)

    inner = lookup_join(facts, dim, on="fk", key="k").to_pandas()
    inner = inner.sort_values("v").reset_index(drop=True)
    assert inner["name"].tolist() == ["c", "a", "b", "a"]  # fk=9 dropped

    left = lookup_join(facts, dim, on="fk", key="k", how="left").to_pandas()
    left = left.sort_values("v").reset_index(drop=True)
    assert left["name"].tolist()[:2] == ["c", "a"]
    assert left["name"].isna().tolist() == [False, False, True, False, False]

    dup = pa.table({"k": [1, 1], "name": ["x", "y"]})
    with pytest.raises(Exception, match="duplicate"):
        lookup_join(facts, dup, on="fk", key="k").to_pandas()


def test_lookup_join_actor_pool_parity(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.joins import lookup_join

    rng = np.random.default_rng(5)
    dim = pa.table(
        {"k": np.arange(100, dtype=np.int64), "w": rng.uniform(size=100)}
    )
    facts = rd.from_arrow(
        pa.table({"fk": rng.integers(0, 130, 500), "i": np.arange(500)})
    ).repartition(4)
    a = (
        lookup_join(facts, dim, on="fk", key="k", how="left")
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    b = (
        lookup_join(facts, dim, on="fk", key="k", how="left", concurrency=2)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    assert a.equals(b)


def test_semi_anti_partition_and_duckdb_parity(ray_session):
    """semi + anti partition the left side exactly; both match DuckDB
    IN / NOT IN on the same data; string keys probe via the same kernel."""
    import duckdb
    import ray.data as rd

    from pygridmap_ray.joins import semi_join

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "k": rng.integers(0, 50, 300),
            "v": rng.normal(size=300),
        }
    )
    right = pa.table({"rk": rng.integers(25, 60, 40)})
    lds = rd.from_arrow(left)
    rds = rd.from_arrow(right)
    got_s = semi_join(lds, rds, on="k", right_on="rk").to_pandas()
    got_a = semi_join(lds, rds, on="k", right_on="rk", anti=True).to_pandas()
    assert len(got_s) + len(got_a) == len(left)
    assert set(got_s["v"]).isdisjoint(set(got_a["v"]))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp_s = con.sql("SELECT * FROM l WHERE k IN (SELECT rk FROM r)").df()
    exp_a = con.sql("SELECT * FROM l WHERE k NOT IN (SELECT rk FROM r)").df()
    for got, exp in ((got_s, exp_s), (got_a, exp_a)):
        g = got.sort_values(["k", "v"]).reset_index(drop=True)
        x = exp.sort_values(["k", "v"]).reset_index(drop=True)
        assert g.equals(x)
    # string keys + precollected array form + actor pool
    lstr = rd.from_arrow(pa.table({"k": ["a", "b", "c", "d", "a"]}))
    out = semi_join(
        lstr, np.array(["a", "d"], dtype=object), on="k", concurrency=2
    ).to_pandas()
    assert sorted(out["k"]) == ["a", "a", "d"]


def test_bloom_prefilter_superset_and_fp_rate(ray_session):
    """Bloom keeps EVERY true member (no false negatives) and the false
    positive fraction stays near the theoretical rate for the sizing."""
    import ray.data as rd

    from pygridmap_ray.joins import bloom_build, bloom_prefilter

    rng = np.random.default_rng(3)
    members = rng.choice(10**9, 2000, replace=False)
    non_members = np.setdiff1d(
        rng.choice(10**9, 20000, replace=False), members
    )
    build = rd.from_arrow(pa.table({"k": members})).repartition(4)
    bloom = bloom_build(build, "k", num_bits=1 << 15, num_hashes=4)
    probe = rd.from_arrow(
        pa.table({"k": np.concatenate([members, non_members])})
    ).repartition(3)
    kept = set(bloom_prefilter(probe, bloom, on="k").to_pandas()["k"])
    assert set(members) <= kept  # no false negatives, ever
    fp = (len(kept) - len(members)) / len(non_members)
    # m/n = 16.4 bits/key, k=4 -> p ~ (1-e^(-4/16.4))^4 ~ 0.0023
    assert fp < 0.01, fp


def test_connected_components_distributed_matches_local(ray_session):
    """Forced above the local gate the pointer-jumping Dataset path
    must reproduce the local solve exactly."""
    from pygridmap_ray.dedup import connected_components

    chain = [(i, i + 1) for i in range(0, 20)]
    far = [(1000, 2000), (2000, 3000)]
    edges = chain + far
    ds = _mk(
        {
            "id_a": np.array([a for a, _ in edges], dtype=np.int64),
            "id_b": np.array([b for _, b in edges], dtype=np.int64),
        }
    )
    loc = (
        connected_components(ds, max_iter=50, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        connected_components(
            ds, max_iter=50, num_partitions=4, local_max_edges=0
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert loc.equals(dist)
