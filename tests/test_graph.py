"""graph.pagerank law checks: hand-computable star graph, mass
conservation, and distinct_int_pairs dedup."""

import numpy as np
import pyarrow as pa


def test_pagerank_star_closed_form(ray_session):
    """Undirected star (hub 0, leaves 1..4), d=0.85, 2 iterations —
    closed form: after any iteration >= 1 every leaf has identical rank
    and hub + 4*leaf = 5 (scaled mass conservation)."""
    import ray.data as rd

    from pygridmap_ray.graph import pagerank

    hub = [(0, i) for i in range(1, 5)]
    edges = pa.table(
        {
            "src": [a for a, b in hub] + [b for a, b in hub],
            "dst": [b for a, b in hub] + [a for a, b in hub],
        }
    )
    out = (
        pagerank(rd.from_arrow(edges), iters=2, round_to=9)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    n, d = 5.0, 0.85
    # iter1: hub = (1-d)/n + d*4*(1/n)/1 ; leaf = (1-d)/n + d*(1/n)/4
    hub1 = (1 - d) / n + d * 4 / n
    leaf1 = (1 - d) / n + d / (4 * n)
    hub2 = (1 - d) / n + d * 4 * leaf1  # leaves have degree 1
    leaf2 = (1 - d) / n + d * hub1 / 4
    exp = np.array([hub2, leaf2, leaf2, leaf2, leaf2]) * n
    assert np.allclose(out["pr_scaled"].to_numpy(), exp, atol=2e-9)
    assert abs(out["pr_scaled"].sum() - n) < 1e-6  # mass conserved


def test_distinct_int_pairs(ray_session):
    import ray.data as rd

    from pygridmap_ray.graph import distinct_int_pairs

    rng = np.random.default_rng(4)
    a = rng.integers(0, 20, 2000)
    b = rng.integers(0, 20, 2000)
    t = pa.table({"x": a, "y": b})
    got = (
        distinct_int_pairs(rd.from_arrow(t).repartition(5), "x", "y")
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    exp = sorted(set(zip(a.tolist(), b.tolist())))
    assert list(map(tuple, got[["x", "y"]].values)) == exp


def test_bfs_hops_path_graph(ray_session):
    """Path graph 0-1-2-3-4-5 from seed 0: hops = node index, capped at
    max_hops; both state paths (broadcast and partitioned-join) agree."""
    import ray.data as rd

    from pygridmap_ray.graph import bfs_hops

    a = np.array([0, 1, 2, 3, 4], np.int64)
    b = a + 1
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(np.concatenate([a, b])),
                "b": pa.array(np.concatenate([b, a])),
            }
        )
    )
    out = bfs_hops(edges, np.array([0], np.int64), max_hops=3)
    got = dict(zip(out["node"].to_pylist(), out["hops"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    out2 = bfs_hops(
        edges, np.array([0], np.int64), max_hops=3, broadcast_state_limit=0
    )
    got2 = dict(zip(out2["node"].to_pylist(), out2["hops"].to_pylist()))
    assert got2 == got


def test_bfs_hops_multi_seed_disconnected(ray_session):
    """Two components + two seeds: distances are per-closest-seed and
    the unreachable component stays absent beyond max_hops."""
    import ray.data as rd

    from pygridmap_ray.graph import bfs_hops

    # component 1: 0-1-2 ; component 2: 10-11
    pairs = [(0, 1), (1, 2), (10, 11)]
    a = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    out = bfs_hops(edges, np.array([0, 10], np.int64), max_hops=2)
    got = dict(zip(out["node"].to_pylist(), out["hops"].to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2, 10: 0, 11: 1}


def test_q2_min_cost_join_fallback_matches_broadcast(ray_session):
    """q2's >2M-part safe_join fallback produces the identical achieving
    set as the broadcast min-map path."""
    from pygridmap_ray.pipelines.tpch import q2_min_cost

    sf = "/root/testdata/sf0.001"
    a = q2_min_cost(sf).to_pandas().reset_index(drop=True)
    b = q2_min_cost(sf, broadcast_limit=0).to_pandas().reset_index(drop=True)
    assert a.equals(b)
