"""Fuzzy record linkage: the Jaro-Winkler kernel's bit-law vs DuckDB,
the typo-corruption fixture law, and the fuzzy_link null paths."""

import numpy as np
import pyarrow as pa


def _mats(strs):
    from pygridmap_ray.joins import _char_matrix

    return _char_matrix(pa.array(strs, pa.string()))


def test_jw_block_bit_exact_vs_duckdb():
    import random

    import duckdb
    import pandas as pd

    from pygridmap_ray.joins import jaro_winkler_block

    random.seed(7)
    a, b = [], []
    for _ in range(4000):
        a.append("".join(random.choice("abcd ef") for _ in
                         range(random.randint(0, 13))))
        b.append("".join(random.choice("abcd ef") for _ in
                         range(random.randint(0, 13))))
    ma, la = _mats(a)
    mb, lb = _mats(b)
    got = jaro_winkler_block(ma, la, mb, lb)
    df = pd.DataFrame({"a": a, "b": b})
    con = duckdb.connect()
    exp = con.sql(
        "SELECT jaro_winkler_similarity(a, b) AS jw FROM df"
    ).df()["jw"].values
    assert np.array_equal(got, exp)  # BIT-exact, not just close


def test_jw_block_known_values():
    from pygridmap_ray.joins import jaro_winkler_block

    ma, la = _mats(["martha", "dixon", "abc", ""])
    mb, lb = _mats(["marhta", "dicksonx", "abc", ""])
    jw = jaro_winkler_block(ma, la, mb, lb)
    assert abs(jw[0] - 0.9611111111111111) < 1e-15
    assert jw[2] == 1.0
    assert jw[3] == 0.0  # DuckDB law: both-empty -> 0.0


def test_typo_names_law(ray_session):
    import ray.data as rd

    from pygridmap_ray.joins import typo_names

    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "nm": pa.array(
                    ["abcdef"] * 5, pa.string()
                ),
            }
        )
    )
    out = (
        typo_names(ds, id_col="id", name_col="nm", out_col="dirty")
        .to_pandas()
        .sort_values("id")
    )
    # id 0: mode 0, p = (0//3)%6+1 = 1 -> drop char 1
    # id 1: mode 1, p = 1 -> duplicate char 1
    # id 2: mode 2 -> unchanged
    # id 3: mode 0, p = (3//3)%6+1 = 2 -> drop char 2
    # id 4: mode 1, p = 2 -> duplicate char 2
    assert list(out.dirty) == [
        "bcdef", "aabcdef", "abcdef", "acdef", "abbcdef"
    ]


def test_fuzzy_link_paths(ray_session):
    import ray.data as rd

    from pygridmap_ray.joins import fuzzy_link

    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "name": pa.array(
                    ["blue boltt", "xyz qqq", "red widget"], pa.string()
                ),
            }
        )
    )
    out = (
        fuzzy_link(
            ds,
            ["blue bolt", "red widget", "red wrench"],
            id_col="id",
            name_col="name",
            threshold=0.9,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "match_name"] == "blue bolt"
    assert out.loc[0, "jw"] > 0.9
    assert out.loc[1, "match_name"] is None or (
        isinstance(out.loc[1, "match_name"], float)
    )  # no blocking candidate -> NULL
    assert out.loc[2, "match_name"] == "red widget"
    assert out.loc[2, "jw"] == 1.0


def test_scc_hand_graph(ray_session):
    import ray.data as rd

    from pygridmap_ray.graph import scc

    # 3-cycle {0,1,2}, 2-cycle {3,4}, self-loop 5, dag node 6 -> 0
    edges = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([0, 1, 2, 2, 3, 4, 5, 6], pa.int64()),
                "v": pa.array([1, 2, 0, 3, 4, 3, 5, 0], pa.int64()),
            }
        )
    )
    out = scc(edges).to_pandas().sort_values("node")
    assert list(out.scc_id) == [0, 0, 0, 3, 3, 5, 6]


def test_scc_distributed_path_matches_local(ray_session):
    import ray.data as rd

    from pygridmap_ray.graph import scc

    n = 120
    u = np.arange(n, dtype=np.int64)
    uu = np.concatenate([u, u[u % 3 == 0]])
    vv = np.concatenate(
        [(u * 37 + 11) % n, (u[u % 3 == 0] * 61 + 5) % n]
    )
    edges = rd.from_arrow(
        pa.table({"u": pa.array(uu), "v": pa.array(vv)})
    )
    loc = scc(edges).to_pandas().sort_values("node").reset_index(drop=True)
    dist = (
        scc(edges, local_max_edges=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    assert loc.scc_id.nunique() > 1  # non-trivial fixture


def test_local_clustering_hand_graph(ray_session):
    from pygridmap_ray.graph import local_clustering

    # K4 minus edge (2,3): nodes 0,1 see both triangles
    edges = pa.table(
        {
            "u": pa.array([0, 0, 0, 1, 1], pa.int64()),
            "v": pa.array([1, 2, 3, 2, 3], pa.int64()),
        }
    )
    out = local_clustering(edges).to_pandas().sort_values("node")
    assert list(out.degree) == [3, 3, 2, 2]
    assert list(out.n_tri) == [2, 2, 1, 1]
    # nodes 0/1: 2 tri over C(3,2)=3 wedges; nodes 2/3: 1 over 1
    assert list(out.coeff) == [0.666667, 0.666667, 1.0, 1.0]


def test_sssp_hand_graph(ray_session):
    import ray.data as rd

    from pygridmap_ray.graph import sssp_hops

    # 0 -1-> 1 -1-> 2, plus a direct heavy edge 0 -5-> 2, and 2 -1-> 3
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([0, 1, 0, 2], pa.int64()),
                "b": pa.array([1, 2, 2, 3], pa.int64()),
                "w": pa.array([1, 1, 5, 1], pa.int64()),
            }
        )
    )
    out = sssp_hops(edges, np.array([0]), max_hops=3).to_pandas()
    got = dict(zip(out.node, out.cost))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # hop bound binds: with max_hops=1 only direct edges reach
    out1 = sssp_hops(edges, np.array([0]), max_hops=1).to_pandas()
    assert dict(zip(out1.node, out1.cost)) == {0: 0, 1: 1, 2: 5}


def test_table_profile_nulls_and_order(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import table_profile

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([3, None, 10, 9], pa.int64()),
                "s": pa.array(["b", "a", None, "a"], pa.string()),
            }
        )
    )
    out = (
        table_profile(ds, ["a", "s"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    # NUMERIC min/max, rendered as text ('10' > '9' numerically)
    assert out.loc["a", "min_v"] == "3" and out.loc["a", "max_v"] == "10"
    assert out.loc["s", "n_distinct"] == 2
    assert out.loc["s", "min_v"] == "a" and out.loc["s", "max_v"] == "b"


def test_personalized_pagerank_concentrates_on_seeds(ray_session):
    import ray.data as rd

    from pygridmap_ray.graph import pagerank

    # two disjoint 2-cycles; seed only the first
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3], pa.int64()),
                "dst": pa.array([1, 0, 3, 2], pa.int64()),
            }
        )
    )
    out = (
        pagerank(edges, iters=8, seed_nodes=np.array([0]))
        .to_pandas()
        .set_index("v")["pr_scaled"]
    )
    # all mass stays in the seed cycle (scaled mean 1.0 over 4 nodes)
    assert abs(out[0] + out[1] - 4.0) < 1e-5
    assert out[0] > out[1] > 1.0
    assert out[2] == 0.0 and out[3] == 0.0


def test_scc_sharded_path_matches_local(ray_session):
    """Above the broadcast gate scc must run the sharded safe_join path
    (no NotImplementedError, no driver edge gather) and agree with the
    local solve.  Gate forced tiny; the fixture stays small because
    every fixpoint sweep is a real partitioned join round-trip."""
    import ray.data as rd

    from pygridmap_ray.graph import scc

    # 3-cycle {0,1,2}, 2-cycle {3,4}, self-loop 5, dag 6 -> 0, bridge 2->3
    edges = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([0, 1, 2, 2, 3, 4, 5, 6], pa.int64()),
                "v": pa.array([1, 2, 0, 3, 4, 3, 5, 0], pa.int64()),
            }
        )
    )
    loc = scc(edges).to_pandas().sort_values("node").reset_index(drop=True)
    sh = scc(edges, local_max_edges=0, broadcast_state_limit=4)
    sh = sh.to_pandas().sort_values("node").reset_index(drop=True)
    assert loc.equals(sh)
    assert list(sh.scc_id) == [0, 0, 0, 3, 3, 5, 6]
