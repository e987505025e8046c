"""Round-4 regressions: discrete-domain gates, assoc_rules guards,
trimmed_mean null keys, q_mutual_info empty corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _kv_ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_percent_rank_domain_gate(ray_session):
    from pygridmap_ray.stats import percent_rank

    ds = _kv_ds(
        [{"g": i % 2, "v": float(i)} for i in range(50)]
    )
    with pytest.raises(ValueError, match="discrete-domain gate"):
        percent_rank(
            ds, group_col="g", value_col="v", domain_limit=10
        ).materialize()
    # over-the-gate limit still works
    out = percent_rank(
        ds, group_col="g", value_col="v", domain_limit=1000
    ).to_pandas()
    assert len(out) == 50 and "pct_rank" in out.columns


def test_window_ranks_domain_gate(ray_session):
    from pygridmap_ray.stats import window_ranks

    ds = _kv_ds([{"g": 0, "v": float(i)} for i in range(30)])
    with pytest.raises(ValueError, match="discrete-domain gate"):
        window_ranks(
            ds, group_col="g", value_col="v", domain_limit=5
        ).materialize()


def test_spearman_domain_gate(ray_session):
    from pygridmap_ray.stats import spearman_corr

    ds = _kv_ds(
        [{"g": 0, "x": float(i), "y": float(i * 2)} for i in range(30)]
    )
    with pytest.raises(ValueError, match="discrete-domain gate"):
        spearman_corr(
            ds, group_col="g", x_col="x", y_col="y", domain_limit=5
        )


def test_assoc_rules_null_items_and_vocab_cap(ray_session):
    from pygridmap_ray.graph import assoc_rules

    rows = [
        {"k": 0, "item": "a"}, {"k": 0, "item": "b"},
        {"k": 1, "item": "a"}, {"k": 1, "item": "b"},
        {"k": 1, "item": None}, {"k": 2, "item": "a"},
    ]
    out = assoc_rules(_kv_ds(rows), "k", "item").to_pandas()
    # nulls dropped: only a->b / b->a rules, support over 3 baskets
    assert set(zip(out["antecedent"], out["consequent"])) == {
        ("a", "b"), ("b", "a")
    }
    big = _kv_ds(
        [{"k": i, "item": f"it{i}"} for i in range(200)]
    )
    with pytest.raises(ValueError, match="vocabular"):
        assoc_rules(big, "k", "item", max_vocab=100)


def test_trimmed_mean_null_keys_match_join_semantics(ray_session):
    """NULL keys must drop (the twin's JOIN USING(key) law) instead of
    raising from np.unique over object arrays."""
    from pygridmap_ray.stats import trimmed_mean

    rows = [{"k": "a", "v": float(i)} for i in range(20)]
    rows += [{"k": None, "v": 999.0}] * 3
    out = (
        trimmed_mean(_kv_ds(rows), key="k", value="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == ["a"]
    assert out["n_total"].iloc[0] == 20


def test_mutual_info_empty_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.queries import q_mutual_info

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    pq.write_table(empty, tmp_path / "documents.parquet")
    out = q_mutual_info(str(tmp_path))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    if isinstance(out, pa.Table):
        out = out.to_pandas()
    assert len(out) == 1
    assert out["n"].iloc[0] == 0 and pd.isna(out["mi"].iloc[0])


def _coocc_fixture_ds():
    import ray.data as rd

    rng = np.random.default_rng(11)
    rows = []
    for g in range(60):
        items = rng.choice(20, size=rng.integers(2, 6), replace=False)
        rows += [{"g": int(g), "item": int(i)} for i in items]
    return rd.from_pandas(pd.DataFrame(rows))


def test_cooccurrence_edges_ds_matches_table(ray_session):
    from pygridmap_ray.graph import (
        cooccurrence_edge_table,
        cooccurrence_edges_ds,
    )

    ds = _coocc_fixture_ds()
    tab = (
        cooccurrence_edge_table(ds, "g", "item", min_weight=2)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    dst = (
        cooccurrence_edges_ds(ds, "g", "item", min_weight=2)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    assert tab.equals(dst)
    assert len(tab) > 5


def test_triangle_census_distributed_matches_driver(ray_session):
    from pygridmap_ray.graph import (
        cooccurrence_edge_table,
        cooccurrence_edges_ds,
        local_clustering,
        local_clustering_distributed,
        triangle_stats,
        triangle_stats_distributed,
    )

    ds = _coocc_fixture_ds()
    tab = cooccurrence_edge_table(ds, "g", "item", min_weight=2)
    eds = cooccurrence_edges_ds(ds, "g", "item", min_weight=2)
    drv = triangle_stats(tab).to_pandas()
    dst = triangle_stats_distributed(eds).to_pandas()
    assert drv.equals(dst)
    assert drv["n_triangles"].iloc[0] > 0
    lc_drv = (
        local_clustering(tab)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    lc_dst = (
        local_clustering_distributed(eds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert lc_drv.equals(lc_dst)


def test_keyed_prefix_sum_law(ray_session):
    from pygridmap_ray.pack import keyed_prefix_sum

    rows = [
        {"k": "a", "o": 1, "v": 10}, {"k": "b", "o": 2, "v": 5},
        {"k": "a", "o": 3, "v": 7}, {"k": "b", "o": 4, "v": 1},
        {"k": "a", "o": 5, "v": 2},
    ]
    out = (
        keyed_prefix_sum(
            _kv_ds(rows), key_col="k", order_col="o", value_col="v"
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert list(out["cum"]) == [10, 5, 17, 6, 19]
    # duplicate order keys must fail loudly
    import pytest as _pytest

    dup = rows + [{"k": "c", "o": 3, "v": 1}]
    with _pytest.raises(Exception):
        keyed_prefix_sum(
            _kv_ds(dup), key_col="k", order_col="o", value_col="v"
        ).materialize()


def test_token_budget_take_cutoff(ray_session):
    from pygridmap_ray.pack import token_budget_take

    rows = [
        {"doc_id": i, "source": f"s{i % 2}", "n_tokens": 30}
        for i in range(10)
    ]
    out = (
        token_budget_take(_kv_ds(rows), budget=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # each source: docs at cum 30/60/90 kept, 120/150 cut
    assert out.groupby("source")["kept"].sum().tolist() == [3, 3]
    assert (out[out.kept]["cum_tokens"] <= 100).all()


def test_contamination_overlap_planted(ray_session):
    from pygridmap_ray.dedup import contamination_overlap

    tr = _kv_ds(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta"},  # 2/2 hit
            {"doc_id": 1, "text": "zz yy xx ww vv"},          # 0 hit
            {"doc_id": 2, "text": "alpha beta gamma qq rr"},  # 1/3 hit
        ]
    )
    ev = _kv_ds([{"doc_id": 9, "text": "alpha beta gamma delta"}])
    out = (
        contamination_overlap(tr, ev, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_hit"]) == [2, 0, 1]
    assert out["overlap_frac"].iloc[0] == 1.0
    assert out["overlap_frac"].iloc[1] == 0.0


def test_neardup_decontaminate_planted(ray_session):
    from pygridmap_ray.dedup import neardup_decontaminate

    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills tonight"
    )
    tr = _kv_ds(
        [
            {"doc_id": 0, "text": base.replace("lazy", "sleepy")},  # near
            {"doc_id": 1, "text": "entirely different words here now"},
            {"doc_id": 2, "text": base},                            # exact
        ]
    )
    ev = _kv_ds([{"doc_id": 0, "text": base}])
    out = (
        neardup_decontaminate(tr, ev, threshold=0.5, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["fuzzy_contaminated"]) == [True, False, True]


def test_sssp_sharded_path_matches_broadcast(ray_session):
    """Beyond the broadcast gate sssp_hops must run the sharded
    Bellman-Ford (no NotImplementedError) and agree with the broadcast
    solve; gate forced to 0."""
    import ray.data as rd

    from pygridmap_ray.graph import sssp_hops

    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([0, 0, 1, 2, 3, 9], pa.int64()),
                "b": pa.array([1, 2, 3, 3, 4, 0], pa.int64()),
                "w": pa.array([1, 5, 1, 1, 7, 2], pa.int64()),
            }
        )
    )
    seeds = np.array([0, 77], np.int64)  # 77 not in the graph: drops
    bc = sssp_hops(edges, seeds, max_hops=3)
    bc = bc.to_pandas() if hasattr(bc, "to_pandas") else bc.to_pandas()
    sh = sssp_hops(edges, seeds, max_hops=3, broadcast_state_limit=0)
    sh = sh.to_pandas()
    bc = bc.sort_values("node").reset_index(drop=True)
    sh = sh.sort_values("node").reset_index(drop=True)
    assert bc.equals(sh)
    got = dict(zip(bc["node"], bc["cost"]))
    assert got == {0: 0, 1: 1, 2: 5, 3: 2, 4: 9}


def test_pagerank_distributed_matches_broadcast_and_ppr(ray_session):
    """Forced above the gate, pagerank (standard AND personalized) must
    agree with the broadcast solve at the 6dp rounding step — including
    nodes with no inbound edges, which the distributed update must keep
    at their teleport instead of dropping."""
    import ray.data as rd

    from pygridmap_ray.graph import pagerank

    # doubled edges + one pure source node (8 -> 0 only)
    u = [0, 1, 2, 3, 4, 0, 2, 8]
    v = [1, 2, 3, 4, 0, 2, 0, 0]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(u, pa.int64()),
                  "dst": pa.array(v, pa.int64())})
    )
    for seeds in (None, np.array([0, 2], np.int64)):
        bc = (
            pagerank(edges, iters=4, seed_nodes=seeds)
            .to_pandas().sort_values("v").reset_index(drop=True)
        )
        dist = (
            pagerank(
                edges, iters=4, seed_nodes=seeds,
                broadcast_state_limit=0,
            )
            .to_pandas().sort_values("v").reset_index(drop=True)
        )
        assert list(bc["v"]) == list(dist["v"])
        assert np.allclose(bc["pr_scaled"], dist["pr_scaled"], atol=2e-6)


def test_ngram_diversity_hand_values(ray_session):
    from pygridmap_ray.text import ngram_diversity

    rows = [
        {"doc_id": 0, "source": "a", "text": "x y x y"},   # grams: xy yx xy -> 3 total, 2 distinct
        {"doc_id": 1, "source": "a", "text": "x y"},        # xy -> dup of above
        {"doc_id": 2, "source": "b", "text": "p q r"},      # pq qr -> 2/2
        {"doc_id": 3, "source": "c", "text": ""},           # gram-less: drops
    ]
    out = (
        ngram_diversity(_kv_ds(rows), n=2)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(out["source"]) == ["a", "b"]
    assert list(out["n_grams"]) == [4, 2]
    assert list(out["n_distinct"]) == [2, 2]
    assert out["ttr"].iloc[0] == 0.5 and out["ttr"].iloc[1] == 1.0


def test_winnow_guarantee_and_hand_check(ray_session):
    """Winnowing guarantee: two docs sharing a run of >= window + n - 1
    tokens share at least one fingerprint; and density <= 1."""
    from pygridmap_ray.text import winnow_fingerprints

    shared = "aa bb cc dd ee ff"  # 6 tokens >= 4 + 3 - 1
    rows = [
        {"doc_id": 0, "text": f"xx yy {shared} zz"},
        {"doc_id": 1, "text": f"{shared} qq rr ss tt"},
        {"doc_id": 2, "text": "totally different tokens here now ok"},
        {"doc_id": 3, "text": "ab"},  # single token: one truncated window
    ]
    out = (
        winnow_fingerprints(_kv_ds(rows), n=3, window=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert (out["n_fp"] >= 1).all()
    assert (out["n_fp"] <= out["n_grams"]).all()
    assert out.loc[3, "n_grams"] == 1 and out.loc[3, "n_fp"] == 1
    assert out.loc[3, "density"] == 1.0


def test_grid_join_counts_hand_lattice(ray_session):
    from pygridmap_ray.spatial import grid_join_counts

    # 2x2 occupied lattice: cells (0,0)B (0,1)W (1,0)W (1,1)B with
    # threshold 2; 4 rook joins, all BW
    pts = []
    for (cx, cy), k in [((0, 0), 2), ((0, 1), 1), ((1, 0), 1), ((1, 1), 3)]:
        pts += [
            {"doc_id": len(pts) + i, "x": cx * 10.0 + 5.0,
             "y": cy * 10.0 + 5.0}
            for i in range(k)
        ]
    out = (
        grid_join_counts(_kv_ds(pts), cell=10.0, threshold=2)
        .to_pandas().iloc[0]
    )
    assert out["n_cells"] == 4 and out["n_joins"] == 4
    assert out["bb"] == 0 and out["ww"] == 0 and out["bw"] == 4


def test_kcore_sharded_matches_local(ray_session):
    """Above the edge gate kcore_membership must run the superstep path
    and agree with the driver peel; gate forced to 0."""
    import ray.data as rd

    from pygridmap_ray.graph import kcore_membership

    rng = np.random.default_rng(9)
    a = rng.integers(0, 25, 140).astype(np.int64)
    b = rng.integers(0, 25, 140).astype(np.int64)
    keep = a != b
    pairs = set()
    for x, y in zip(a[keep], b[keep]):
        pairs.add((min(x, y), max(x, y)))
    u = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int64)
    v = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int64)
    edges = rd.from_arrow(
        pa.table({"a": pa.array(u), "b": pa.array(v)})
    )
    loc = kcore_membership(edges, k=3, rounds=8)
    assert isinstance(loc, pa.Table)
    sh = kcore_membership(edges, k=3, rounds=8, local_max_edges=0)
    sh = sh.to_pandas().sort_values("node").reset_index(drop=True)
    lp = loc.to_pandas().sort_values("node").reset_index(drop=True)
    assert lp.equals(sh)
    assert len(lp) > 0


def test_distinct_pairs_table_driver_gate(ray_session):
    """The driver-final distinct must fail FAST with a clear error when
    partial volume exceeds the gate, never OOM."""
    import pytest as _pytest
    import ray.data as rd

    from pygridmap_ray.graph import distinct_int_pairs_table

    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(np.arange(100, dtype=np.int64)),
                "b": pa.array(np.arange(100, dtype=np.int64) + 1),
            }
        )
    )
    with _pytest.raises(ValueError, match="driver gate"):
        distinct_int_pairs_table(ds, "a", "b", max_rows=10)
    out = distinct_int_pairs_table(ds, "a", "b")
    assert out.num_rows == 100


def test_label_prop_sharded_matches_local(ray_session):
    """Above the edge gate label_prop_membership must run the sharded
    mode-pass rounds and agree with the driver solve; gate forced."""
    import ray.data as rd

    from pygridmap_ray.graph import label_prop_membership

    # two 4-cliques joined by one bridge edge
    cl1 = [(a, b) for a in range(4) for b in range(4) if a != b]
    cl2 = [(a + 10, b + 10) for a, b in cl1]
    bridge = [(3, 10), (10, 3)]
    edges_l = cl1 + cl2 + bridge
    u = np.array([e[0] for e in edges_l], np.int64)
    v = np.array([e[1] for e in edges_l], np.int64)
    edges = rd.from_arrow(
        pa.table({"a": pa.array(u), "b": pa.array(v)})
    )
    loc = label_prop_membership(edges, rounds=6)
    assert isinstance(loc, pa.Table)
    sh = label_prop_membership(edges, rounds=6, local_max_edges=0)
    sh = sh.to_pandas().sort_values("community").reset_index(drop=True)
    lp = loc.to_pandas().sort_values("community").reset_index(drop=True)
    assert lp.equals(sh)


def test_hits_sharded_matches_driver(ray_session):
    """The Dataset HITS (pagerank superstep shape) must agree with the
    driver solve at the 6dp step."""
    import ray.data as rd

    from pygridmap_ray.graph import hits_scores, hits_scores_ds

    rng = np.random.default_rng(13)
    hub = rng.integers(0, 12, 60).astype(np.int64)
    aut = rng.integers(100, 115, 60).astype(np.int64)
    pairs = np.unique(hub * (1 << 31) + aut)
    hub = (pairs >> 31).astype(np.int64)
    aut = (pairs & ((1 << 31) - 1)).astype(np.int64)
    tbl = pa.table({"a": pa.array(hub), "b": pa.array(aut)})
    drv = (
        hits_scores(tbl, "a", "b", iters=4)
        .to_pandas().sort_values(["kind", "node"]).reset_index(drop=True)
    )
    dst = (
        hits_scores_ds(rd.from_arrow(tbl), "a", "b", iters=4)
        .to_pandas().sort_values(["kind", "node"]).reset_index(drop=True)
    )
    assert list(drv["node"]) == list(dst["node"])
    assert list(drv["kind"]) == list(dst["kind"])
    assert np.allclose(drv["score"], dst["score"], atol=2e-6)
