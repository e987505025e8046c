"""Randomized (seeded) equivalence checks for the round-4 primitives:
each op vs a brute-force reference on small random inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_keyed_prefix_sum_matches_pandas(ray_session, seed):
    from pygridmap_ray.pack import keyed_prefix_sum

    rng = np.random.default_rng(seed)
    n = 200
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    out = (
        keyed_prefix_sum(
            _ds(df), key_col="k", order_col="o", value_col="v",
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    ref = df.sort_values("o").reset_index(drop=True)
    ref["cum"] = ref.groupby("k")["v"].cumsum()
    assert (out["cum"].to_numpy() == ref["cum"].to_numpy()).all()


def _winnow_ref(tokens, n, w):
    """Brute-force winnowing reference (md5 law)."""
    import hashlib

    L0 = len(tokens)
    if L0 == 0:
        return None
    m = min(n, L0)
    grams = [
        "\x1f".join(tokens[p : p + m]) for p in range(L0 - m + 1)
    ]
    hv = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    L = len(hv)
    sel = set()
    for s in range(max(L - w, 0) + 1):
        win = hv[s : s + w]
        mn = min(win)
        # rightmost minimum
        p = s + max(i for i, v in enumerate(win) if v == mn)
        sel.add(p)
    return L, len(sel)


@pytest.mark.parametrize("seed", [3, 4])
def test_winnow_matches_bruteforce(ray_session, seed):
    from pygridmap_ray.text import winnow_fingerprints

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        ln = int(rng.integers(0, 30))
        rows.append(
            {"doc_id": i, "text": " ".join(rng.choice(vocab, ln))}
        )
    out = (
        winnow_fingerprints(_ds(pd.DataFrame(rows)), n=3, window=4)
        .to_pandas()
        .set_index("doc_id")
    )
    for r in rows:
        ref = _winnow_ref(r["text"].split(), 3, 4)
        if ref is None:
            assert r["doc_id"] not in out.index
            continue
        L, n_fp = ref
        assert out.loc[r["doc_id"], "n_grams"] == L
        assert out.loc[r["doc_id"], "n_fp"] == n_fp


@pytest.mark.parametrize("seed", [5, 6])
def test_grid_join_counts_matches_bruteforce(ray_session, seed):
    from pygridmap_ray.spatial import grid_join_counts

    rng = np.random.default_rng(seed)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "x": rng.uniform(-50, 50, n),
            "y": rng.uniform(-50, 50, n),
        }
    )
    cell, thr = 20.0, 3
    out = grid_join_counts(
        _ds(df), cell=cell, threshold=thr
    ).to_pandas().iloc[0]
    # brute force
    ix = np.floor(df["x"].to_numpy() / cell).astype(np.int64)
    iy = np.floor(df["y"].to_numpy() / cell).astype(np.int64)
    from collections import Counter

    cnt = Counter(zip(ix, iy))
    black = {k: c >= thr for k, c in cnt.items()}
    bb = bw = ww = nj = 0
    for (cx, cy), b1 in black.items():
        for nbr in [(cx + 1, cy), (cx, cy + 1)]:
            if nbr in black:
                nj += 1
                b2 = black[nbr]
                if b1 and b2:
                    bb += 1
                elif b1 != b2:
                    bw += 1
                else:
                    ww += 1
    assert out["n_cells"] == len(cnt)
    assert (out["n_joins"], out["bb"], out["bw"], out["ww"]) == (
        nj, bb, bw, ww
    )


@pytest.mark.parametrize("seed", [7])
def test_sssp_broadcast_matches_bruteforce(ray_session, seed):
    from pygridmap_ray.graph import sssp_hops

    rng = np.random.default_rng(seed)
    n, m = 40, 120
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)
    import ray.data as rd

    edges = rd.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b),
                  "w": pa.array(w)})
    )
    seeds = np.array([0, 1], np.int64)
    got = sssp_hops(edges, seeds, max_hops=3).to_pandas()
    got = dict(zip(got["node"], got["cost"]))
    # brute-force bounded Bellman-Ford
    INF = 1 << 60
    nodes = set(a) | set(b)
    dist = {v: (0 if v in set(seeds) and v in nodes else INF)
            for v in nodes}
    for _ in range(3):
        nd = dict(dist)
        for ai, bi, wi in zip(a, b, w):
            if dist[ai] + wi < nd[bi]:
                nd[bi] = min(nd[bi], dist[ai] + wi)
        dist = nd
    ref = {v: c for v, c in dist.items() if c < INF}
    assert got == ref


@pytest.mark.parametrize("nb", [4, 32])
def test_bucket_width_law_neutrality(ray_session, nb):
    """Coarse-bucket widths are law-neutral: the same pipeline at
    different explicit widths produces IDENTICAL results (the
    cluster-derived default can therefore change with cluster size
    without touching any oracle law)."""
    from pygridmap_ray.dedup import dedup_lines
    from pygridmap_ray.pack import keyed_prefix_sum

    rows = [
        {"doc_id": i, "text": f"tok{i % 7} tok{i % 5} tok{i % 3} end"}
        for i in range(60)
    ]
    base = (
        dedup_lines(_ds(pd.DataFrame(rows)), chunk=2, num_buckets=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    alt = (
        dedup_lines(_ds(pd.DataFrame(rows)), chunk=2, num_buckets=nb)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert base.equals(alt)

    kv = pd.DataFrame(
        {
            "k": [f"s{i % 3}" for i in range(50)],
            "o": np.arange(50, dtype=np.int64),
            "v": (np.arange(50) % 7).astype(np.int64),
        }
    )
    b1 = (
        keyed_prefix_sum(
            _ds(kv), key_col="k", order_col="o", value_col="v",
            n_buckets=16,
        )
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    b2 = (
        keyed_prefix_sum(
            _ds(kv), key_col="k", order_col="o", value_col="v",
            n_buckets=nb,
        )
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    assert (b1["cum"].to_numpy() == b2["cum"].to_numpy()).all()
