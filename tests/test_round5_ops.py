"""Round-5 pins: the k-means clustering-stage memory-cliff fixes
(VERDICT r4 "What's wrong #1") and their bit-exactness guarantees.

The round-4 verdict found two scale cliffs in the clustering stage that
feeds semdedup/emb_outlier: (a) the batch x k x d broadcast distance
tensor (with corpus-scaled k up to 65536 that is ~137 GB per 4096-row
batch), (b) a dense per-sweep k-row partial from EVERY batch folded on
the driver (petabyte-scale at 10^6 blocks).  The fixes — centroid-
chunked running argmin, sparse per-batch partials, a distributed
coarse-bucket fold before the k x (d+1) driver fetch — must keep the
assignment law bit-identical; these tests force both new code paths at
big k and pin equality against brute-force references.
"""
import numpy as np
import pyarrow as pa
import pytest


def _rng(seed=5):
    return np.random.default_rng(seed)


def test_argmin_sq_dist_chunked_equals_full_tensor():
    """Forced multi-chunk scan == the single batch x k x d tensor,
    bit-for-bit (argmin AND min value), including exact-duplicate
    centroids (ties must go to the LOWEST centroid id)."""
    from pygridmap_ray.ann import _argmin_sq_dist

    r = _rng()
    X = r.normal(size=(257, 12))
    # k > _ARGMIN_MIN_BLOCK so the slab genuinely splits the CENTROID
    # axis (smaller k would route through the row-chunk path instead)
    C = r.normal(size=(600, 12))
    C[441] = C[7]  # exact duplicate centroid: tie must pick cid 7
    X[5] = C[7]    # a row exactly ON the duplicated centroid
    full = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a_ref = full.argmin(axis=1)
    m_ref = full[np.arange(len(X)), a_ref]
    # slab sized for a 300-centroid chunk: 2 chunks, tie crosses them
    a, m = _argmin_sq_dist(
        X, C, slab_bytes=300 * X.shape[0] * X.shape[1] * 8
    )
    assert (a == a_ref).all()
    assert (m == m_ref).all()          # same bits, not just close
    assert a[5] == 7                   # tie broke to the lower cid
    # tiny slab: the row-chunk + centroid-chunk combined path
    a3, m3 = _argmin_sq_dist(X, C, slab_bytes=1 << 12)
    assert (a3 == a_ref).all() and (m3 == m_ref).all()
    # default slab on a small input: single chunk, same result
    a2, m2 = _argmin_sq_dist(X, C)
    assert (a2 == a_ref).all() and (m2 == m_ref).all()


def test_argmin_sq_dist_slab_forces_chunking():
    """The fence actually bounds the transient: block size derives from
    slab_bytes // (rows * d * 8), floor 1."""
    from pygridmap_ray.ann import _argmin_sq_dist

    r = _rng(7)
    X = r.normal(size=(64, 8))
    C = r.normal(size=(33, 8))
    # slab smaller than one centroid-row slab still works (block=1)
    a, m = _argmin_sq_dist(X, C, slab_bytes=1)
    full = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert (a == full.argmin(axis=1)).all()


def test_kmeans_partials_are_sparse(ray_session):
    """A batch touching few clusters emits rows ONLY for those clusters
    (the dense k-row emission was the round-4 driver-fold cliff)."""
    import ray.data as rd

    from pygridmap_ray.ann import kmeans_fit

    # 3 tight blobs far apart; ids 0..k-1 seed init per the law
    r = _rng(11)
    k, d, n = 48, 4, 480
    base = r.normal(size=(k, d)) * 100.0
    # duplicated seeds: their clusters can never win an assignment
    # (ties go to the lower cid), so they stay empty forever
    base[1] = base[0]
    base[17] = base[16]
    X = np.concatenate([base, base[:3].repeat((n - k) // 3, axis=0)
                        + r.normal(size=((n - k) // 3 * 3, d)) * 0.01])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(X)), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    }))
    cents = kmeans_fit(ds, k=k, iters=1)
    assert cents.shape == (k, d)
    # the law itself: every centroid with no assigned vector kept its
    # init value bit-for-bit (sparse partials + sparse driver update)
    assigned = np.unique(
        ((X[:, None, :] - base[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    )
    untouched = np.setdiff1d(np.arange(k), assigned)
    assert len(untouched) > 0  # the fixture really leaves empty clusters
    assert (cents[untouched] == base[untouched]).all()


def test_kmeans_fit_big_k_matches_local_lloyd(ray_session):
    """Forced big-k run (k >= 4096, multiple centroid chunks under a
    tiny slab, many batches -> the distributed coarse fold) equals a
    local single-process Lloyd reference under the same law."""
    import ray.data as rd

    import pygridmap_ray.ann as ann

    r = _rng(13)
    k, d, n, iters, round_to = 4096, 6, 6000, 2, 6
    X = r.normal(size=(n, d))
    tol = 10.0 ** round_to

    # local reference: identical law (lowest-id init, (x-c)^2 argmin,
    # first-min tie, rounded half-away update, empty keeps previous);
    # row-chunked full-tensor argmin so the reference itself stays small
    def ref_assign(cents):
        a = np.empty(n, np.int64)
        for lo in range(0, n, 256):
            sl = X[lo:lo + 256]
            d2 = ((sl[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a[lo:lo + len(sl)] = d2.argmin(axis=1)
        return a

    cents = X[:k].copy()
    for _ in range(iters):
        a = ref_assign(cents)
        new = cents.copy()
        for cid in np.unique(a):
            m = X[a == cid].mean(axis=0)
            new[cid] = np.sign(m) * np.floor(np.abs(m) * tol + 0.5) / tol
        cents = new

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    })).repartition(8)  # many batches -> the distributed fold matters

    got = ann.kmeans_fit(
        ds, k=k, iters=iters, round_to=round_to,
        argmin_slab_bytes=1 << 16,  # forces many centroid chunks
    )
    # identical up to the documented summation-order ulp-at-round_to
    # boundary: the rounding law absorbs segment-order drift, so the
    # rounded centroids must agree exactly
    assert got.shape == cents.shape
    assert np.allclose(got, cents, atol=10.0 ** -round_to, rtol=0)
    exact = (got == cents).mean()
    assert exact > 0.999, f"only {exact:.4%} of centroid coords exact"


def test_kmeans_distances_uses_chunked_min(ray_session):
    """kmeans_distances' per-row min distance survives the chunked scan
    (it consumes the min VALUE, not just the argmin)."""
    import ray.data as rd

    import pygridmap_ray.ann as ann

    r = _rng(17)
    n, d, k = 200, 5, 16
    X = r.normal(size=(n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    }))
    forced = ann.kmeans_distances(
        ds, k=k, iters=1, argmin_slab_bytes=1 << 10,
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    plain = ann.kmeans_distances(ds, k=k, iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (forced["cluster"] == plain["cluster"]).all()
    assert (forced["dist"] == plain["dist"]).all()


def test_semdedup_forced_chunked_assign(ray_session):
    """semdedup under a tiny argmin slab (many centroid chunks) equals
    the unforced run — the assign stage is chunk-invariant."""
    import ray.data as rd

    from pygridmap_ray.dedup import semdedup

    r = _rng(19)
    n, d = 300, 8
    X = r.normal(size=(n, d))
    X[150:200] = X[:50] + r.normal(size=(50, d)) * 1e-4  # planted dups
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    }))
    plain = semdedup(ds, k=16, tau=0.9).to_pandas()
    forced = semdedup(
        ds, k=16, tau=0.9, argmin_slab_bytes=1 << 10
    ).to_pandas()
    assert (plain["vec_id"] == forced["vec_id"]).all()
    assert (plain["cluster"] == forced["cluster"]).all()
    assert (plain["removed"] == forced["removed"]).all()
    assert plain["removed"].sum() >= 50  # the planted dups were caught


# ---------------------------------------------------------------------------
# round-5 ADVICE fixes
# ---------------------------------------------------------------------------


def test_ppr_no_seed_error_consistent_across_gate(ray_session):
    """Personalized pagerank with no seed present must raise the SAME
    clear ValueError on both sides of the broadcast gate (the sharded
    branch used to divide by zero)."""
    import ray.data as rd

    from pygridmap_ray.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
    }))
    seeds = np.array([99], np.int64)  # absent from the graph
    for limit in (2_000_000, 0):  # broadcast and sharded branches
        with pytest.raises(ValueError, match="no seed_nodes present"):
            pagerank(
                edges, iters=2, seed_nodes=seeds,
                broadcast_state_limit=limit,
            ).to_pandas()


def test_grid_join_counts_no_iy_field_wrap(ray_session):
    """Packed-key rook adjacency must not wrap across the iy field: a
    cell at the TOP of the permitted iy range (+2^19 - 1) packs to
    k with all-ones low bits, and k+1 equals the packed key of
    (ix+1, iy = -2^19) — NOT a rook neighbor.  Both the driver branch
    and the distributed join branch must reject the pair (the SQL twin
    joins real (ix, iy) and never wraps)."""
    import pandas as pd
    import ray.data as rd

    from pygridmap_ray.spatial import grid_join_counts

    top = (1 << 19) - 1          # max permitted raw iy index
    bot = -(1 << 19)             # min permitted raw iy index
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "x": [0.5, 0.5, 1.5, 1.5],
        "y": [top + 0.5, top + 0.5, bot + 0.5, bot + 0.5],
    })
    for gate in (2_000_000, 0):
        out = grid_join_counts(
            rd.from_pandas(df), cell=1.0, threshold=2, driver_gate=gate,
        ).to_pandas().iloc[0]
        assert out["n_cells"] == 2
        assert out["n_joins"] == 0, (
            f"iy-field wrap produced a false rook join (gate={gate})"
        )
        assert out["bb"] == 0 and out["bw"] == 0 and out["ww"] == 0


def test_winnow_dup_pairs_planted(ray_session):
    """Two docs sharing a long token run pair up with n_shared >= 2;
    unrelated docs do not; id_a < id_b ordering holds."""
    import ray.data as rd

    from pygridmap_ray.text import winnow_dup_pairs

    shared = " ".join(f"s{i}" for i in range(20))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "intro one two " + shared,
            shared + " outro alpha beta",
            "completely different tokens here nine ten eleven twelve",
        ], pa.string()),
    }))
    out = winnow_dup_pairs(docs).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["n_shared"] >= 2


def test_media_dup_groups_keeper_law(ray_session):
    """Keeper election: lowest doc_id then span_idx within each
    fingerprint group; counts match a brute-force reference."""
    import ray.data as rd

    from pygridmap_ray.multimodal import MEDIA_CFP_MOD, media_dup_groups
    from pygridmap_ray.synth import build_spans_array

    ids = np.arange(40, dtype=np.int64)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "spans": build_spans_array(ids),
    })).repartition(4)  # cross-batch distinct-doc folding matters
    out = media_dup_groups(docs).to_pandas().set_index("cfp")

    # brute force over the span law
    rows = []
    for d in ids:
        for i in range(1 + d % 8):
            if (d + i) % 3 != 0:
                rows.append((int((d * 31 + i * 17) % MEDIA_CFP_MOD),
                             int(d), int(i)))
    import collections
    by = collections.defaultdict(list)
    for cfp, d, i in rows:
        by[cfp].append((d, i))
    for cfp, mem in by.items():
        if len(mem) < 2:
            assert cfp not in out.index
            continue
        g = out.loc[cfp]
        assert g["n_refs"] == len(mem)
        assert g["n_docs"] == len({d for d, _ in mem})
        kd, ks = min(mem)
        assert (g["keep_doc"], g["keep_span"]) == (kd, ks)


def test_minhash_hot_bucket_prune_identical(ray_session, sf_dir):
    """The round-5 hot-bucket pre-pass (only candidate docs ship their
    signatures) must produce byte-identical pairs to the dense explode
    (forced via hot_limit=0), on a corpus with planted near-dups."""
    import ray.data as rd

    from pygridmap_ray.dedup import minhash_lsh_pairs

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def run(**kw):
        return (
            minhash_lsh_pairs(docs, **kw)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    pruned = run()                 # hot-bucket pruning active
    dense = run(hot_limit=0)       # forced dense fallback
    assert pruned.equals(dense)


def test_minhash_all_unique_corpus_zero_pairs(ray_session):
    """A corpus with no non-singleton bucket takes the hot.size == 0
    early-out and yields zero pairs."""
    import ray.data as rd

    from pygridmap_ray.dedup import minhash_lsh_pairs

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": pa.array(
            [" ".join(f"w{i}x{j}" for j in range(30)) for i in range(40)],
            pa.string(),
        ),
    }))
    out = minhash_lsh_pairs(docs)
    assert out.count() == 0
    # Ray 2.49's to_pandas drops columns on zero-row datasets; the
    # schema contract lives on the Dataset itself
    assert list(out.schema().names) == ["id_a", "id_b", "jaccard"]


def test_ivf_multiprobe_recall_monotone(ray_session, sf_dir, tmp_path):
    """Recall@5 vs the exact scan is MONOTONE in nprobe and the
    multi-probe regime strictly beats single-probe on the test corpus —
    the 100 TB recall story behind the ivf_multiprobe oracle row."""
    import ray.data as rd

    from pygridmap_ray.ann import (
        ann_topk, ivf_build, ivf_search_pruned,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    head = (
        ds.filter(lambda r: r["vec_id"] < 10)
        .to_pandas().sort_values("vec_id")
    )
    qids = head["vec_id"].to_numpy(np.int64)
    qmat = np.stack([np.asarray(e, float) for e in head["embedding"]])
    cents = qmat[:8]

    exact = ann_topk(ds, {"ids": qids, "matrix": qmat}, k=5).to_pandas()
    truth = {
        q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")
    }
    idx = str(tmp_path / "ivf")
    ivf_build(ds, cents, idx)

    def recall(nprobe):
        got = ivf_search_pruned(
            idx, {"ids": qids, "matrix": qmat}, cents, k=5,
            nprobe=nprobe,
        ).to_pandas()
        hit = tot = 0
        for q, g in got.groupby("query_id"):
            hit += len(set(g["neighbor_id"]) & truth[q])
            tot += len(truth[q])
        return hit / tot

    r1, r3, r5, r8 = (recall(n) for n in (1, 3, 5, 8))
    assert r1 <= r3 <= r5 <= r8  # monotone in probes
    assert r5 > r1               # multi-probe genuinely buys recall
    assert r8 == 1.0             # probing every cell == exact scan


def test_triangulate_healing_pre_pass():
    """The VERDICT-4 polygon-healing pre-pass: degenerate rings that
    used to raise 'no ear found' now triangulate — snap-duplicate
    dedup, spike drop, zero-area drop, self-TOUCHING pinch split — and
    the resulting triangles still tile the intended interior exactly.
    A genuinely self-CROSSING ring (ambiguous interior) still raises."""
    from pygridmap_ray.geom.kernels import (
        ring_signed_area, triangulate_ring,
    )

    # self-touching hourglass: vertex (1,1) appears twice non-adjacent
    pinch = np.array(
        [(0, 0), (2, 0), (1, 1), (2, 2), (0, 2), (1, 1)], float
    )
    tris = triangulate_ring(pinch)
    assert len(tris) == 2
    assert sum(ring_signed_area(t) for t in tris) == 2.0

    # duplicate vertices + an out-and-back spike on a 2x2 square
    degen = np.array(
        [(0, 0), (1, 0), (1, 0), (2, 0), (1.5, 0.0), (2, 0), (2, 2),
         (0, 2)], float
    )
    tris = triangulate_ring(degen)
    assert abs(sum(ring_signed_area(t) for t in tris) - 4.0) < 1e-12

    # zero-area (fully collinear) ring drops to no triangles
    assert triangulate_ring(
        np.array([(0, 0), (1, 1), (2, 2)], float)
    ) == []

    # a crossing ring with no ear anywhere still raises (interior is
    # ambiguous; the parity kernels own the even-odd reading)
    crossing = np.array(
        [[0.4, 3.0], [1.0, 0.6], [1.3, 0.3], [2.7, 3.2], [3.9, 2.5],
         [0.9, 2.2], [2.2, 0.9]], float
    )
    with pytest.raises(ValueError, match="no ear found"):
        triangulate_ring(crossing)

    # simple rings are untouched by the wrapper
    sq = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], float)
    assert len(triangulate_ring(sq)) == 2


def test_poly_overlay_degenerate_clip_heals(ray_session):
    """A degenerate CLIP polygon (duplicate vertices + self-touching
    pinch) used to raise in poly_overlay's driver-side triangulation;
    it must now overlay with the same areas as the equivalent clean
    two-triangle clip layer."""
    import ray.data as rd

    from pygridmap_ray.overlay import poly_overlay

    subj = [{
        "poly_id": 0,
        "rings": [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]],
    }]
    # hourglass with a duplicated vertex thrown in
    dirty = [{
        "clip_id": 7,
        "ring": [[0, 0], [2, 0], [2, 0], [1, 1], [2, 2], [0, 2],
                 [1, 1]],
    }]
    clean = [
        {"clip_id": 7, "ring": [[0, 0], [2, 0], [1, 1]]},
        {"clip_id": 7, "ring": [[1, 1], [2, 2], [0, 2]]},
    ]

    def run(clips):
        return (
            poly_overlay(rd.from_items(subj), clips)
            .to_pandas()
            .groupby("clip_id", as_index=False)["area"].sum()
        )

    a, b = run(dirty), run(clean)
    assert a.equals(b)
    assert float(a["area"].iloc[0]) == 2.0


def test_keyed_prefix_sum_empty_input_schema(ray_session):
    """Empty corpora keep the promised output schema: keyed_prefix_sum
    adds out_col, token_budget_take adds cum_tokens + kept (map_batches
    UDFs never run on zero-row blocks, so the schema must be declared
    explicitly on the empty path)."""
    import ray.data as rd

    from pygridmap_ray.pack import keyed_prefix_sum, token_budget_take

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()),
    }))
    out = keyed_prefix_sum(
        empty, key_col="source", order_col="doc_id",
        value_col="n_tokens",
    )
    assert out.count() == 0
    assert list(out.schema().names) == [
        "doc_id", "source", "n_tokens", "cum"
    ]
    tb = token_budget_take(empty, budget=100)
    assert tb.count() == 0
    assert list(tb.schema().names) == [
        "doc_id", "source", "n_tokens", "cum_tokens", "kept"
    ]

    from pygridmap_ray.pack import global_prefix_sum, pack_sequences

    gp = global_prefix_sum(
        empty, order_col="doc_id", value_col="n_tokens"
    )
    assert gp.count() == 0
    assert list(gp.schema().names) == [
        "doc_id", "source", "n_tokens", "start"
    ]
    pk = pack_sequences(empty, cap=64)
    assert pk.count() == 0
    assert list(pk.schema().names) == [
        "doc_id", "n_tokens", "seq_id", "seq_off", "n_seqs"
    ]

    # pandas-block empty inputs carry `object` string columns whose
    # schema type is the literal `object` class — must map to string,
    # not crash (code-review finding)
    import pandas as pd

    empty_pd = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "source": pd.Series([], dtype=object),
        "n_tokens": pd.Series([], dtype="int64"),
    }))
    tb2 = token_budget_take(empty_pd, budget=10)
    assert tb2.count() == 0
    assert list(tb2.schema().names) == [
        "doc_id", "source", "n_tokens", "cum_tokens", "kept"
    ]


def test_round5_packed_key_guards(ray_session):
    """The new packed-key ops fail LOUDLY outside their id contracts
    instead of silently corrupting output (code-review findings)."""
    import ray.data as rd

    from pygridmap_ray.multimodal import media_dup_groups
    from pygridmap_ray.synth import build_spans_array
    from pygridmap_ray.text import winnow_dup_pairs

    shared = " ".join(f"s{i}" for i in range(20))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1 << 31, (1 << 31) + 1], pa.int64()),
        "text": pa.array([shared, shared], pa.string()),
    }))
    with pytest.raises(Exception, match="remap ids"):
        winnow_dup_pairs(docs).to_pandas()

    big = np.array([1 << 40, (1 << 40) + 3], np.int64)
    media = rd.from_arrow(pa.table({
        "doc_id": pa.array(big),
        "spans": build_spans_array(big),
    }))
    with pytest.raises(Exception, match="remap ids"):
        media_dup_groups(media).to_pandas()
