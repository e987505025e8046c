"""Behavioral tests for the non-SQL-expressible dedup/similarity paths:
planted duplicates must be found; IVF recall vs the exact baseline."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    import ray.data as rd

    base = [
        # long doc so a 1-word edit keeps shingle-jaccard ~0.9 (16x4 LSH
        # banding then catches it with probability ~1)
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills and the river flows gently "
        "through the quiet valley toward the distant shining sea tonight",
        "completely different content about spatial grids and overlays here",
        "a third document with its own unrelated words for the corpus",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
    # near-dup of doc 0 (one word changed) and exact dup of doc 1
    rows.append({"doc_id": 10, "text": base[0].replace("lazy", "sleepy")})
    rows.append({"doc_id": 11, "text": base[1]})
    # unrelated filler
    for i in range(20, 40):
        rows.append({"doc_id": i, "text": f"filler text number {i} with unique tokens {i * 7} {i * 13}"})
    return rd.from_pandas(pd.DataFrame(rows))


def test_minhash_finds_planted_neardup(dup_docs):
    from pygridmap_ray.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(dup_docs, jaccard_threshold=0.4).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 10) in found  # near-dup
    assert (1, 11) in found  # exact dup (jaccard 1.0)
    exact = pairs[(pairs.id_a == 1) & (pairs.id_b == 11)]
    assert exact["jaccard"].iloc[0] == 1.0
    # filler docs must NOT pair with each other
    filler = pairs[(pairs.id_a >= 20)]
    assert len(filler) == 0


def test_minhash_hot_cluster_bounded(ray_session):
    """A planted cluster of 3000 identical docs (the web-boilerplate case)
    must complete fast: the verify stage collapses identical signatures to
    ONE unique row per bucket and emits the member pairs vectorized in a
    single canonical band, so cost is O(u^2 + pairs), never O(m^2) Python
    pair checks per band."""
    import time

    import ray.data as rd

    m = 3000
    rows = [{"doc_id": i, "text": "common boilerplate page body " * 4} for i in range(m)]
    rows += [
        {"doc_id": m + i, "text": f"unique doc {i} tokens {i * 3} {i * 11} {i * 17}"}
        for i in range(50)
    ]
    from pygridmap_ray.dedup import minhash_lsh_pairs

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        rd.from_pandas(pd.DataFrame(rows)), jaccard_threshold=0.5
    ).to_pandas()
    elapsed = time.time() - t0
    cluster = pairs[(pairs.id_a < m) & (pairs.id_b < m)]
    assert len(cluster) == m * (m - 1) // 2
    assert (cluster["jaccard"] == 1.0).all()
    # unique docs never pair with the cluster or each other
    assert len(pairs) == len(cluster)
    # generous bound: the O(m^2)-per-band regression this guards took
    # minutes; the healthy path runs ~35-60s depending on the host's
    # documented 1.8x throughput drift (memory: bench-noise-protocol)
    assert elapsed < 120, f"hot cluster took {elapsed:.1f}s"


def test_ngram_jaccard_exact_values(dup_docs):
    from pygridmap_ray.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(dup_docs, threshold=0.3).to_pandas()
    found = {(a, b): j for a, b, j in zip(pairs.id_a, pairs.id_b, pairs.jaccard)}
    assert found[(1, 11)] == 1.0
    assert 0.3 <= found[(0, 10)] < 1.0


def test_simhash_hamming_close_for_neardups(dup_docs):
    from pygridmap_ray.dedup import simhash64

    df = (
        dup_docs.map_batches(simhash64, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    ham = bin(int(df.loc[0, "simhash"]) ^ int(df.loc[10, "simhash"])).count("1")
    assert ham <= 12  # near-dups land close
    assert int(df.loc[1, "simhash"]) == int(df.loc[11, "simhash"])  # exact
    ham_far = bin(int(df.loc[0, "simhash"]) ^ int(df.loc[2, "simhash"])).count("1")
    assert ham_far > ham


def test_ivf_recall_vs_exact(ray_session):
    import ray.data as rd

    from pygridmap_ray.ann import ann_topk, ivf_topk, kmeans_lite

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    queries = {"ids": ids[:10], "matrix": mat[:10]}
    ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = ann_topk(ds, queries, k=5).to_pandas()
    cents = kmeans_lite(mat, n_clusters=8)
    approx = ivf_topk(ds, queries, cents, k=5, nprobe=4).to_pandas()
    # recall@5 of the bucketed path vs the exact baseline
    rec = []
    for q in range(10):
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.5, rec
    # self is always rank 1 with cosine 1 in the exact path
    r1 = exact[exact["rank"] == 1]
    assert (r1["query_id"].to_numpy() == r1["neighbor_id"].to_numpy()).all()


def test_ivf_pruned_read(ray_session, tmp_path):
    """ivf_build writes a bucket-partitioned tree; ivf_search_pruned reads
    ONLY the probed bucket dirs and still reaches good recall."""
    import glob

    import ray.data as rd

    from pygridmap_ray.ann import ann_topk, ivf_build, ivf_search_pruned, kmeans_lite

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    cents = kmeans_lite(mat, n_clusters=8)
    ds = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    n = ivf_build(ds, cents, idx)
    assert n == len(ids)
    assert len(glob.glob(f"{idx}/bucket=*")) >= 2
    q = {"ids": ids[:10], "matrix": mat[:10]}
    pruned = ivf_search_pruned(idx, q, cents, k=5, nprobe=4).to_pandas()
    exact = ann_topk(ds, q, k=5).to_pandas()
    rec = np.mean(
        [
            len(
                set(exact[exact.query_id == i].neighbor_id)
                & set(pruned[pruned.query_id == i].neighbor_id)
            )
            / 5
            for i in range(10)
        ]
    )
    assert rec >= 0.5, rec


def test_kmeans_partition_invariance_and_laws(ray_session):
    """kmeans_embeddings is content-stable: identical clusters under any
    input partitioning; every planted tight blob lands in one cluster."""
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.ann import kmeans_embeddings

    rng = np.random.default_rng(0)
    k, d, per = 4, 8, 30
    centers = rng.normal(0, 10, (k, d))
    blobs = np.concatenate(
        [c + rng.normal(0, 0.05, (per, d)) for c in centers]
    )
    # interleave blobs so the deterministic init (lowest k ids) seeds one
    # centroid per blob — ids i belong to blob i % k
    order = np.arange(len(blobs)).reshape(k, per).T.ravel()
    X = blobs[order]
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )

    def run(nparts):
        out = (
            kmeans_embeddings(
                rd.from_arrow(t).repartition(nparts),
                k=k, iters=3,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        return out

    a, b = run(2), run(7)
    assert a.equals(b)
    lab = a["cluster"].to_numpy()
    for blob in range(k):
        assert len(set(lab[blob::k])) == 1  # row i is in blob i % k


def test_quantize_embeddings_bounds_and_reconstruction(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.ann import quantize_embeddings

    rng = np.random.default_rng(1)
    X = rng.normal(0, 3, (200, 6))
    X[:, 5] = 7.25  # constant dim -> quantizes to 0
    t = pa.table(
        {
            "vec_id": np.arange(200, dtype=np.int64),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    out = (
        quantize_embeddings(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack(out["qvec"].to_numpy())
    assert Q.min() >= 0 and Q.max() <= 255
    assert (Q[:, 5] == 0).all()
    mn, mx = X[:, :5].min(axis=0), X[:, :5].max(axis=0)
    rec = Q[:, :5] / 255.0 * (mx - mn) + mn
    assert np.abs(rec - X[:, :5]).max() <= (mx - mn).max() / 255.0


def test_semdedup_chunked_scan_matches_bruteforce(ray_session):
    """The per-cluster scan must never need the full gram: a cluster far
    larger than the slab fence (slab_bytes tiny -> many row blocks) must
    produce EXACTLY the min-id-keeper law of a brute-force full gram,
    and agree with the single-slab run."""
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.ann import _normalize
    from pygridmap_ray.dedup import semdedup

    rng = np.random.default_rng(7)
    n, dim, tau = 300, 8, 0.92
    # planted near-dup families on a noisy background
    base = rng.normal(0, 1, (30, dim))
    X = np.concatenate([base + rng.normal(0, 0.02, (30, dim)) for _ in range(10)])
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    small = (
        semdedup(ds, k=1, iters=1, tau=tau, slab_bytes=1 << 10)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    big = (
        semdedup(ds, k=1, iters=1, tau=tau, slab_bytes=1 << 30)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (small["removed"] == big["removed"]).all()
    # brute-force oracle: k=1 puts everything in one cluster, so removed[j]
    # iff any i < j has cosine >= tau
    E = _normalize(X)
    sims = E @ E.T
    expect = np.triu(sims >= tau, k=1).any(axis=0)
    assert (small["removed"].to_numpy() == expect).all()
    # multi-slab path really ran: fence forces ceil(n*8*n/2^10) > 1 blocks
    assert (1 << 10) // (n * 8) < n


def test_semdedup_derived_k_default(ray_session):
    """k=None derives the SemDeDup cluster count from corpus size (floor
    8 at test scale) and still emits one row per input vector."""
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.dedup import semdedup

    rng = np.random.default_rng(3)
    n = 120
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(
                list(rng.normal(0, 1, (n, 6))), pa.list_(pa.float64())
            ),
        }
    )
    out = semdedup(rd.from_arrow(t), tau=0.99).to_pandas()
    assert len(out) == n
    assert set(out.columns) == {"vec_id", "cluster", "removed"}
    assert out["cluster"].nunique() <= 8


def test_dedup_lines_newline_splitter(ray_session):
    """splitter='newline': real \\n lines dedup at their global first
    (doc_id, idx) occurrence; docs reassemble with \\n; fully-redundant
    docs drop out."""
    import pandas as pd
    import ray.data as rd

    from pygridmap_ray.dedup import dedup_lines

    rows = [
        {"doc_id": 0, "text": "alpha\nbeta\ngamma"},
        {"doc_id": 1, "text": "beta\ndelta"},      # beta dies (doc 0 first)
        {"doc_id": 2, "text": "alpha\nbeta"},      # fully redundant -> drops
        {"doc_id": 3, "text": ""},                  # one empty line, first
        {"doc_id": 4, "text": "\ndelta"},           # empty line dies (doc 3)
    ]
    out = (
        dedup_lines(
            rd.from_pandas(pd.DataFrame(rows)), splitter="newline"
        )
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert list(out.index) == [0, 1, 3]
    assert out.loc[0, "text_kept"] == "alpha\nbeta\ngamma"
    assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_kept"] == 3
    assert out.loc[1, "text_kept"] == "delta"
    assert out.loc[1, "n_lines"] == 2 and out.loc[1, "n_kept"] == 1
    assert out.loc[3, "text_kept"] == "" and out.loc[3, "n_kept"] == 1
