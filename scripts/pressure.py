"""Mid-scale pressure run (VERDICT r4 #3): semdedup, minhash_lsh_pairs,
ngram_jaccard_pairs, ivf_search_pruned at >= 20M docs / >= 2M embeddings
under a memory-capped Ray session; records peak object-store usage and
spill volume.

Usage: cd /root/repo && python /tmp/pressure.py
Writes /tmp/pressure_results.json.
"""
import glob
import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa

import ray

OBJ_STORE_CAP = 4 << 30  # 4 GiB — far below the working sets, forces spill
N_DOCS = 20_000_000
N_EMB = 2_000_000
EMB_D = 64

ray.init(
    address="local",
    num_cpus=32,
    include_dashboard=False,
    logging_level="ERROR",
    object_store_memory=OBJ_STORE_CAP,
)
import ray.data as rd  # noqa: E402

rd.DataContext.get_current().enable_progress_bars = False


# --- peak object-store / spill sampler -------------------------------------
class Sampler:
    def __init__(self):
        self.peak_used = 0
        self.stop = False
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self):
        while not self.stop:
            avail = ray.available_resources().get("object_store_memory", 0)
            total = ray.cluster_resources().get("object_store_memory", 0)
            used = int(total - avail)
            if used > self.peak_used:
                self.peak_used = used
            time.sleep(0.2)

    def finish(self):
        self.stop = True
        self.t.join()
        return self.peak_used


def spilled_bytes() -> int:
    tot = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*"):
        for f in glob.glob(os.path.join(d, "*")):
            try:
                tot += os.path.getsize(f)
            except OSError:
                pass
    return tot


# --- deterministic corpora --------------------------------------------------
DOCS = "/tmp/pressure_docs"
EMB = "/tmp/pressure_emb"
VOCAB = np.array(
    [f"tok{i:04d}" for i in range(4096)], dtype=object
)


def make_docs():
    if os.path.exists(os.path.join(DOCS, "_done")):
        return

    def gen(b: pa.Table) -> pa.Table:
        did = np.asarray(b["id"], np.int64)
        # 12 tokens per doc, deterministic; every 1000th doc repeats the
        # text of doc_id-500 (planted near-exact dup family)
        base = np.where((did % 1000 == 0) & (did >= 500), did - 500, did)
        # splitmix64 doc key: token sequences of different docs must be
        # UNRELATED (a key linear in doc_id gives every doc shifted
        # token-window relatives — accidental near-dups corpus-wide)
        z = base.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        h = z[:, None] + np.arange(12, dtype=np.uint64)[None, :] * np.uint64(
            0x9E3779B97F4A7C15
        )
        h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
        idx = ((h ^ (h >> np.uint64(17))) % np.uint64(4096)).astype(np.int64)
        texts = [" ".join(VOCAB[r]) for r in idx]
        return pa.table(
            {
                "doc_id": pa.array(did),
                "text": pa.array(texts, pa.string()),
            }
        )

    ds = rd.range(N_DOCS, override_num_blocks=256)
    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=65536)
    ds.write_parquet(DOCS, mode="overwrite")
    open(os.path.join(DOCS, "_done"), "w").write("ok")


def make_emb():
    if os.path.exists(os.path.join(EMB, "_done")):
        return

    def gen(b: pa.Table) -> pa.Table:
        vid = np.asarray(b["id"], np.int64)
        # deterministic pseudo-gaussian: 32 well-separated modes + noise
        mode = vid % 32
        rs = np.random.RandomState(12345)
        centers = rs.normal(size=(32, EMB_D)) * 10.0
        noise = np.sin(
            (vid[:, None] * 2654435761 % 1_000_003)[:, None].astype(float)
            / 1_000_003.0 * 6.283
            * (np.arange(EMB_D)[None, None, :] + 1)
        ).reshape(len(vid), EMB_D)
        X = centers[mode] + noise
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "embedding": pa.array(
                    list(X.astype(np.float64)), pa.list_(pa.float64())
                ),
            }
        )

    ds = rd.range(N_EMB, override_num_blocks=128)
    ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=32768)
    ds.write_parquet(EMB, mode="overwrite")
    open(os.path.join(EMB, "_done"), "w").write("ok")


results = {}


def run(name, fn):
    s = Sampler()
    sp0 = spilled_bytes()
    t0 = time.time()
    out = fn()
    sec = time.time() - t0
    peak = s.finish()
    results[name] = {
        "sec": round(sec, 1),
        "peak_object_store_bytes": peak,
        "spilled_bytes_delta": spilled_bytes() - sp0,
        "result": out,
    }
    print(name, json.dumps(results[name]), flush=True)


def op_semdedup():
    from pygridmap_ray.dedup import semdedup

    ds = rd.read_parquet(EMB, file_extensions=["parquet"])
    out = semdedup(ds, tau=0.95)  # k derives from corpus: ~200 clusters
    removed = int(
        out.map_batches(
            lambda b: pa.table(
                {"r": pa.array([int(np.asarray(b["removed"]).sum())])}
            ),
            batch_format="pyarrow",
        ).sum("r")
    )
    n = out.count()
    return {"rows": n, "removed": removed}


def op_minhash():
    from pygridmap_ray.dedup import minhash_lsh_pairs

    ds = rd.read_parquet(DOCS, file_extensions=["parquet"])
    pairs = minhash_lsh_pairs(ds)
    return {"pairs": pairs.count()}


def op_ngram():
    from pygridmap_ray.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(DOCS, file_extensions=["parquet"])
    pairs = ngram_jaccard_pairs(ds)
    return {"pairs": pairs.count()}


def op_ivf():
    from pygridmap_ray.ann import ivf_build, ivf_search_pruned, kmeans_lite

    ds = rd.read_parquet(EMB, file_extensions=["parquet"])
    head = (
        ds.filter(lambda r: r["vec_id"] < 4096)
        .to_pandas()
        .sort_values("vec_id")
    )
    sample = np.stack([np.asarray(e, float) for e in head["embedding"]])
    cents = kmeans_lite(sample, 64)
    idx = "/tmp/pressure_ivf"
    ivf_build(ds, cents, idx)
    qids = head["vec_id"].to_numpy(np.int64)[:16]
    qmat = sample[:16]
    got = ivf_search_pruned(
        idx, {"ids": qids, "matrix": qmat}, cents, k=10, nprobe=4
    ).to_pandas()
    return {"rows": len(got)}


t_all = time.time()
print("synthesizing corpora...", flush=True)
make_docs()
make_emb()
print(f"corpora ready in {time.time()-t_all:.0f}s", flush=True)

ops = {
    "semdedup_2M": op_semdedup,
    "ivf_search_pruned_2M": op_ivf,
    "minhash_lsh_pairs_20M": op_minhash,
    "ngram_jaccard_pairs_20M": op_ngram,
}
sel = os.environ.get("PRESSURE_OPS")
for name, fn in ops.items():
    if sel and name not in sel.split(","):
        continue
    run(name, fn)

results["_meta"] = {
    "n_docs": N_DOCS,
    "n_emb": N_EMB,
    "emb_d": EMB_D,
    "object_store_cap_bytes": OBJ_STORE_CAP,
    "num_cpus": 32,
    "driver_peak_rss_kb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss,
    "total_sec": round(time.time() - t_all, 1),
}
json.dump(results, open("/tmp/pressure_results.json", "w"), indent=1)
print("DONE", json.dumps(results["_meta"]), flush=True)
ray.shutdown()
