"""sf0.1 oracle sweep: every query runs engine-side; oracle compare for
all except the known-quadratic DuckDB twins (pair generators whose SQL
is O(n^2) at sf0.1 — those stay oracle-gated at sf0.01 and run
rows-only here).  cd /root/repo && python scripts/sweep_oracle_sf01.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as e  # noqa: E402
import duckdb  # noqa: E402

SF = "/root/testdata/sf0.1"
QUADRATIC = {
    "minhash_lsh", "ngram_jaccard", "simhash_pairs", "simhash_screen",
    "embedding_neardup", "embedding_lsh", "corpus_curate", "llm_prepare",
    "tfidf_pairs", "dedup_lines", "dedup_lines_nl", "decon_neardup",
    "neardup_cluster", "neardup_keep_best", "dup_clusters",
    "cross_snapshot_dups", "semdedup", "record_link", "fuzzy_vocab",
    "contamination_overlap", "dup_gram_coverage", "knox_test",
    "st_dbscan", "mmr_select", "hard_negatives", "poly_adjacency",
    "mutual_nn", "sphere_nn", "traj_dtw", "traj_frechet",
    "traj_hausdorff", "ripley_k", "g_function", "f_function",
    "events_coloc", "variogram", "variogram_dir", "correlogram",
    "clark_evans", "knn", "knn_loo_r2", "nearest_hub", "sq8_recall",
    "pq_recall", "ann_recall", "trunc_recall", "co_occurrence",
    "colocation_quotient",
}
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")

qs, oq = e.queries(), e.oracle_sql()
names = sys.argv[1:] or list(qs)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    key = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.iloc[0], (list, np.ndarray)
        ):
            key[c] = col.map(lambda v: json.dumps(np.asarray(v).tolist()))
        else:
            key[c] = col
    order = key.sort_values(list(df.columns), kind="stable").index
    return df.loc[order].reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype == object and len(x) and isinstance(
            x.iloc[0], (list, np.ndarray)
        ):
            xs = x.map(lambda v: json.dumps(np.asarray(v).tolist()))
            ys = y.map(lambda v: json.dumps(np.asarray(v).tolist()))
            if not (xs.to_numpy() == ys.to_numpy()).all():
                return False
        elif x.dtype.kind == "f" or (hasattr(y, "dtype")
                                     and y.dtype.kind == "f"):
            xv = x.to_numpy(dtype=float)
            yv = y.to_numpy(dtype=float)
            same = (np.isnan(xv) & np.isnan(yv)) | (xv == yv)
            if not same.all():
                return False
        else:
            if not (x.astype(str).to_numpy()
                    == y.astype(str).to_numpy()).all():
                return False
    return True

results, bad = {}, []
n_oracle = 0
t_all = time.time()
for i, name in enumerate(names):
    t0 = time.time()
    try:
        got = qs[name](SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        if name not in oq or name in QUADRATIC:
            results[name] = {"ok": True, "rows": len(got), "oracle": False}
            print(f"[{i+1}/{len(names)}] {name}: rows-only {len(got)}",
                  flush=True)
            continue
        # per-oracle timeout: an unlisted quadratic twin must not stall
        # the sweep — interrupt DuckDB and record rows-only instead
        import threading

        timer = threading.Timer(90.0, con.interrupt)
        timer.start()
        try:
            exp = con.sql(oq[name]).df()
        except Exception as oex:  # noqa: BLE001
            if "INTERRUPT" in repr(oex).upper() or "interrupted" in repr(oex).lower():
                results[name] = {"ok": True, "rows": len(got),
                                 "oracle": "timeout-90s"}
                print(f"[{i+1}/{len(names)}] {name}: rows-only "
                      f"(oracle timeout) {len(got)}", flush=True)
                continue
            raise
        finally:
            timer.cancel()
        g, x = canon(got), canon(exp)
        ok = (len(g) == len(x) and list(g.columns) == list(x.columns)
              and values_equal(g, x))
        n_oracle += 1
        results[name] = {"ok": bool(ok), "rows": len(g),
                         "sec": round(time.time() - t0, 2)}
        if not ok:
            bad.append(name)
        print(f"[{i+1}/{len(names)}] {name}: "
              f"{'OK' if ok else 'MISMATCH'} {len(g)} rows", flush=True)
    except Exception as ex:  # noqa: BLE001
        bad.append(name)
        results[name] = {"ok": False, "err": repr(ex)[:300]}
        print(f"[{i+1}/{len(names)}] {name}: ERROR {ex!r}", flush=True)

json.dump(results, open("/tmp/sweep_sf01_results.json", "w"), indent=1)
n_ok = sum(1 for r in results.values() if r["ok"])
print(f"TOTAL {n_ok}/{len(names)} ok ({n_oracle} oracle-compared) "
      f"in {time.time()-t_all:.0f}s; bad={bad}", flush=True)
ray.shutdown()
