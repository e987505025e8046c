"""Full queries() vs oracle_sql() sweep at sf0.01 (driver-style compare).

Usage: cd /root/repo && python scripts/sweep_oracle.py [name ...]
With names: run only those queries.  Without: run all.
Writes /tmp/sweep_results.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")  # before ray.init: workers inherit

import numpy as np
import pandas as pd

import ray

ray.init(address="local", num_cpus=int(__import__("os").environ.get("SWEEP_CPUS", 32)), include_dashboard=False,
         logging_level="ERROR")

import __ray_entry__ as e  # noqa: E402
import duckdb  # noqa: E402

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")

qs, oq = e.queries(), e.oracle_sql()
names = sys.argv[1:] or list(qs)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list columns are unsortable; stringify for the sort key only
    key = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.iloc[0], (list, np.ndarray)
        ):
            key[c] = col.map(lambda v: json.dumps(
                np.asarray(v).tolist()))
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
t_all = time.time()
for i, name in enumerate(names):
    t0 = time.time()
    try:
        got = qs[name](SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        if name not in oq:
            results[name] = {"ok": True, "rows": len(got),
                             "oracle": False,
                             "sec": round(time.time() - t0, 2)}
            print(f"[{i+1}/{len(names)}] {name}: rows-only "
                  f"{len(got)} OK", flush=True)
            continue
        exp = con.sql(oq[name]).df()
        g, x = canon(got), canon(exp)
        ok_rows = len(g) == len(x)
        ok_schema = list(g.columns) == list(x.columns)
        ok_vals = ok_rows and ok_schema and values_equal(g, x)
        ok = ok_rows and ok_schema and ok_vals
        results[name] = {"ok": bool(ok), "rows": len(g),
                         "oracle_rows": len(x),
                         "schema": bool(ok_schema),
                         "sec": round(time.time() - t0, 2)}
        if not ok:
            bad.append(name)
            print(f"[{i+1}/{len(names)}] {name}: MISMATCH "
                  f"rows {len(g)}/{len(x)} schema {ok_schema} "
                  f"cols {list(g.columns)[:6]} vs {list(x.columns)[:6]}",
                  flush=True)
        else:
            print(f"[{i+1}/{len(names)}] {name}: OK {len(g)} rows "
                  f"{results[name]['sec']}s", flush=True)
    except Exception as ex:  # noqa: BLE001
        bad.append(name)
        results[name] = {"ok": False, "err": repr(ex)[:300]}
        print(f"[{i+1}/{len(names)}] {name}: ERROR {ex!r}", flush=True)

json.dump(results, open("/tmp/sweep_results.json", "w"), indent=1)
n_ok = sum(1 for r in results.values() if r["ok"])
print(f"TOTAL {n_ok}/{len(names)} ok in {time.time()-t_all:.0f}s; "
      f"bad={bad}", flush=True)
ray.shutdown()
sys.exit(1 if bad else 0)
