"""Driver-contract simulation: run every queries() entry at sf0.001 and
compare against its oracle_sql() twin the way the driver does (row count,
schema names, order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    importlib.reload(e)
    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # list-valued cells (qvec, spans) are unsortable/unhashable in
            # pandas — canonicalize to their string form before sorting
            df[c] = df[c].map(
                lambda v: str(np.asarray(v).tolist())
                if isinstance(v, (list, np.ndarray))
                else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) >= 0
    assert "spans" in df.columns and "poly_id" in df.columns
    # spans survived with per-row structure
    row = df.iloc[0]
    assert isinstance(row["spans"], (list, np.ndarray))


def test_every_query_has_matching_oracle_or_is_declared(entrymod):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)


@pytest.mark.parametrize(
    "name",
    [
        "cell_assign",
        "cell_assign_offset",
        "tiling_bounds",
        "spatial_join",
        "spatial_join_left",
        "spatial_join_hash",
        "grid_make",
        "grid_make_interior",
        "grid_make_rect",
        "overlay_intersection",
        "overlay_union",
        "area_interpolate",
        "poly_overlay",
        "poly_overlay_concave",
        "kmeans",
        "quantize_emb",
        "grid_aggregation",
        "focal_mean",
        "cell_clusters",
        "cell_majority",
        "token_entropy",
        "weighted_sample",
        "weighted_sample_group",
        "iqr_outliers",
        "percent_rank",
        "ntile",
        "window_ranks",
        "grouped_corr",
        "events_transitions",
        "events_ewma",
        "grouped_mode",
        "cube",
        "degree_hist",
        "co_occurrence",
        "events_rolling_users",
        "jsonl_roundtrip",
        "histogram",
        "keyword_search",
        "full_outer",
        "set_intersect",
        "set_except",
        "grouped_mad",
        "events_latest",
        "chunk_documents",
        "bucketed_join",
        "pareto",
        "events_gap_fill",
        "spearman",
        "dup_gram_coverage",
        "knn",
        "spans_roundtrip",
        "token_count",
        "quality_score",
        "lang_id",
        "fingerprint",
        "rolling_fp",
        "simhash",
        "exact_dedup",
        "minhash_lsh",
        "ngram_jaccard",
        "neardup_keep_best",
        "embedding_neardup",
        "ann_topk",
        "ivf_topk",
        "ivf_pruned",
        "raster_cells",
        "raster_resample",
        "frame_rowsum",
        "media_features",
        "media_features_vec",
        "events_window",
        "events_sessionize",
        "q1_pricing",
        "top_customers",
        "q4_priority",
        "q6_revenue",
        "q10_returned",
        "q14_promo",
        "q18_large_orders",
        "q19_discount",
        "semdedup",
        "q7_volume",
        "q8_market_share",
        "q13_custdist",
        "q15_top_supplier",
        "q22_lapsed",
        "gopher_rules",
        "ccnet_buckets",
        "path_cell_length",
        "events_watermark",
        "q17_small_qty",
        "q21_waiting",
        "ann_recall",
        "sq8_recall",
        "trunc_recall",
        "simhash_screen",
        "q2_min_cost",
        "q9_profit",
        "q11_important",
        "q12_late_priority",
        "q16_supplier_cnt",
        "q20_excess",
        "bfs_hops",
        "pq_recall",
        "lsh_screen",
    ],
)
def test_query_matches_oracle(entrymod, con, name):
    got = _canon(_to_pandas(entrymod.queries()[name](SF)))
    exp = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            g = g.to_numpy(dtype=float)
            e = e.to_numpy(dtype=float)
            ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) <= 1e-6)
            assert ok.all(), f"{name}.{c}: max diff {np.nanmax(np.abs(g - e))}"
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), f"{name}.{c}"


def test_no_duplicate_defs_or_registry_keys():
    """Python dict literals silently keep the LAST duplicate key and
    later same-name defs shadow earlier ones — both bit this repo in
    round 4 (q_join_counts, q_table_profile).  Pin: no module in the
    pipeline surface has duplicate top-level defs, and the queries()/
    oracle_sql() registries are built from unique keys."""
    import re
    from collections import Counter
    from pathlib import Path

    root = Path(__file__).resolve().parents[1] / "pygridmap_ray"
    for mod in root.rglob("*.py"):
        defs = re.findall(
            r"^def ([a-zA-Z0-9_]+)\(", mod.read_text(), re.M
        )
        dups = [k for k, c in Counter(defs).items() if c > 1]
        assert not dups, f"{mod}: duplicate top-level defs {dups}"
    qsrc = (root / "pipelines" / "queries.py").read_text()
    qkeys = re.findall(r'^\s{8}"([a-z0-9_]+)": q_', qsrc, re.M)
    dups = [k for k, c in Counter(qkeys).items() if c > 1]
    assert not dups, f"duplicate queries() keys: {dups}"


def test_no_literal_bucket_widths():
    """Shuffle widths must derive from the cluster, never sit at a
    laptop literal (a constant caps parallelism on 256 nodes), and the
    count must be resolved ON THE DRIVER and captured — a worker-side
    cache (the removed ``auto_num_buckets``) can diverge across an
    elastic-cluster resize and silently split coarse groups.  Pin both:
    no ``_bucket_of(x, <int literal>)`` call and no worker-side
    resolver name anywhere in the engine source."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1] / "pygridmap_ray"
    offenders = []
    for mod in root.rglob("*.py"):
        # comments may explain the removed resolver; only code counts
        txt = "\n".join(
            ln for ln in mod.read_text().splitlines()
            if not ln.lstrip().startswith("#")
        )
        for m in re.finditer(r"_bucket_of\([^()]*,\s*(\d+)\s*\)", txt):
            offenders.append(f"{mod.name}: literal width {m.group(0)}")
        for name in ("auto_num_buckets", "_auto_nb"):
            if re.search(rf"\b{name}\b", txt):
                offenders.append(f"{mod.name}: worker-side resolver {name}")
    assert not offenders, offenders


def test_no_library_ray_init():
    """Sessions belong to the caller: no library module or
    __ray_entry__ may call ray.init — the only sanctioned site is the
    CLI entry point, and that one must sit behind an
    is_initialized guard (checked textually)."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    offenders = []
    for mod in list((root / "pygridmap_ray").rglob("*.py")) + [
        root / "__ray_entry__.py"
    ]:
        txt = mod.read_text()
        for m in re.finditer(r"^\s*ray\.init\(", txt, re.M):
            if mod.name == "cli.py":
                # must be preceded by an is_initialized early-return
                pre = txt[: m.start()]
                assert "is_initialized" in pre.rsplit("def ", 1)[-1], (
                    "cli.py ray.init lacks the is_initialized guard"
                )
                continue
            offenders.append(str(mod))
    assert not offenders, f"library ray.init in: {offenders}"
