"""Property tests: the round-3 sampling / window / focal family.

Invariants that must hold under ANY partitioning (the content-stable
contract): priority-sample membership, focal mass conservation,
percent_rank bounds.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n=400, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array(rng.randint(1, 500, n).astype(np.int64)),
        }
    )


@pytest.mark.parametrize("blocks", [1, 3, 17])
def test_priority_sample_partition_invariant(ray_session, blocks):
    import ray.data as rd

    from pygridmap_ray.stats import priority_sample

    t = _docs_table()
    ds = rd.from_arrow(t).repartition(blocks)
    out = (
        priority_sample(ds, key_col="doc_id", weight_col="n_chars", k=25)
        .to_pandas()
        .sort_values("rank", ignore_index=True)
    )
    assert len(out) == 25
    # membership is a pure function of content: recompute the law locally
    import hashlib

    w = t["n_chars"].to_numpy()
    h = np.array(
        [
            int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
            for d in t["doc_id"].to_numpy()
        ],
        dtype=np.int64,
    )
    pri = w.astype(np.float64) * float(1 << 60) / (h + 1).astype(np.float64)
    expect = t["doc_id"].to_numpy()[np.lexsort((t["doc_id"].to_numpy(), -pri))][:25]
    assert out["doc_id"].tolist() == expect.tolist()


def test_priority_sample_k_exceeds_n(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import priority_sample

    ds = rd.from_arrow(_docs_table(n=6))
    out = priority_sample(ds, key_col="doc_id", weight_col="n_chars", k=50)
    df = out.to_pandas()
    assert len(df) == 6
    assert df["rank"].tolist() == [1, 2, 3, 4, 5, 6]


def test_zero_weight_rows_lose(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import priority_sample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(10, dtype=np.int64)),
            "n_chars": pa.array(
                np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], dtype=np.int64)
            ),
        }
    )
    out = priority_sample(
        rd.from_arrow(t), key_col="doc_id", weight_col="n_chars", k=5
    ).to_pandas()
    # all weighted rows outrank every zero-weight row
    assert sorted(out["doc_id"].tolist()) == [5, 6, 7, 8, 9]


@pytest.mark.parametrize("blocks", [1, 5])
def test_focal_mass_conservation(ray_session, blocks):
    import ray.data as rd

    from pygridmap_ray.focal import focal_counts

    rng = np.random.RandomState(3)
    ix = rng.randint(0, 12, 300).astype(np.int64)
    iy = rng.randint(0, 12, 300).astype(np.int64)
    ds = rd.from_arrow(pa.table({"ix": pa.array(ix), "iy": pa.array(iy)})).repartition(
        blocks
    )
    out = focal_counts(ds).to_pandas()
    # every point lands in exactly one occupied cell
    assert out["n_docs"].sum() == 300
    # a cell's focal sum includes itself
    assert (out["focal_sum"] >= out["n_docs"]).all()
    # partitioning must not change anything (content-stable law)
    out1 = focal_counts(
        rd.from_arrow(pa.table({"ix": pa.array(ix), "iy": pa.array(iy)}))
    ).to_pandas()
    a = out.sort_values(["ix", "iy"], ignore_index=True)
    b = out1.sort_values(["ix", "iy"], ignore_index=True)
    assert a.equals(b)


def test_percent_rank_bounds_and_edges(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import percent_rank

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(7, dtype=np.int64)),
            "lang": pa.array(["en"] * 5 + ["de"] + ["fr"]),
            "n_chars": pa.array(np.array([5, 1, 5, 9, 3, 4, 8], dtype=np.int64)),
        }
    )
    out = (
        percent_rank(rd.from_arrow(t), group_col="lang", value_col="n_chars")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # en values [5,1,5,9,3]: ranks-1 = [2,0,2,4,1] over n-1=4
    assert out.loc[0, "pct_rank"] == 0.5
    assert out.loc[1, "pct_rank"] == 0.0
    assert out.loc[3, "pct_rank"] == 1.0
    assert out.loc[4, "pct_rank"] == 0.25
    # singleton groups are 0 (SQL edge)
    assert out.loc[5, "pct_rank"] == 0.0 and out.loc[6, "pct_rank"] == 0.0


def test_percent_rank_and_iqr_with_int_group_keys(ray_session):
    """Broadcast dicts must hit for NON-string group keys too (the scan
    side casts keys to string; the build side must match)."""
    import ray.data as rd

    from pygridmap_ray.stats import iqr_outliers, percent_rank

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 10.0, 10.0, 99.0]),
        }
    )
    pr = (
        percent_rank(rd.from_arrow(t), group_col="g", value_col="v")
        .to_pandas()
    )
    # non-degenerate ranks prove the broadcast lookup hit
    assert pr["pct_rank"].max() == 1.0 and pr["pct_rank"].min() == 0.0
    out = iqr_outliers(rd.from_arrow(t), key="g", value="v").to_pandas()
    out = out.sort_values("g", ignore_index=True)
    assert out["n_events"].tolist() == [4, 4]
    # group 2: q1=10, q3=32.25ish -> 99 is beyond the upper fence
    assert out.loc[1, "n_outliers"] >= 1


def test_ntile_fill_law(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import ntile

    # 10 rows, n=4 -> tiles of 3,3,2,2 (first cnt%n tiles get the extra)
    t = pa.table(
        {
            "g": pa.array(["a"] * 10 + ["b"] * 2 + ["c"], pa.string()),
            "v": pa.array(list(range(10)) + [5, 1] + [9], pa.int64()),
            "id": pa.array(list(range(13)), pa.int64()),
        }
    )
    out = (
        ntile(rd.from_arrow(t), group_col="g", order_col="v",
              tiebreak_col="id", n=4)
        .to_pandas()
        .sort_values(["g", "v", "id"], ignore_index=True)
    )
    a = out[out["g"] == "a"]["tile"].tolist()
    assert a == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # cnt < n: tiles 1..cnt
    b = out[out["g"] == "b"].sort_values("v")["tile"].tolist()
    assert b == [1, 2]
    assert out[out["g"] == "c"]["tile"].tolist() == [1]


def test_iqr_outliers_approx_mode(ray_session):
    """fences='approx' (fixed-bin sketch quartiles) must flag the same
    far outlier as exact mode and stay within a bin width elsewhere."""
    import ray.data as rd

    from pygridmap_ray.stats import iqr_outliers

    rng = np.random.RandomState(11)
    v = np.concatenate([rng.uniform(10, 20, 500), [400.0, 450.0]])
    t = pa.table(
        {
            "g": pa.array(["a"] * len(v), pa.string()),
            "v": pa.array(v),
        }
    )
    exact = iqr_outliers(rd.from_arrow(t), key="g", value="v").to_pandas()
    approx = iqr_outliers(
        rd.from_arrow(t), key="g", value="v",
        fences="approx", lo=0.0, hi=512.0, bins=128,
    ).to_pandas()
    assert exact["n_outliers"].iloc[0] == 2
    assert approx["n_outliers"].iloc[0] == 2  # far outliers robust to 4-wide bins
    assert approx["n_events"].iloc[0] == exact["n_events"].iloc[0] == 502


def test_events_trajectory_matches_pandas(ray_session, sf_dir):
    import duckdb

    from pygridmap_ray.pipelines.relational import events_trajectory
    from pygridmap_ray.synth import derive_xy

    out = (
        events_trajectory(sf_dir)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).df()
    x, y = derive_xy(ev["event_id"].to_numpy(np.int64))
    ev = ev.assign(x=x, y=y).sort_values(["user_id", "us", "event_id"])
    expect = []
    for uid, g in ev.groupby("user_id", sort=True):
        dx = np.diff(g["x"].to_numpy())
        dy = np.diff(g["y"].to_numpy())
        plen = float(np.sum(np.sqrt(dx * dx + dy * dy)))
        expect.append((uid, len(g), np.floor(abs(plen) * 1e2 + 0.5) / 1e2))
    assert len(out) == len(expect)
    for (uid, n, plen), row in zip(expect, out.itertuples(index=False)):
        assert row.user_id == uid and row.n_events == n
        assert abs(row.path_len - plen) < 1e-9
