"""Property-based tests for the order-aware joins: asof_join against a
single-frame pandas merge_asof ground truth, interval_join against a
brute-force scan — arbitrary key/time distributions, ties included."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pygridmap_ray.joins import asof_join, interval_join


def _mk(table):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(us):
    return pa.array(np.asarray(us, dtype="int64")).cast(pa.timestamp("us"))


@st.composite
def event_streams(draw):
    nl = draw(st.integers(1, 25))
    nr = draw(st.integers(0, 25))
    keyspace = draw(st.integers(1, 4))
    l_ts = draw(st.lists(st.integers(0, 500), min_size=nl, max_size=nl))
    r_ts = draw(st.lists(st.integers(0, 500), min_size=nr, max_size=nr))
    l_k = draw(st.lists(st.integers(0, keyspace), min_size=nl, max_size=nl))
    r_k = draw(st.lists(st.integers(0, keyspace), min_size=nr, max_size=nr))
    return l_ts, l_k, r_ts, r_k


@given(event_streams(), st.sampled_from(["backward", "forward"]))
@settings(max_examples=12, deadline=None, derandomize=True)
def test_asof_matches_pandas_ground_truth(ray_session, streams, direction):
    l_ts, l_k, r_ts, r_k = streams
    nl, nr = len(l_ts), len(r_ts)
    left = _mk(
        {
            "ts": _ts(l_ts),
            "user_id": np.asarray(l_k, dtype=np.int64),
            "v": np.arange(nl, dtype=np.float64),
        }
    )
    right = _mk(
        {
            "ts": _ts(r_ts),
            "user_id": np.asarray(r_k, dtype=np.int64),
            "w": np.arange(nr, dtype=np.float64) + 1000.0,
        }
    )
    got = (
        asof_join(left, right, on="ts", by="user_id", direction=direction)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    lf = pd.DataFrame(
        {
            "ts": pd.to_datetime(np.asarray(l_ts, "int64"), unit="us"),
            "user_id": np.asarray(l_k, dtype=np.int64),
            "v": np.arange(nl, dtype=np.float64),
        }
    ).sort_values("ts", kind="stable")
    rf = pd.DataFrame(
        {
            "ts_r": pd.to_datetime(np.asarray(r_ts, "int64"), unit="us"),
            "user_id": np.asarray(r_k, dtype=np.int64),
            "w_r": np.arange(nr, dtype=np.float64) + 1000.0,
        }
    ).sort_values("ts_r", kind="stable")
    exp = (
        pd.merge_asof(
            lf, rf, left_on="ts", right_on="ts_r", by="user_id", direction=direction
        )
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert len(got) == nl
    np.testing.assert_array_equal(
        got["w_r"].isna().to_numpy(), exp["w_r"].isna().to_numpy()
    )
    m = ~exp["w_r"].isna().to_numpy()
    np.testing.assert_array_equal(got["w_r"].to_numpy()[m], exp["w_r"].to_numpy()[m])
    np.testing.assert_array_equal(
        got["ts_r"].to_numpy()[m], exp["ts_r"].to_numpy()[m]
    )


@st.composite
def points_and_intervals(draw):
    n = draw(st.integers(1, 40))
    nk = draw(st.integers(1, 3))
    pts = draw(st.lists(st.integers(0, 300), min_size=n, max_size=n))
    keys = draw(st.lists(st.integers(0, nk), min_size=n, max_size=n))
    # non-overlapping intervals per key: random cuts -> alternating spans
    ivs = []
    for k in range(nk + 1):
        cuts = sorted(
            set(draw(st.lists(st.integers(0, 300), min_size=2, max_size=8)))
        )
        for a, b in zip(cuts[::2], cuts[1::2]):
            if a < b:
                ivs.append((k, a, b))
    return pts, keys, ivs


@given(points_and_intervals())
@settings(max_examples=12, deadline=None, derandomize=True)
def test_interval_join_matches_bruteforce(ray_session, data):
    pts, keys, ivs = data
    n = len(pts)
    ds = _mk(
        {
            "ts": _ts(pts),
            "user_id": np.asarray(keys, dtype=np.int64),
            "row": np.arange(n, dtype=np.int64),
        }
    )
    iv = {
        "key": np.asarray([k for k, _, _ in ivs], dtype=np.int64),
        "start": np.asarray([a for _, a, _ in ivs], dtype=np.int64),
        "end": np.asarray([b for _, _, b in ivs], dtype=np.int64),
        "iv_id": np.arange(len(ivs), dtype=np.int64),
    }
    if not len(ivs):
        return
    got = interval_join(ds, iv, how="inner").to_pandas()
    exp = []
    for r, (t, k) in enumerate(zip(pts, keys)):
        for j, (ik, a, b) in enumerate(ivs):
            if k == ik and a <= t < b:
                exp.append((r, j))
    assert len(got) == len(exp)
    if exp:  # an all-empty Dataset's to_pandas may carry no columns
        got = got.sort_values(["row", "iv_id"]).reset_index(drop=True)
        assert list(zip(got["row"], got["iv_id"])) == sorted(exp)
    # left join keeps every row exactly once or once-per-match
    left = interval_join(ds, iv, how="left").to_pandas()
    matched_rows = {r for r, _ in exp}
    assert len(left) == n
    assert set(left.loc[~left["iv_id"].isna(), "row"]) == matched_rows
