"""Property tests for key_set_op, co_occurrence and degree_histogram
against brute-force numpy/pandas ground truth on random inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pygridmap_ray.graph import (
    co_occurrence,
    degree_histogram,
    distinct_int_pairs,
)
from pygridmap_ray.joins import key_set_op


def _mk(table):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


keys = st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=60)


@settings(max_examples=15, deadline=None)
@given(a=keys, b=keys, op=st.sampled_from(["intersect", "except", "union"]))
def test_key_set_op_matches_python_sets(ray_session, a, b, op):
    got = key_set_op(
        _mk({"k": np.array(a, np.int64)}),
        _mk({"k": np.array(b, np.int64)}),
        "k",
        op=op,
        num_buckets=4,
    ).to_pandas()
    sa, sb = set(a), set(b)
    want = {
        "intersect": sa & sb,
        "except": sa - sb,
        "union": sa | sb,
    }[op]
    if "k" not in got.columns:
        # a globally-empty Ray result loses its schema (documented
        # engine-wide; real pipelines guard by construction)
        assert len(got) == 0 and len(want) == 0
        return
    assert set(got["k"].tolist()) == want
    assert len(got) == len(want)  # distinct — no dup rows


edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12),
              st.integers(min_value=0, max_value=12)),
    min_size=1, max_size=80,
)


@settings(max_examples=10, deadline=None)
@given(e=edges, cap=st.integers(min_value=1, max_value=6))
def test_co_occurrence_matches_bruteforce(ray_session, e, cap):
    k = np.array([x for x, _ in e], np.int64)
    it = np.array([y for _, y in e], np.int64)
    got = co_occurrence(
        _mk({"k": k, "it": it}), "k", "it",
        max_degree=cap, num_buckets=4,
    ).to_pandas()
    # brute force: distinct edges, degree cap, pair counts
    df = pd.DataFrame({"k": k, "it": it}).drop_duplicates()
    deg = df.groupby("k")["it"].nunique()
    df = df[df["k"].map(deg) <= cap]
    want = {}
    for key, grp in df.groupby("k"):
        items = sorted(grp["it"])
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                p = (items[i], items[j])
                want[p] = want.get(p, 0) + 1
    got_d = {
        (r.item_a, r.item_b): r.n_shared for r in got.itertuples()
    }
    assert got_d == want


@settings(max_examples=10, deadline=None)
@given(e=edges)
def test_degree_histogram_matches_bruteforce(ray_session, e):
    k = np.array([x for x, _ in e], np.int64)
    it = np.array([y for _, y in e], np.int64)
    pairs = distinct_int_pairs(_mk({"a": k, "b": it}), "a", "b",
                               num_buckets=4)
    got = degree_histogram(pairs, "a", "b", num_buckets=4).to_pandas()
    df = pd.DataFrame({"a": k, "b": it}).drop_duplicates()
    deg = pd.concat(
        [df.groupby("a").size(), df.groupby("b").size()]
    ).to_numpy()
    dval, dcnt = np.unique(deg, return_counts=True)
    want = dict(zip(dval.tolist(), dcnt.tolist()))
    got_d = dict(zip(got["degree"].tolist(), got["n_nodes"].tolist()))
    assert got_d == want
