"""Sequence packing (global prefix sum) + benchmark decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds_from_pandas(df, blocks):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def test_global_prefix_sum_matches_pandas(ray_session):
    from pygridmap_ray.pack import global_prefix_sum

    rng = np.random.default_rng(7)
    ids = rng.permutation(1000).astype(np.int64) * 3 + 11  # sparse, shuffled
    vals = rng.integers(0, 50, size=1000).astype(np.int64)
    df = pd.DataFrame({"k": ids, "v": vals})
    out = (
        global_prefix_sum(
            _ds_from_pandas(df, 7), order_col="k", value_col="v",
            out_col="start", n_buckets=16,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = df.sort_values("k").reset_index(drop=True)
    ref["start"] = ref["v"].cumsum() - ref["v"]
    assert (out["start"].to_numpy() == ref["start"].to_numpy()).all()


def test_global_prefix_sum_partition_invariant(ray_session):
    from pygridmap_ray.pack import global_prefix_sum

    df = pd.DataFrame(
        {"k": np.arange(200, dtype=np.int64),
         "v": np.arange(200, dtype=np.int64) % 13}
    )
    outs = []
    for blocks, nb in ((1, 4), (9, 64), (25, 1)):
        o = (
            global_prefix_sum(
                _ds_from_pandas(df, blocks), order_col="k", value_col="v",
                n_buckets=nb,
            )
            .to_pandas()
            .sort_values("k")["start"]
            .to_numpy()
        )
        outs.append(o)
    assert (outs[0] == outs[1]).all() and (outs[0] == outs[2]).all()


def test_pack_sequences_chunk_law(ray_session):
    from pygridmap_ray.pack import pack_sequences

    # doc 0: 5 tok -> seq 0 off 0; doc 1: 8 tok -> seq 0 off 5, spans 2
    # (5+8=13 > cap 10); doc 2: 0 tok -> seq 1 off 3 span 1; doc 3: 10 tok
    # -> starts at 13 -> seq 1 off 3, ends at 22 -> spans 2 (seqs 1,2)
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "n_tokens": [5, 8, 0, 10]})
    out = (
        pack_sequences(_ds_from_pandas(df, 2), cap=10, n_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["seq_id"].tolist() == [0, 0, 1, 1]
    assert out["seq_off"].tolist() == [0, 5, 3, 3]
    assert out["n_seqs"].tolist() == [1, 2, 1, 2]


def test_decontaminate_planted(ray_session):
    from pygridmap_ray.dedup import decontaminate

    ev = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps"]}
    )
    tr = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a sentence with the quick brown fox inside it",  # hit (4-gram)
                "completely unrelated words only here",           # clean
                "quick brown fox jumps again today",              # hit
            ],
        }
    )
    out = (
        decontaminate(
            _ds_from_pandas(tr, 2), _ds_from_pandas(ev, 1), n=4
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["contaminated"].tolist() == [True, False, True]


def test_decontaminate_empty_eval(ray_session):
    from pygridmap_ray.dedup import decontaminate

    ev = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype="string")})
    tr = pd.DataFrame({"doc_id": [0], "text": ["anything at all"]})
    out = decontaminate(
        _ds_from_pandas(tr, 1), _ds_from_pandas(ev, 1), n=3
    ).to_pandas()
    assert out["contaminated"].tolist() == [False]


def test_shuffle_by_hash_dense_and_invariant(ray_session):
    from pygridmap_ray.pack import shuffle_by_hash

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    a = (
        shuffle_by_hash(_ds_from_pandas(df, 3), n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")["pos"]
        .to_numpy()
    )
    b = (
        shuffle_by_hash(_ds_from_pandas(df.iloc[::-1], 11), n_buckets=64)
        .to_pandas()
        .sort_values("doc_id")["pos"]
        .to_numpy()
    )
    assert (a == b).all()                       # content-stable
    assert sorted(a.tolist()) == list(range(500))  # dense 0..n-1 rank
    # a different salt deals a different permutation
    c = (
        shuffle_by_hash(_ds_from_pandas(df, 3), salt="x", n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")["pos"]
        .to_numpy()
    )
    assert (a != c).any()
