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


def test_keyed_lag_matches_pandas(ray_session):
    from pygridmap_ray.stats import keyed_lag

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n), unit="us"),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "value": rng.normal(size=n),
        }
    )
    got = (
        keyed_lag(
            _ds_from_pandas(df, 5), key_col="user_id", ts_col="ts",
            id_col="event_id", value_col="value", num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = ref.groupby("user_id", sort=False)
    ref["prev_value"] = g["value"].shift(1)
    ref["next_value"] = g["value"].shift(-1)
    ref["dt_us"] = (ref["ts"] - g["ts"].shift(1)) / pd.Timedelta(
        microseconds=1
    )
    ref = ref.sort_values("event_id").reset_index(drop=True)
    for c in ("prev_value", "next_value"):
        np.testing.assert_allclose(
            got[c].to_numpy(), ref[c].to_numpy(), atol=0, equal_nan=True
        )
    assert (
        got["dt_us"].astype("float64").fillna(-1).to_numpy()
        == ref["dt_us"].fillna(-1).to_numpy()
    ).all()


def test_mixture_repeat_law(ray_session):
    from pygridmap_ray.stats import mixture_repeat

    df = pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64),
         "lang": ["en", "zh"] * 500}
    )
    out = mixture_repeat(
        _ds_from_pandas(df, 4), weights={"en": 2.0, "zh": 0.5}
    ).to_pandas()
    en = out[out["lang"] == "en"]
    zh = out[out["lang"] == "zh"]
    # integer weight: exactly 2 copies each, copy in {0,1}
    assert len(en) == 1000 and set(en["copy"]) == {0, 1}
    # fractional: ~half survive with copy 0 only, deterministic on rerun
    assert 150 < len(zh) < 350 and set(zh["copy"]) == {0}
    out2 = mixture_repeat(
        _ds_from_pandas(df.iloc[::-1], 9), weights={"en": 2.0, "zh": 0.5}
    ).to_pandas()
    a = out.sort_values(["doc_id", "copy"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "copy"]).reset_index(drop=True)
    assert a.equals(b)


def test_dedup_lines_planted(ray_session):
    from pygridmap_ray.dedup import dedup_lines

    # chunk=2 lines: doc0 = [a b][c d]; doc1 repeats [a b] (dropped) and
    # adds [x y]; doc2 is entirely doc0's lines -> vanishes
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b c d", "a b x y", "c d a b"],
        }
    )
    out = (
        dedup_lines(_ds_from_pandas(df, 2), chunk=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_lines"].tolist() == [2, 2]
    assert out["n_kept"].tolist() == [2, 1]
    assert out["text_kept"].tolist() == ["a b c d", "x y"]


def test_countmin_one_sided_and_exact_when_wide(ray_session):
    from pygridmap_ray.stats import countmin_topk

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(words, size=30, p=None)) for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts})
    # narrow sketch: collisions certain -> est >= cnt, some strict
    t = countmin_topk(
        _ds_from_pandas(df, 4), k=15, width=32, depth=3
    ).to_pandas()
    assert (t["est"] >= t["cnt"]).all()
    # wide sketch: 200 distinct words, width 4096 -> est == cnt w.h.p.
    # per hash row; depth-4 min makes a collision on ALL rows ~impossible
    t2 = countmin_topk(
        _ds_from_pandas(df, 4), k=15, width=4096, depth=4
    ).to_pandas()
    assert (t2["est"] == t2["cnt"]).all()


def test_salted_join_hot_key_parity(ray_session):
    from pygridmap_ray.joins import salted_join

    rng = np.random.default_rng(2)
    # one pathological hot key: 20k of 24k left rows share key 7
    keys = np.where(rng.random(24000) < 20 / 24, 7, rng.integers(0, 100, 24000))
    left = pd.DataFrame(
        {"k": keys.astype(np.int64), "v": np.arange(24000, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64),
         "name": [f"n{i}" for i in range(100)]}
    )
    out = salted_join(
        _ds_from_pandas(left, 8), _ds_from_pandas(right, 2),
        on="k", salt=4, num_partitions=8,
    ).to_pandas()
    ref = left.merge(right, on="k", how="inner")
    assert len(out) == len(ref)
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = ref.sort_values(["k", "v"]).reset_index(drop=True)
    assert (a["name"].to_numpy() == b["name"].to_numpy()).all()


def test_prefix_sum_property(ray_session):
    """Hypothesis-style law sweep without per-example Ray runs (one Ray
    pipeline per case is too slow for dozens of examples): random key
    spacings, values incl. zeros, bucket counts incl. 1 and > n."""
    from pygridmap_ray.pack import global_prefix_sum

    rng = np.random.default_rng(17)
    for trial in range(6):
        n = int(rng.integers(1, 300))
        ids = np.cumsum(rng.integers(1, 9, n)).astype(np.int64) * int(
            rng.integers(1, 4)
        )
        vals = rng.integers(0, 20, n).astype(np.int64)
        vals[rng.random(n) < 0.2] = 0
        nb = int(rng.choice([1, 2, 16, 512]))
        df = pd.DataFrame({"k": ids, "v": vals})
        out = (
            global_prefix_sum(
                _ds_from_pandas(df.sample(frac=1, random_state=trial), 5),
                order_col="k", value_col="v", n_buckets=nb,
            )
            .to_pandas()
            .sort_values("k")["start"]
            .to_numpy()
        )
        ref = np.cumsum(vals) - vals
        assert (out == ref).all(), (trial, n, nb)


def test_rollup_null_data_keys(ray_session):
    """Null DATA keys ride through Ray's sort aggregate via the sentinel
    and the output multiset matches SQL ROLLUP's."""
    import duckdb

    from pygridmap_ray.stats import rollup_aggregate

    df = pd.DataFrame(
        {"a": ["x", None, "x", None], "b": ["u", "u", None, None],
         "v": [1, 2, 3, 4]}
    )
    out = rollup_aggregate(
        _ds_from_pandas(df, 3), keys=("a", "b"), value="v"
    ).to_pandas()
    exp = duckdb.connect().execute(
        "SELECT a, b, COUNT(*)::BIGINT AS n_rows, SUM(v)::BIGINT AS sum_val "
        "FROM df GROUP BY ROLLUP(a, b)"
    ).df()

    def norm(d):
        d = d.reindex(sorted(d.columns), axis=1)
        return (
            d.fillna("~N~").astype(str)
            .sort_values(sorted(d.columns))
            .reset_index(drop=True)
        )

    assert norm(out).equals(norm(exp))


def test_countmin_empty_corpus(ray_session):
    from pygridmap_ray.stats import countmin_topk

    df = pd.DataFrame({"doc_id": [0], "text": [""]})
    out = countmin_topk(_ds_from_pandas(df, 1), k=5)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 0 and list(out.columns) == ["ngram", "cnt", "est"]


def test_prefix_sum_rejects_duplicate_keys(ray_session):
    from pygridmap_ray.pack import global_prefix_sum

    df = pd.DataFrame({"k": [1, 1, 2], "v": [10, 20, 30]})
    with pytest.raises(Exception, match="duplicate"):
        global_prefix_sum(
            _ds_from_pandas(df, 2), order_col="k", value_col="v"
        ).to_pandas()


def test_events_funnel_strict_order_law(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import events_funnel

    # user 1: view < click < purchase (stage 3)
    # user 2: click BEFORE view -> click cannot count; no later click (stage 1)
    # user 3: view and click at the SAME ts -> strict '>' rejects (stage 1)
    # user 4: below min_value only (absent from output)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        (1, t0 + 0, "view", 200.0), (1, t0 + 10, "click", 200.0),
        (1, t0 + 20, "purchase", 200.0),
        (2, t0 + 0, "click", 200.0), (2, t0 + 10, "view", 200.0),
        (3, t0 + 5, "view", 200.0), (3, t0 + 5, "click", 200.0),
        (4, t0 + 0, "view", 1.0),
    ]
    tab = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tab, f"{tmp_path}/events.parquet")
    out = (
        events_funnel(str(tmp_path))
        .to_pandas()
        .set_index("user_id")["stage"]
        .to_dict()
    )
    assert out == {1: 3, 2: 1, 3: 1}
