"""top_ngrams (text.py) and grouped_quantiles (stats.py) — kernel law
checks beyond the sf0.01 oracle rows: tokenizer edge cases, cross-doc
boundary, the quantile_disc rank law vs DuckDB on random multisets."""

import duckdb
import numpy as np
import pyarrow as pa

from pygridmap_ray.stats import grouped_quantiles, sql_grouped_quantiles
from pygridmap_ray.text import ngram_counts_partial, top_ngrams


def test_ngram_partial_edges():
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["a b c a b", "  x  y  ", None, "one", ""],
        }
    )
    got = (
        ngram_counts_partial(t, n=2)
        .to_pandas()
        .groupby("ngram")["cnt"]
        .sum()
        .to_dict()
    )
    # no cross-doc bigram ("b x" etc.), no empty tokens, null/empty docs
    # contribute nothing, single-token docs have no bigram
    assert got == {"a b": 2, "b c": 1, "c a": 1, "x y": 1}
    uni = ngram_counts_partial(t, n=1).to_pandas()
    assert int(uni["cnt"].sum()) == 5 + 2 + 1


def test_top_ngrams_deterministic_tiebreak(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"text": ["b a", "a c", "b a", "a c", "z z"]})
    )
    out = top_ngrams(ds, n=2, k=2).to_pandas()
    # counts: "b a"=2, "a c"=2, "z z"=1 -> tie broken by ngram ASC
    assert out["ngram"].tolist() == ["a c", "b a"]
    assert out["cnt"].tolist() == [2, 2]


def test_grouped_quantiles_matches_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    key = rng.integers(0, 4, size=500)
    # discrete heavy-tie value domain, plus some nulls
    val = rng.integers(0, 30, size=500).astype("float64")
    # true Arrow nulls (NaN would be a sortable VALUE in both engines)
    t = pa.table({"k": key, "v": pa.array(val, mask=rng.random(500) < 0.05)})
    qs = (0.1, 0.25, 0.5, 0.75, 0.99)
    got = (
        grouped_quantiles(rd.from_arrow(t), key="k", value="v", qs=qs)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = (
        con.sql(sql_grouped_quantiles("k", "v", qs))
        .df()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.columns.tolist() == exp.columns.tolist()
    assert got.equals(exp)


def test_simhash_pairs_near_misses(ray_session):
    """Banding must catch pairs at hamming 1..3 (pigeonhole recall 1),
    not only identical signatures — verified against a brute-force
    all-pairs popcount."""
    import ray.data as rd

    from pygridmap_ray.dedup import simhash64, simhash_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    texts = [base]
    for i in range(6):  # light perturbations -> small hamming distances
        toks = base.split()
        toks[i * 3] = f"alt{i}"
        texts.append(" ".join(toks))
    texts += [" ".join(f"zz{i}w{j}" for j in range(15)) for i in range(10)]
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        simhash_pairs(rd.from_arrow(t), max_hamming=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    sig = np.asarray(simhash64(t)["simhash"], dtype=np.int64).astype(np.uint64)
    x = sig[:, None] ^ sig[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    for b in range(8):
        ham += np.array([bin(v).count("1") for v in range(256)], dtype=np.int64)[
            ((x >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.int64)
        ]
    ia, ib = np.nonzero(np.triu(ham <= 3, k=1))
    assert got["id_a"].tolist() == ia.tolist()
    assert got["id_b"].tolist() == ib.tolist()
    assert got["hamming"].tolist() == ham[ia, ib].tolist()
    assert (got["hamming"] > 0).any()  # the planted near-misses are caught


def test_pii_scrub_known_answers():
    import pyarrow as pa

    from pygridmap_ray.text import pii_scrub

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail a.b+c@x-y.co.uk now",
                "ip 192.168.0.1 and phone 555-123-4567 twice 555-000-1111",
                "clean text with no pii at all",
            ],
        }
    )
    out = pii_scrub(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "mail <EMAIL> now"
    assert texts[1] == "ip <IP> and phone <PHONE> twice <PHONE>"
    assert texts[2] == "clean text with no pii at all"
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0]
    assert out["n_phone"].to_pylist() == [0, 2, 0]


def test_repetition_stats_known_answers():
    import pyarrow as pa

    from pygridmap_ray.text import repetition_stats

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                # bigrams: "a b","b a","a b","b a","a b" -> top 3/5
                # trigrams: 4 total, "a b a","b a b" each twice -> dup 1-2/4
                "a b a b a b",
                "u v w x",  # all bigrams/trigrams distinct
                "one",  # no bigrams at all
            ],
        }
    )
    out = repetition_stats(t)
    tb = out["top_bigram_frac"].to_pylist()
    dt = out["dup_trigram_frac"].to_pylist()
    assert abs(tb[0] - 3 / 5) < 1e-12 and abs(dt[0] - 0.5) < 1e-12
    assert tb[1] == 1 / 3 and dt[1] == 0.0
    assert tb[2] == 0.0 and dt[2] == 0.0


def test_stratified_sample_law(ray_session):
    """Keep decision is per-row deterministic: rate 1.0 keeps all, 0.0
    drops all, and the kept subset for a mid rate is hash-stable (same
    rows on rerun) and matches the DuckDB twin on the same table."""
    import ray.data as rd

    from pygridmap_ray.stats import sql_stratified_sample, stratified_sample

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(n)],
            "lang": rng.choice(["en", "de", "xx"], n).tolist(),
        }
    )
    rates = {"en": 0.3, "de": 1.0}
    ds = rd.from_arrow(t)
    got = (
        stratified_sample(
            ds, key_col="doc_id", group_col="lang", rates=rates, default_rate=0.0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = (
        con.sql(
            sql_stratified_sample(
                key_col="doc_id", group_col="lang", rates=rates, default_rate=0.0
            )
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    langs = set(got["lang"])
    assert "xx" not in langs  # default 0.0 drops
    n_de = int((np.asarray(t["lang"]) == "de").sum())
    assert int((got["lang"] == "de").sum()) == n_de  # rate 1.0 keeps all
    # rerun is identical (content-stable, no RNG)
    again = (
        stratified_sample(
            rd.from_arrow(t), key_col="doc_id", group_col="lang",
            rates=rates, default_rate=0.0,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(got)


def test_rolling_aggregate_law_vs_duckdb(ray_session):
    """Random keys/values with NULLS and duplicate order keys broken by a
    unique id: sum/mean/min/max/count must match DuckDB's window frame
    exactly (after the shared half-away rounding of sum/mean)."""
    import ray.data as rd

    from pygridmap_ray.stats import rolling_aggregate, sql_rolling_aggregate

    rng = np.random.default_rng(42)
    n = 600
    vals = rng.normal(scale=50, size=n).round(3)
    vals[rng.random(n) < 0.15] = np.nan
    t = pa.table(
        {
            "rid": np.arange(n),
            "k": rng.integers(0, 12, n),
            "o": rng.integers(0, 40, n),  # heavy order-key ties
            "v": pa.array(vals, from_pandas=True),  # NaN -> null
        }
    )
    got = (
        rolling_aggregate(
            rd.from_arrow(t).repartition(5),
            key_col="k",
            order_cols=("o", "rid"),
            value_col="v",
            window=3,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    exp = (
        con.sql(
            sql_rolling_aggregate(
                key_col="k",
                order_by="o, rid",
                value_col="v",
                window=3,
                select="rid, k, o, v",
            )
        )
        .df()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd_cols = ["roll_sum", "roll_mean", "roll_min", "roll_max", "roll_n"]
    for c in pd_cols:
        a, b = got[c].to_numpy(float), exp[c].to_numpy(float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    # window=1 degenerates to the row itself
    w1 = (
        rolling_aggregate(
            rd.from_arrow(t), key_col="k", order_cols=("o", "rid"),
            value_col="v", window=1,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    import pandas as pd

    vv = pd.Series(vals)
    assert ((w1["roll_min"] == vv.round(3)) | vv.isna()).all()
    assert (w1["roll_n"] == (~vv.isna()).astype(int)).all()


def test_grouped_moments_null_laws_vs_duckdb(ray_session):
    """Nulls in x and y, a singleton group, and a zero-variance group:
    var/std use x's null universe, corr uses the pairwise one, degenerate
    groups go NULL — exactly DuckDB's laws."""
    import ray.data as rd

    from pygridmap_ray.stats import grouped_moments, sql_grouped_moments

    rng = np.random.default_rng(9)
    n = 500
    x = rng.normal(size=n).round(4)
    y = (2.5 * x + rng.normal(scale=0.3, size=n)).round(4)
    x[rng.random(n) < 0.1] = np.nan
    y[rng.random(n) < 0.1] = np.nan
    g = rng.choice(["a", "b", "c"], n).astype(object)
    # singleton group + zero-variance group
    g = np.append(g, ["solo", "flat", "flat", "flat"])
    x = np.append(x, [1.5, 2.0, 2.0, 2.0])
    y = np.append(y, [0.5, 1.0, 2.0, 3.0])
    t = pa.table(
        {
            "g": g,
            "x": pa.array(x, from_pandas=True),
            "y": pa.array(y, from_pandas=True),
        }
    )
    got = (
        grouped_moments(
            rd.from_arrow(t).repartition(4), group_col="g", x_col="x", y_col="y"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("lineitem", t)
    exp = (
        con.sql(sql_grouped_moments(group_col="g", x_col="x", y_col="y"))
        .df()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(got["g"]) == list(exp["g"])
    assert (got["n_x"].to_numpy() == exp["n_x"].to_numpy()).all()
    for c in ("var_x", "std_x", "corr_xy"):
        a, b = got[c].to_numpy(float), exp[c].to_numpy(float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), (c, a, b)
    flat = got[got["g"] == "flat"].iloc[0]
    assert flat["var_x"] == 0.0 and np.isnan(flat["corr_xy"])
    solo = got[got["g"] == "solo"].iloc[0]
    assert np.isnan(solo["var_x"])


def test_hll_distinct_accuracy_and_invariance(ray_session):
    """The estimate lands within the p=6 error envelope of the true
    distinct count, is partition-invariant, and matches the SQL twin on
    data with heavy duplication."""
    import duckdb
    import ray.data as rd

    from pygridmap_ray.stats import hll_distinct, sql_hll_distinct

    rng = np.random.default_rng(21)
    t = pa.table(
        {
            "g": rng.choice(["big", "small"], 5000, p=[0.8, 0.2]).astype(object),
            "k": rng.integers(0, 900, 5000),  # ~900 distinct in 'big'
        }
    )
    got = (
        hll_distinct(rd.from_arrow(t).repartition(7), group_col="g", key_col="k")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    again = (
        hll_distinct(rd.from_arrow(t).repartition(2), group_col="g", key_col="k")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert got.equals(again)  # sketch merge is partition-invariant
    con = duckdb.connect()
    con.register("events", t)
    exp = (
        con.sql(sql_hll_distinct(group_col="g", key_col="k", source="events"))
        .df()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(got["g"]) == list(exp["g"])
    assert (got["approx_distinct"].to_numpy() == exp["approx_distinct"].to_numpy()).all()
    true = (
        con.sql("SELECT g, COUNT(DISTINCT k) AS d FROM events GROUP BY g ORDER BY g")
        .df()["d"]
        .to_numpy(float)
    )
    rel = np.abs(got["approx_distinct"].to_numpy() - true) / true
    assert (rel < 0.35).all(), (got["approx_distinct"].to_numpy(), true)


def test_grouped_topk_law_vs_duckdb(ray_session):
    """Heavy value ties broken by the unique tiebreak, groups smaller
    than k, ascending mode — all must match ROW_NUMBER semantics."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pygridmap_ray.stats import grouped_topk, sql_grouped_topk

    rng = np.random.default_rng(17)
    n = 800
    t = pa.table(
        {
            "g": rng.integers(0, 60, n),  # some groups will have < k rows
            "rid": np.arange(n),
            "v": rng.integers(0, 5, n).astype("float64"),  # heavy ties
        }
    )
    for desc in (True, False):
        got = (
            grouped_topk(
                rd.from_arrow(t).repartition(5),
                group_col="g",
                order_col="v",
                tiebreak_col="rid",
                k=3,
                descending=desc,
            )
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("orders", t)
        exp = (
            con.sql(
                sql_grouped_topk(
                    group_col="g", order_col="v", tiebreak_col="rid",
                    k=3, descending=desc, source="orders",
                    select="g, rid, v",
                )
            )
            .df()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        assert got.columns.tolist() == exp.columns.tolist()
        assert got.astype("float64").equals(exp.astype("float64")), desc


def test_md5_prefix_int_law_and_edges():
    """Vectorized single-block MD5 is bit-identical to the per-row
    hashlib law across lengths 0..70 (covering the 55-byte single-block
    boundary and the C fallback), salts, hexdigit widths, and sliced /
    chunked Arrow inputs."""
    import hashlib

    import pyarrow as pa

    from pygridmap_ray.text import md5_prefix_int

    # two key sets: one entirely <= 55 bytes AFTER salting (forces the
    # vectorized single-block path, covering lengths 0..44 and the exact
    # 53/54/55-byte block boundary), one containing 70-byte keys (forces
    # the C fallback for the whole chunk) — a padder regression at the
    # boundary or in salt handling cannot hide behind the fallback
    base = [""] + ["x" * n for n in range(1, 45)] + [
        str(i * 37) for i in range(500)
    ]
    for salt in ("", "s", "longer-salt"):
        m = 55 - len(salt)  # exact single-block boundary AFTER salting
        vec_keys = base + ["y" * (m - 2), "y" * (m - 1), "y" * m]
        fb_keys = vec_keys + ["z" * 70]  # forces the whole-chunk fallback
        for keys in (vec_keys, fb_keys):
            for hd in (8, 15, 16):
                exp = [
                    int(hashlib.md5((k + salt).encode()).hexdigest()[:hd], 16)
                    for k in keys
                ]
                got = md5_prefix_int(keys, salt=salt, hexdigits=hd)
                assert [int(x) for x in got] == exp, (salt, hd, len(keys))
    keys = base + ["z" * 70]
    arr = pa.chunked_array([keys[:100], keys[100:]])
    got = md5_prefix_int(arr, hexdigits=15)
    exp = [int(hashlib.md5(k.encode()).hexdigest()[:15], 16) for k in keys]
    assert [int(x) for x in got] == exp
    sliced = pa.array(keys).slice(3, 50)
    got = md5_prefix_int(sliced, hexdigits=15)
    assert [int(x) for x in got] == exp[3:53]
    assert len(md5_prefix_int([], hexdigits=15)) == 0
