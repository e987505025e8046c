"""tfidf.tfidf_pairs law checks beyond the sf0.01 oracle: stop-term
pruning, norm contribution of unpairable df=1 terms, tf>1 weighting,
docs with nothing left after the prune."""

import duckdb
import numpy as np
import pyarrow as pa


def _pairs_df(ds):
    return (
        ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )


def test_tfidf_pairs_law_vs_duckdb(ray_session):
    import ray.data as rd

    from pygridmap_ray.tfidf import sql_tfidf_pairs, tfidf_pairs

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        toks = rng.choice(vocab, rng.integers(8, 20)).tolist()
        toks += ["stop common"] * 1  # bigram "stop common" in EVERY doc
        texts.append("stop common " + " ".join(toks))
    # planted near-dup pair
    texts.append("alpha beta gamma delta alpha beta gamma delta")
    texts.append("alpha beta gamma delta alpha beta gamma epsilon")
    # doc whose every bigram is the universal stop bigram -> fully pruned
    texts.append("stop common")
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = _pairs_df(
        tfidf_pairs(
            rd.from_arrow(t).repartition(4),
            n=2,
            max_df_frac=0.5,
            threshold=0.2,
            num_partitions=4,
        )
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = (
        con.sql(sql_tfidf_pairs(n=2, max_df_frac=0.5, threshold=0.2))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert got[["id_a", "id_b"]].values.tolist() == exp[["id_a", "id_b"]].values.tolist()
    assert (got["cosine"].to_numpy() == exp["cosine"].to_numpy()).all()
    # the planted near-dup is the top pair, and the pruned doc never pairs
    top = got.loc[got["cosine"].idxmax()]
    assert {int(top["id_a"]), int(top["id_b"])} == {40, 41}
    assert 42 not in set(got["id_a"]) | set(got["id_b"])


def test_doc_term_freqs_edges():
    from pygridmap_ray.tfidf import doc_term_freqs

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b a b", "  x  ", None, "solo"],
        }
    )
    out = doc_term_freqs(t, n=2).to_pandas()
    # doc 0: bigrams "a b"x2, "b a"x1; docs 1-3 have no bigram
    got = {(r.doc, r.term): r.tf for r in out.itertuples()}
    assert got == {(0, "a b"): 2.0, (0, "b a"): 1.0}
    uni = doc_term_freqs(t, n=1).to_pandas()
    assert uni[uni["doc"] == 1]["tf"].sum() == 1.0  # empties dropped


def test_tfidf_persist_modes_identical(ray_session, tmp_path):
    """parquet- and recompute-persisted postings give bit-identical
    pairs to the default object-store pin (VERDICT r2 task 6)."""
    import ray.data as rd

    from pygridmap_ray.tfidf import tfidf_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(20)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(6, 14)).tolist())
        for _ in range(30)
    ]
    texts += ["dup one two three"] * 2
    t = pa.table(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    kw = dict(n=2, max_df_frac=0.6, threshold=0.15, num_partitions=4)
    base = _pairs_df(tfidf_pairs(rd.from_arrow(t).repartition(3), **kw))
    pq = _pairs_df(
        tfidf_pairs(
            rd.from_arrow(t).repartition(3),
            persist="parquet",
            persist_path=str(tmp_path / "postings"),
            **kw,
        )
    )
    rc = _pairs_df(
        tfidf_pairs(rd.from_arrow(t).repartition(3), persist="recompute", **kw)
    )
    assert base.equals(pq)
    assert base.equals(rc)
    assert (tmp_path / "postings").exists()


def test_tfidf_dense_equals_sparse(ray_session):
    """The dense gram-matrix regime emits exactly the sparse plan's
    pairs (same weight/threshold/rounding law; dgemm only reorders the
    float additions, dwarfed by the 1e-6 rounding step)."""
    import ray.data as rd

    from pygridmap_ray.tfidf import tfidf_pairs

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 20)).tolist())
        for _ in range(40)
    ]
    t = pa.table(
        {"doc_id": np.arange(len(texts), dtype=np.int64) * 7, "text": texts}
    )
    kw = dict(n=1, max_df_frac=0.8, threshold=0.2, num_partitions=4)
    dense = _pairs_df(tfidf_pairs(rd.from_arrow(t).repartition(3), **kw))
    sparse = _pairs_df(
        tfidf_pairs(
            rd.from_arrow(t).repartition(3), dense_postings_limit=0, **kw
        )
    )
    assert len(dense) > 0
    assert dense.equals(sparse)
