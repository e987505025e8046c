"""TF-IDF document similarity over a df-pruned inverted index.

The classic retrieval kernel as a shuffle-lean Ray Data plan:

1. **Term frequencies** — each document is ONE input row, so per-batch
   tokenize + n-gram + count yields EXACT global (doc, term, tf) rows
   with no combine step (same ``\\S+`` token law as ``text.token_count``
   / ``text.top_ngrams``; terms are word n-grams joined by single
   spaces).
2. **Inverted index by coarse bucket** — tf rows shuffle ONCE, keyed by
   ``hash(term) % num_buckets`` (bounded group count, the engine-wide
   hash-like-key rule).  A bucket holds every posting of its terms, so
   document frequency, the ``df <= max_df`` stop-term prune (the bound
   on posting-list length — and therefore on pair fan-out — at corpus
   scale), tf·idf weights, per-doc norm partials and per-term dot
   partials (segmented-triu pair enumeration, vectorized per distinct
   posting-list size) all compute locally and vectorized.
3. **Reduce + attach** — the compacted partial stream materializes once
   (norm + dot partials, orders of magnitude smaller than the corpus),
   per-doc norms and per-pair dots sum through coarse-bucketed
   vectorized reductions, and norms attach to pairs with two hash
   joins.  Cosine = dot / (norm_a · norm_b), thresholded, rounded
   half-away.

Scale notes: the df cutoff is the load-bearing bound — a term kept at
``df = d`` contributes ``d(d-1)/2`` pair partials, so pair volume is at
most ``vocab · max_df²/2`` regardless of corpus size.  Documents are
single rows (the repo-wide contract), so stage 1 never crosses batches.
A doc with NO surviving term simply has no postings and cannot pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_PARTIAL_SCHEMA = pa.schema(
    [("kind", pa.int8()), ("a", pa.int64()), ("b", pa.int64()), ("val", pa.float64())]
)


def doc_term_freqs(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> pa.Table:
    """(doc, term, tf) rows for one batch — exact, since each doc is one
    input row.  Term law: ``\\S+`` tokens, empties dropped, word n-grams
    joined with single spaces, never crossing documents."""
    la = pc.split_pattern_regex(batch[text_col], r"\s+")
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten()
    lens = np.diff(la.offsets.to_numpy())
    rid = np.repeat(np.arange(len(la), dtype=np.int64), lens)
    keep = np.asarray(pc.fill_null(pc.not_equal(flat, ""), False))
    flat = flat.filter(pa.array(keep))
    rid = rid[keep]
    m = len(flat) - (n - 1)
    empty = pa.table(
        {
            "doc": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.float64()),
        }
    )
    if m <= 0:
        return empty
    shifted = [flat.slice(j, m) for j in range(n)]
    grams = shifted[0] if n == 1 else pc.binary_join_element_wise(*shifted, " ")
    same_doc = rid[:m] == rid[n - 1 :]
    grams = grams.filter(pa.array(same_doc))
    docs = np.asarray(batch[id_col], dtype=np.int64)[rid[:m][same_doc]]
    if not len(docs):
        return empty
    df = pd.DataFrame({"doc": docs, "term": np.asarray(grams).astype(object)})
    tf = df.groupby(["doc", "term"], sort=False).size().reset_index(name="tf")
    return pa.table(
        {
            "doc": pa.array(tf["doc"].to_numpy(np.int64)),
            "term": pa.array(tf["term"], pa.string()),
            "tf": pa.array(tf["tf"].to_numpy(np.float64)),
        }
    )


def _coarse_sum(ds, key_cols: list[str], *, num_buckets: int = 64):
    """Sum ``val`` per int64 key tuple without a fine groupby: coarse
    hash buckets, then one lexsort + ``np.add.reduceat`` per bucket."""

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1000003) + np.asarray(b[c]).astype(np.uint64)
        cg = ((h * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int64)
        return b.append_column("__cg", pa.array(cg))

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        arrs = [g[c].to_numpy(np.int64) for c in key_cols]
        order = np.lexsort(tuple(reversed(arrs)))
        ks = [a[order] for a in arrs]
        change = np.zeros(len(order), dtype=bool)
        change[0] = True
        for a in ks:
            change[1:] |= a[1:] != a[:-1]
        starts = np.nonzero(change)[0]
        out = {c: a[starts] for c, a in zip(key_cols, ks)}
        out["val"] = np.add.reduceat(g["val"].to_numpy(np.float64)[order], starts)
        return pd.DataFrame(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__cg")
        .map_groups(reduce, batch_format="pandas")
    )


def tfidf_pairs(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_df_frac: float = 0.5,
    threshold: float = 0.35,
    num_buckets: int = 64,
    round_to: int = 6,
    num_partitions: int | None = None,
):
    """All document pairs with TF-IDF cosine similarity >= ``threshold``
    (columns ``id_a < id_b``, ``cosine`` rounded half-away).

    ``max_df_frac``: terms appearing in more than this fraction of the
    corpus are stop-terms — pruned from weights AND pairs on both this
    and the SQL side (:func:`sql_tfidf_pairs`).
    """
    import ray

    n_docs = docs.count()  # parquet metadata count — no data scan
    max_df = int(np.floor(max_df_frac * n_docs))
    nf = float(n_docs)

    def tf_stage(b: pa.Table) -> pa.Table:
        t = doc_term_freqs(b, id_col=id_col, text_col=text_col, n=n)
        h = pd.util.hash_array(np.asarray(t["term"]).astype(object))
        cg = (h % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__cg", pa.array(cg))

    def bucket_kernel(g: pd.DataFrame) -> pd.DataFrame:
        dfc = g.groupby("term", sort=False)["doc"].size()
        dfv = g["term"].map(dfc).to_numpy(np.float64)
        kept = dfv <= max_df
        g = g.iloc[np.nonzero(kept)[0]]
        if not len(g):
            return pd.DataFrame(
                {"kind": pd.Series([], dtype="int8"),
                 "a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "val": pd.Series([], dtype="float64")}
            )
        dfv = dfv[kept]
        w = g["tf"].to_numpy(np.float64) * np.log(nf / dfv)
        doc = g["doc"].to_numpy(np.int64)
        # norm partials
        nn = pd.DataFrame({"a": doc, "val": w * w}).groupby("a", sort=False)[
            "val"
        ].sum().reset_index()
        frames = [
            pd.DataFrame(
                {"kind": np.int8(0), "a": nn["a"], "b": np.int64(-1), "val": nn["val"]}
            )
        ]
        # pair partials: segmented triu over posting lists (df >= 2)
        multi = dfv >= 2
        if multi.any():
            terms = g["term"].to_numpy()[multi]
            d2, w2 = doc[multi], w[multi]
            order = np.lexsort((d2, terms))
            terms, d2, w2 = terms[order], d2[order], w2[order]
            change = np.r_[True, terms[1:] != terms[:-1]]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, len(terms)))
            ga_l, gb_l = [], []
            for sz in np.unique(sizes[sizes >= 2]):
                segs = starts[sizes == sz]
                la, lb = np.triu_indices(int(sz), k=1)
                ga_l.append((segs[:, None] + la[None, :]).ravel())
                gb_l.append((segs[:, None] + lb[None, :]).ravel())
            if ga_l:
                ga = np.concatenate(ga_l)
                gb = np.concatenate(gb_l)
                pp = pd.DataFrame(
                    {"a": d2[ga], "b": d2[gb], "val": w2[ga] * w2[gb]}
                )
                pp = pp.groupby(["a", "b"], sort=False)["val"].sum().reset_index()
                frames.append(
                    pd.DataFrame(
                        {"kind": np.int8(1), "a": pp["a"], "b": pp["b"], "val": pp["val"]}
                    )
                )
        out = pd.concat(frames, ignore_index=True)
        out["kind"] = out["kind"].astype("int8")
        return out

    partials = (
        docs.map_batches(tf_stage, batch_format="pyarrow")
        .groupby("__cg")
        .map_groups(bucket_kernel, batch_format="pandas")
        .materialize()  # compacted partials only — never the corpus
    )
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    norms = _coarse_sum(
        partials.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 0)).select(["a", "val"]),
            batch_format="pyarrow",
        ),
        ["a"],
        num_buckets=num_buckets,
    ).map_batches(
        lambda b: pa.table(
            {"a": b["a"], "nrm": pc.sqrt(b["val"])}
        ),
        batch_format="pyarrow",
    )
    dots = _coarse_sum(
        partials.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 1)),
            batch_format="pyarrow",
        ),
        ["a", "b"],
        num_buckets=num_buckets,
    )
    # hash-shuffle map_groups stages can emit column-less empty blocks
    # that Dataset.join rejects — repartition both sides first (repo rule)
    dots = dots.repartition(num_partitions)
    na = norms.map_batches(
        lambda b: pa.table({"a": b["a"], "nrm_a": b["nrm"]}), batch_format="pyarrow"
    ).repartition(num_partitions)
    nb = norms.map_batches(
        lambda b: pa.table({"b": b["a"], "nrm_b": b["nrm"]}), batch_format="pyarrow"
    ).repartition(num_partitions)
    j = dots.join(na, "inner", num_partitions=num_partitions, on=("a",))
    j = j.join(nb, "inner", num_partitions=num_partitions, on=("b",))

    tol = 10.0**round_to

    def finish(b: pa.Table) -> pa.Table:
        c = np.asarray(b["val"], np.float64) / (
            np.asarray(b["nrm_a"], np.float64) * np.asarray(b["nrm_b"], np.float64)
        )
        keep = c >= threshold
        c = np.floor(np.abs(c[keep]) * tol + 0.5) / tol  # cosines are >= 0 here
        return pa.table(
            {
                "id_a": pa.array(np.asarray(b["a"], np.int64)[keep]),
                "id_b": pa.array(np.asarray(b["b"], np.int64)[keep]),
                "cosine": pa.array(c),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def sql_tfidf_pairs(
    *,
    n: int = 2,
    max_df_frac: float = 0.5,
    threshold: float = 0.35,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`tfidf_pairs`: same term law, the same
    ``floor(max_df_frac * N)`` integer cutoff, the same ``tf·ln(N/df)``
    weight, unrounded threshold compare, half-away rounding."""
    term = (
        "t0.tok"
        if n == 1
        else " || ' ' || ".join(f"t{j}.tok" for j in range(n))
    )
    joins = " ".join(
        f"JOIN tk2 t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.j = t0.j + {j}"
        for j in range(1, n)
    )
    return f"""
WITH tk AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_split_to_array({text_col}, '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array({text_col}, '\\s+'), 1) AS i
  FROM {source}
), tk2 AS (
  SELECT doc_id, tok, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
  FROM tk WHERE tok <> ''
), tf AS (
  SELECT t0.doc_id, {term} AS term, COUNT(*)::DOUBLE AS tf
  FROM tk2 t0 {joins} GROUP BY t0.doc_id, term
), nn AS (SELECT COUNT(*)::DOUBLE AS n FROM {source}),
dft AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln((SELECT n FROM nn) / dft.df) AS w
  FROM tf JOIN dft USING (term)
  WHERE dft.df <= FLOOR({max_df_frac!r} * (SELECT n FROM nn))
), nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(dot / (na.nrm * nb.nrm) * 1e6) / 1e6 AS cosine
FROM dots
JOIN nrm na ON na.doc_id = id_a
JOIN nrm nb ON nb.doc_id = id_b
WHERE dot / (na.nrm * nb.nrm) >= {threshold!r}
"""
