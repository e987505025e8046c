"""Distribution statistics as shuffle-lean Ray Data plans.

``grouped_quantiles`` computes EXACT per-key quantiles without ever
co-locating a key's raw rows: phase 1 reduces the stream to a value
HISTOGRAM (``groupby((key, value)).count()`` — the shuffle carries only
distinct (key, value) pairs, so 100 TB of rows with a bounded value
domain shrinks to domain-size rows); phase 2 walks each key's histogram
cumulative counts and picks the inverted-CDF rank.

The rank law is DuckDB's ``quantile_disc``: 1-based index
``clamp(ceil(q * n), 1, n)`` into the sorted values (SQL:2016 discrete
percentile; verified against DuckDB over n in 1..10).

Scale limit (documented): exactness relies on the value domain being
bounded (ints, scores at fixed precision).  For continuous unbounded
values, bucket first (fixed-width bins) for approximate quantiles or use
a mergeable sketch; the histogram plan itself is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _qlabel(q: float) -> str:
    return f"q{int(round(q * 100)):02d}"


def grouped_quantiles(
    ds,
    *,
    key: str = "lang",
    value: str = "n_chars",
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
):
    """Per-``key`` exact quantiles of ``value`` -> one row per key with
    columns ``q25, q50, ...`` (label = q + percent).  Null values are
    excluded (SQL aggregate semantics); null keys form their own group.
    """
    ds = ds.select_columns([key, value]).map_batches(
        lambda b: b.filter(pc.is_valid(b[value])), batch_format="pyarrow"
    )
    hist = ds.groupby([key, value]).count()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, kind="stable")
        cum = g["count()"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        out = {key: [g[key].iloc[0]]}
        for q in qs:
            rank = min(max(int(np.ceil(q * n)), 1), n)
            pos = int(np.searchsorted(cum, rank, side="left"))
            out[_qlabel(q)] = [g[value].iloc[pos]]
        return pd.DataFrame(out)

    return hist.groupby(key).map_groups(finish, batch_format="pandas")


def sql_grouped_quantiles(
    key: str = "lang",
    value: str = "n_chars",
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    source: str = "documents",
) -> str:
    sel = ", ".join(
        f"quantile_disc({value}, {q}) AS {_qlabel(q)}" for q in qs
    )
    return f"SELECT {key}, {sel} FROM {source} GROUP BY {key}"


def split_by_hash(
    ds,
    *,
    key_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "",
):
    """Deterministic train/val/test assignment by content-stable hash.

    The standard corpus-split contract: the split of a record depends
    only on its key (+ optional salt), never on row order, partitioning
    or cluster size — so reruns, resumes and incremental ingests assign
    identically, and train/test leakage cannot happen through data
    movement.  Law (twinned in SQL): the first 8 md5 hex digits of
    ``str(key) + salt`` as an integer, modulo 1e6, cut by the cumulative
    split fractions.  Zero shuffle — one stateless Arrow stage.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names]) * 1_000_000.0

    def assign(b: pa.Table) -> pa.Table:
        import hashlib

        keys = pc.cast(b[key_col], pa.string()).to_pylist()
        h = np.fromiter(
            (
                int(hashlib.md5((k + salt).encode()).hexdigest()[:8], 16)
                % 1_000_000
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        idx = np.searchsorted(cuts, h, side="right")
        idx = np.minimum(idx, len(names) - 1)  # h == 1e6 edge (unreachable)
        lab = pa.array(np.array(names, dtype=object)[idx], pa.string())
        return b.append_column("split", lab)

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds,
    *,
    key_col: str = "doc_id",
    group_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    salt: str = "",
):
    """Deterministic per-group downsampling (corpus rebalancing).

    Each group gets its own keep-rate (e.g. upweight scarce languages by
    downsampling dominant ones); a record survives iff its content-stable
    hash (same md5 law as :func:`split_by_hash`) falls under its group's
    cut.  Rerun/resume/partition invariant, zero shuffle — one stateless
    vectorized filter stage.  Groups absent from ``rates`` use
    ``default_rate`` (0 = drop).
    """
    rates = rates or {}
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")

    def keep(b: pa.Table) -> pa.Table:
        import hashlib

        keys = pc.cast(b[key_col], pa.string()).to_pylist()
        h = np.fromiter(
            (
                int(hashlib.md5((k + salt).encode()).hexdigest()[:8], 16)
                % 1_000_000
                for k in keys
            ),
            dtype=np.int64,
            count=len(keys),
        )
        groups = np.asarray(pc.cast(b[group_col], pa.string())).astype(object)
        cuts = np.fromiter(
            (rates.get(g, default_rate) * 1_000_000.0 for g in groups),
            dtype=np.float64,
            count=len(groups),
        )
        return b.filter(pa.array(h < cuts))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_stratified_sample(
    key_col: str = "doc_id",
    group_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    salt: str = "",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`stratified_sample` — same hash law, same
    strict-< cut comparison."""
    rates = rates or {}
    h = (
        f"(('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '{salt}'), 1, 8))"
        f"::BIGINT % 1000000)"
    )
    case = "CASE "
    for g, r in rates.items():
        case += f"WHEN {group_col} = '{g}' THEN {r * 1_000_000.0!r} "
    case += f"ELSE {default_rate * 1_000_000.0!r} END"
    return f"SELECT * FROM {source} WHERE {h} < ({case})"


def sql_split_by_hash(
    key_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "",
    source: str = "documents",
) -> str:
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(splits)
    cuts = np.cumsum([splits[n] for n in names]) * 1_000_000.0
    h = (
        f"(('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '{salt}'), 1, 8))"
        f"::BIGINT % 1000000)"
    )
    case = "CASE "
    for name, cut in zip(names[:-1], cuts[:-1]):
        # strict <: a hash equal to the cut belongs to the NEXT split,
        # matching numpy searchsorted(side='right') in split_by_hash
        case += f"WHEN {h} < {cut!r} THEN '{name}' "
    case += f"ELSE '{names[-1]}' END"
    return f"SELECT *, {case} AS split FROM {source}"
