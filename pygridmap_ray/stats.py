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
