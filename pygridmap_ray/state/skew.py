"""Hot-key salting for skewed shuffles.

The engine's default defense against skew is the per-batch combiner
(every groupby here pre-aggregates inside ``map_batches``, bounding any
key's shuffle volume by the block count).  Salting is for the cases a
combiner can't cover — per-group logic that must see raw rows
(``map_groups`` finals, collect-lists): the key is split into
``(key, hash(row) % nsalt)`` sub-groups, partials computed per sub-group,
then a second tiny groupby merges the per-salt partials (SURVEY.md §4
skew row; the clustered 30% of the synthetic corpus creates exactly these
hot cells).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def salted_groupby_agg(
    ds,
    keys: list[str],
    *,
    salt_col: str,
    nsalt: int,
    partial_fn,
    merge_fn,
):
    """Two-phase skew-safe aggregation.

    ``partial_fn(group_df) -> one-row DataFrame`` runs per (keys + salt)
    sub-group; ``merge_fn(group_df) -> one-row DataFrame`` merges the
    per-salt partial rows per key.  ``salt_col`` is any high-cardinality
    column to derive the salt from (deterministic: value % nsalt).
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[salt_col])
        if np.issubdtype(v.dtype, np.integer):
            salt = (v.astype(np.int64) % nsalt).astype(np.int64)
        else:
            # strings / floats (incl. NaN): deterministic content hash
            salt = (
                pd.util.hash_array(v, categorize=False).astype(np.int64) % nsalt
            )
        return batch.append_column("__salt__", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = partial_fn(g)
        for k in keys:
            out[k] = g[k].iloc[0]
        return out

    partials = salted.groupby([*keys, "__salt__"]).map_groups(
        partial, batch_format="pandas"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = merge_fn(g)
        for k in keys:
            out[k] = g[k].iloc[0]
        return out

    return partials.groupby(keys).map_groups(merge, batch_format="pandas")
