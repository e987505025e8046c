"""FrameProcessor — the generic parallel-dataframe-apply surface.

Re-expression of the reference ``FrameProcessor`` (reference
base.py:62-95): ``__call__(df, func)`` splits a DataFrame into chunks and
applies ``func`` in parallel; ``on_row`` applies a per-row scalar UDF.
Here the chunking/scheduling is Ray Data's block machinery — no
``np.array_split`` + ``mp.Pool`` (base.py:76-85); the same API accepts a
pandas DataFrame (convenience, reference parity) or a Dataset (the
scalable path).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


class FrameProcessor:
    """``FrameProcessor(cores=...)(df, func)`` — reference-parity API.

    ``func``: DataFrame -> DataFrame, applied per block.  ``cores`` maps
    to the target block count (the reference's pool size, base.py:108).
    """

    def __init__(self, cores: int | None = None):
        self.cores = cores

    def __call__(self, df, func: Callable):
        import ray.data as rd

        if isinstance(df, pd.DataFrame):
            ds = rd.from_pandas(df)
            if self.cores and self.cores > 1:
                ds = ds.repartition(self.cores)
            out = ds.map_batches(func, batch_format="pandas")
            res = out.to_pandas()
            return res.reset_index(drop=True)
        # Dataset path: stay lazy/streaming
        return df.map_batches(func, batch_format="pandas")

    def on_row(self, df, row_fn: Callable):
        """Per-row scalar UDF (reference base.py:88-95) — executed inside
        map_batches via DataFrame.apply, never ``ds.map`` per row."""

        def batch(chunk: pd.DataFrame) -> pd.DataFrame:
            res = chunk.apply(row_fn, axis=1)
            if isinstance(res, pd.Series):
                res = res.to_frame("result")
            return res

        return self(df, batch)


def frame_apply(ds, func: Callable, *, batch_format: str = "pandas", **kwargs):
    """Functional form: embarrassingly-parallel frame transform
    (reference B1) on a Dataset."""
    return ds.map_batches(func, batch_format=batch_format, **kwargs)
