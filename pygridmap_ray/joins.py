"""Order-aware joins Ray Data cannot express natively.

``Dataset.join`` (Ray 2.49) is an equality hash join; the two operators
here need ORDER within a key:

- :func:`asof_join` — attach to each left row the latest right row at or
  before it in event time (DuckDB's ``ASOF JOIN``, pandas
  ``merge_asof``).  One hash shuffle: both sides are schema-aligned,
  tagged and unioned, bucketed by ``hash(by) % num_buckets`` (bounded
  group count independent of key cardinality), and each bucket resolves
  with a single vectorized ``pandas.merge_asof(by=...)`` over an
  index-only frame — matched right values are then gathered with Arrow
  ``take`` so output columns keep their exact Arrow types (no
  pandas int->float null promotion).

- :func:`interval_join` — equality on ``by`` + containment of ``on`` in
  ``[start, end)`` against a SMALL interval table (validity windows,
  sessions, calendars).  The interval side is broadcast (``ray.put``
  once, cached per worker), the probe side streams; per batch the match
  is one lexsort + per-interval ``searchsorted`` (vectorized over rows,
  Python loop only over the broadcast side).

Partitioning assumptions (documented per the custom-operator contract):
``asof_join`` requires one ``by``-key's rows to fit in a worker (true
for per-entity event streams; a single pathological hot key degrades to
that key's volume, like any keyed window).  ``interval_join`` requires
the interval table to fit in worker memory; for a LARGE interval side,
bucket both sides by ``by`` and apply the same kernel per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HASH_MULT = 2654435761  # Knuth multiplicative hash (public domain constant)


def _bucket_of(arr: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((arr.astype(np.int64) * _HASH_MULT) & 0x7FFFFFFF) % num_buckets


def asof_join(
    left,
    right,
    *,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    suffix: str = "_r",
    num_buckets: int = 64,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """As-of join two Datasets: for each left row, the single right row
    with the greatest ``on`` <= left ``on`` (``direction='backward'``; or
    smallest >= for ``'forward'``) sharing the ``by`` key.  Left-outer
    semantics: unmatched left rows keep nulls in the right columns.

    Right columns other than ``by``/``on`` are appended with ``suffix``;
    right's own ``on`` is appended as ``on + suffix``.  ``by`` must be
    integer-typed (bucketing hash); pass ``num_buckets=None`` to group
    directly by the key instead (any type, one group per key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Dataset.schema() EXECUTES the upstream pipeline to its first block
    # (a limit-1 plan) — twice here.  Callers that know their schemas pass
    # them and skip both executions; None falls back to inference.
    if left_schema is None:
        _ls = left.schema()
        left_schema = pa.schema(list(zip(_ls.names, _ls.types)))
    if right_schema is None:
        _rs = right.schema()
        right_schema = pa.schema(list(zip(_rs.names, _rs.types)))
    left_cols = list(left_schema.names)
    if on not in left_cols or by not in left_cols:
        raise ValueError(f"left is missing {on!r}/{by!r}")
    rvalue_cols = [c for c in right_schema.names if c not in (on, by)]
    renamed = {c: c + suffix for c in rvalue_cols}
    out_right_cols = [on + suffix] + [renamed[c] for c in rvalue_cols]
    clash = set(out_right_cols) & set(left_cols)
    if clash:
        raise ValueError(
            f"suffixed right columns collide with left columns: {sorted(clash)}"
            " — pass a different suffix"
        )
    rtypes = {
        on + suffix: right_schema.field(on).type,
        **{renamed[c]: right_schema.field(c).type for c in rvalue_cols},
    }
    union_fields = (
        [(c, left_schema.field(c).type) for c in left_cols]
        + [(n, rtypes[n]) for n in out_right_cols]
        + [("__side", pa.int8())]
    )
    union_schema = pa.schema(union_fields)
    group_key = "__bucket" if num_buckets else by

    def _align_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = [b[c] for c in left_cols] + [
            pa.nulls(n, rtypes[c]) for c in out_right_cols
        ]
        cols.append(pa.nulls(n, pa.int8()).fill_null(0))
        t = pa.table(cols, schema=union_schema)
        if num_buckets:
            t = t.append_column(
                "__bucket",
                pa.array(_bucket_of(np.asarray(b[by]), num_buckets)),
            )
        return t

    def _align_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = []
        for c in left_cols:
            if c == by:
                cols.append(b[by])
            else:
                cols.append(pa.nulls(n, left_schema.field(c).type))
        cols.append(pc.cast(b[on], rtypes[on + suffix]))
        cols.extend(pc.cast(b[c], rtypes[renamed[c]]) for c in rvalue_cols)
        cols.append(pa.nulls(n, pa.int8()).fill_null(1))
        t = pa.table(cols, schema=union_schema)
        if num_buckets:
            t = t.append_column(
                "__bucket",
                pa.array(_bucket_of(np.asarray(b[by]), num_buckets)),
            )
        return t

    la = left.map_batches(_align_left, batch_format="pyarrow")
    ra = right.map_batches(_align_right, batch_format="pyarrow")
    # the groupby below is a sort shuffle whose MAP parallelism equals the
    # input block count; a union of two narrow branches often carries a
    # handful of blocks, serializing the sort map on one task — split them
    unioned = la.union(ra).repartition(max(num_buckets or 0, 16))

    out_schema = pa.schema(
        [(c, left_schema.field(c).type) for c in left_cols]
        + [(n, rtypes[n]) for n in out_right_cols]
    )

    def _merge(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        # null ORDER keys can never match: right nulls drop, left nulls
        # keep null right columns (pandas merge_asof rejects null keys)
        rt = rt.filter(pc.is_valid(rt[on + suffix]))
        null_left = lt.filter(pc.is_null(lt[on]))
        lt = lt.filter(pc.is_valid(lt[on]))
        null_out = None
        if null_left.num_rows:
            null_out = pa.table(
                [null_left[c] for c in left_cols]
                + [pa.nulls(null_left.num_rows, rtypes[c]) for c in out_right_cols],
                schema=out_schema,
            )
        if lt.num_rows == 0:
            return null_out if null_out is not None else out_schema.empty_table()
        # index-only merge frame: by/on are now never null on either side,
        # so pandas dtypes stay faithful
        l_pd = pd.DataFrame(
            {
                by: np.asarray(lt[by]),
                on: lt[on].to_pandas(),
                "__li": np.arange(lt.num_rows),
            }
        ).sort_values(on, kind="stable")
        lt_cols = [lt[c] for c in left_cols]
        if rt.num_rows == 0:
            out = lt_cols + [pa.nulls(lt.num_rows, rtypes[c]) for c in out_right_cols]
            t = pa.table(out, schema=out_schema)
            return pa.concat_tables([t, null_out]) if null_out is not None else t
        r_pd = pd.DataFrame(
            {
                by: np.asarray(rt[by]),
                f"{on}__r": rt[on + suffix].to_pandas(),
                "__ri": np.arange(rt.num_rows),
            }
        ).sort_values(f"{on}__r", kind="stable")
        m = pd.merge_asof(
            l_pd,
            r_pd,
            left_on=on,
            right_on=f"{on}__r",
            by=by,
            direction=direction,
        )
        li = m["__li"].to_numpy()
        ri = m["__ri"].astype("float64").to_numpy()  # NaN-safe for all-match
        miss = np.isnan(ri)
        ridx = pa.array(
            np.where(miss, 0, ri).astype(np.int64), mask=miss
        )
        lidx = pa.array(li.astype(np.int64))
        out = [c.take(lidx) for c in lt_cols]
        out.append(rt[on + suffix].take(ridx))
        out.extend(rt[renamed[c]].take(ridx) for c in rvalue_cols)
        t = pa.table(out, schema=out_schema)
        return pa.concat_tables([t, null_out]) if null_out is not None else t

    return unioned.groupby(group_key).map_groups(
        _merge, batch_format="pyarrow"
    )


class _LookupKernel:
    """Per-worker dimension-lookup kernel: a pandas Index over the
    broadcast dimension key gives O(1) hash probes for any key dtype."""

    def __init__(self, dim: "pa.Table | dict", on: str, key: str, how: str,
                 value_cols: list[str] | None):
        import ray

        if isinstance(dim, dict) and "__ref__" in dim:
            dim = ray.get(dim["__ref__"])
        self.on, self.how = on, how
        cols = value_cols or [c for c in dim.column_names if c != key]
        self.idx = pd.Index(np.asarray(dim[key]))
        if not self.idx.is_unique:
            raise ValueError(f"dimension key {key!r} has duplicate values")
        self.payload = {c: dim[c].combine_chunks() for c in cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        pos = self.idx.get_indexer(np.asarray(batch[self.on]))
        if self.how == "inner":
            hit = pos >= 0
            t = batch.filter(pa.array(hit))
            take = pa.array(pos[hit].astype(np.int64))
            for c, col in self.payload.items():
                t = t.append_column(c, col.take(take))
            return t
        miss = pos < 0
        take = pa.array(np.where(miss, 0, pos).astype(np.int64), mask=miss)
        t = batch
        for c, col in self.payload.items():
            t = t.append_column(c, col.take(take))
        return t


def lookup_join(
    ds,
    dim: pa.Table,
    *,
    on: str,
    key: str | None = None,
    value_cols: list[str] | None = None,
    how: str = "inner",
    concurrency=None,
):
    """Broadcast equality join against a SMALL dimension table.

    The canonical scale pattern for enriching a streaming fact table
    (documents x language stats, points x region attributes, orders x
    customer): the dimension goes to the object store ONCE (``ray.put``),
    each worker builds a hash index once (`_cached_kernel`), and the probe
    side streams — never an all-to-all shuffle join.  ``key`` defaults to
    ``on``; the dimension key must be unique (validated at kernel build).
    ``how='inner'`` drops misses, ``'left'`` keeps them with nulls.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    key = key or on
    if value_cols is not None:
        dim = dim.select([key, *value_cols])
    ref = {"__ref__": ray.put(dim)}
    if concurrency is not None:
        return ds.map_batches(
            _LookupKernel,
            batch_format="pyarrow",
            fn_constructor_args=(ref, on, key, how, value_cols),
            concurrency=concurrency,
        )
    from .spatial import _cached_kernel

    ckey = f"lookup:{ref['__ref__'].hex()}:{on}:{key}:{how}"

    def apply(batch: pa.Table) -> pa.Table:
        kern = _cached_kernel(
            ckey, ref, lambda d: _LookupKernel(d, on, key, how, value_cols)
        )
        return kern(batch)

    return ds.map_batches(apply, batch_format="pyarrow")


class _IntervalKernel:
    """Per-worker probe kernel holding the broadcast interval table
    sorted by (by, start).  Intervals must be non-overlapping per key
    (validity windows); overlap raises at build time."""

    def __init__(self, iv: dict, on: str, by: str, how: str):
        import ray

        if isinstance(iv, dict) and "__ref__" in iv:
            iv = ray.get(iv["__ref__"])
        self.on, self.by, self.how = on, by, how
        order = np.lexsort((iv["start"], iv["key"]))
        self.k = np.asarray(iv["key"], dtype=np.int64)[order]
        self.s = np.asarray(iv["start"], dtype=np.int64)[order]
        self.e = np.asarray(iv["end"], dtype=np.int64)[order]
        self.payload = {
            name: pa.array(np.asarray(col)[order])
            for name, col in iv.items()
            if name not in ("key", "start", "end")
        }
        same = self.k[1:] == self.k[:-1]
        if np.any(same & (self.s[1:] < self.e[:-1])):
            raise ValueError("intervals overlap within a key")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            rows = np.empty(0, dtype=np.int64)
            hits = np.empty(0, dtype=np.int64)
        else:
            keycol = batch[self.by]
            oncol = batch[self.on]
            if pa.types.is_timestamp(oncol.type):
                oncol = pc.cast(pc.cast(oncol, pa.timestamp("us")), pa.int64())
            valid = np.asarray(pc.and_(pc.is_valid(keycol), pc.is_valid(oncol)))
            bkey = np.asarray(pc.fill_null(keycol, 0), dtype=np.int64)
            bon = np.asarray(pc.fill_null(oncol, 0), dtype=np.int64)
            # null key/time rows never match: excluded from the probe order
            # (inner drops them; left keeps them with null payload).
            # one searchsorted per broadcast interval, vectorized over the
            # batch rows of that interval's key
            vidx = np.nonzero(valid)[0]
            order = vidx[np.lexsort((bon[vidx], bkey[vidx]))]
            sk, so = bkey[order], bon[order]
            rows_l, hits_l = [], []
            # segment bounds of each interval's key among the batch rows
            seg_lo = np.searchsorted(sk, self.k, side="left")
            seg_hi = np.searchsorted(sk, self.k, side="right")
            for i in range(len(self.k)):
                lo, hi = seg_lo[i], seg_hi[i]
                if lo == hi:
                    continue
                a = lo + np.searchsorted(so[lo:hi], self.s[i], side="left")
                b = lo + np.searchsorted(so[lo:hi], self.e[i], side="left")
                if a < b:
                    rows_l.append(order[a:b])
                    hits_l.append(np.full(b - a, i, dtype=np.int64))
            rows = np.concatenate(rows_l) if rows_l else np.empty(0, dtype=np.int64)
            hits = np.concatenate(hits_l) if hits_l else np.empty(0, dtype=np.int64)
        if self.how == "inner":
            t = batch.take(pa.array(rows))
            for name, col in self.payload.items():
                t = t.append_column(name, col.take(pa.array(hits)))
            return t
        # left: matched rows get payload, the rest null
        match_of = np.full(n, -1, dtype=np.int64)
        match_of[rows] = hits
        miss = match_of < 0
        idx = pa.array(np.where(miss, 0, match_of), mask=miss)
        t = batch
        for name, col in self.payload.items():
            if len(col) == 0:
                t = t.append_column(name, pa.nulls(n, col.type))
            else:
                t = t.append_column(name, col.take(idx))
        return t


def interval_join(
    points,
    intervals: dict,
    *,
    on: str = "ts",
    by: str = "user_id",
    how: str = "inner",
    concurrency=None,
):
    """Join a streaming Dataset to a broadcast interval table.

    ``intervals``: dict of columns — ``key`` (int64), ``start``/``end``
    (int64 epoch-us, half-open), plus payload columns to attach.  A row
    matches when ``row[by] == key and start <= us(row[on]) < end``.
    ``how='inner'`` emits matches only; ``'left'`` keeps all rows with
    null payload (requires non-overlapping intervals — guaranteed by the
    per-key overlap check).
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    ref = {"__ref__": ray.put(intervals)}
    if concurrency is not None:
        return points.map_batches(
            _IntervalKernel,
            batch_format="pyarrow",
            fn_constructor_args=(ref, on, by, how),
            concurrency=concurrency,
        )
    from .spatial import _cached_kernel

    key = f"interval:{ref['__ref__'].hex()}:{on}:{by}:{how}"

    def apply(batch: pa.Table) -> pa.Table:
        kern = _cached_kernel(key, ref, lambda iv: _IntervalKernel(iv, on, by, how))
        return kern(batch)

    return points.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Broadcast semi/anti join + distributed bloom prefilter
# ---------------------------------------------------------------------------


class _MembershipKernel:
    """Per-worker exact-membership kernel: a pandas Index over the
    broadcast DISTINCT key array gives O(1) probes for any key dtype."""

    def __init__(self, keys, on: str, anti: bool):
        import ray

        if isinstance(keys, dict) and "__ref__" in keys:
            keys = ray.get(keys["__ref__"])
        self.idx = pd.Index(keys)
        self.on, self.anti = on, anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        hit = self.idx.get_indexer(np.asarray(batch[self.on])) >= 0
        return batch.filter(pa.array(~hit if self.anti else hit))


def distinct_keys(right, key: str) -> np.ndarray:
    """Collect the DISTINCT values of one column to the driver.

    Per-batch ``pc.unique`` partials stream back, so the driver holds only
    the distinct set (the build-side contract of every broadcast join:
    distinct keys fit in memory, raw rows need not)."""
    parts = right.map_batches(
        lambda b: pa.table({key: pc.unique(b[key])}), batch_format="pyarrow"
    )
    arrs = [
        np.asarray(b[key])
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not arrs:
        return np.array([], dtype=object)
    return np.unique(np.concatenate(arrs))


def semi_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    concurrency=None,
):
    """Exact broadcast semi/anti join: keep left rows whose ``on`` value
    does (``anti=False``) or does not (``anti=True``) appear among the
    right side's ``right_on`` values.

    The scale pattern for "filter a 100 TB fact table by a key set": the
    right side reduces to its DISTINCT keys (streamed, deduped per
    batch), the key array ships to the object store ONCE, and the left
    side streams through a stateless membership filter — no shuffle, no
    row amplification.  For a right side whose distinct keys exceed
    worker memory, run :func:`bloom_prefilter` first and finish with a
    partitioned hash join on the survivors.

    ``right`` may be a Dataset (distinct keys collected) or a numpy
    array / list of precollected keys.
    """
    import ray

    right_on = right_on or on
    keys = right if isinstance(right, (np.ndarray, list)) else distinct_keys(
        right, right_on
    )
    ref = {"__ref__": ray.put(np.asarray(keys))}
    if concurrency is not None:
        return left.map_batches(
            _MembershipKernel,
            batch_format="pyarrow",
            fn_constructor_args=(ref, on, anti),
            concurrency=concurrency,
        )
    from .spatial import _cached_kernel

    ckey = f"semi:{ref['__ref__'].hex()}:{on}:{anti}"

    def apply(batch: pa.Table) -> pa.Table:
        kern = _cached_kernel(ckey, ref, lambda k: _MembershipKernel(k, on, anti))
        return kern(batch)

    return left.map_batches(apply, batch_format="pyarrow")


def _bloom_positions(vals: np.ndarray, num_bits: int, num_hashes: int):
    """k bit positions per value via double hashing.  ``pd.util.hash_array``
    vectorizes any dtype; stability is only needed WITHIN a run (the bloom
    is built and probed in the same job, never persisted)."""
    h1 = pd.util.hash_array(vals, hash_key="0123456789123456").astype(np.uint64)
    # splitmix64 finalizer as the second, independent hash
    z = h1 + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd -> full-period stride
    m = np.uint64(num_bits)
    return [((h1 + np.uint64(j) * h2) % m).astype(np.int64) for j in range(num_hashes)]


def bloom_build(right, key: str, *, num_bits: int = 1 << 20, num_hashes: int = 4):
    """Distributed bloom-filter build over one column: each batch emits a
    partial bitmap (a single bytes row), partials OR together on the
    driver.  Driver traffic is ``num_blocks x num_bits/8`` bytes — size
    ``num_bits`` to ~10 bits per expected distinct key; for extreme block
    counts insert a ``repartition`` tree before collecting.

    Returns ``{"bits": ref, "num_bits": m, "num_hashes": k}`` ready for
    :func:`bloom_prefilter`."""
    import ray

    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")

    if isinstance(right, (np.ndarray, list)):
        # precollected key array (e.g. shared with an exact semi_join):
        # build the bitmap directly, no extra pass over the build side
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        vals = np.asarray(right)
        if len(vals):
            for pos in _bloom_positions(vals, num_bits, num_hashes):
                np.bitwise_or.at(
                    bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        return {
            "bits": ray.put(bits),
            "num_bits": num_bits,
            "num_hashes": num_hashes,
        }

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        if b.num_rows:
            vals = np.asarray(pc.unique(b[key]))
            for pos in _bloom_positions(vals, num_bits, num_hashes):
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    parts = right.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b["bits"].to_pylist():
            bits |= np.frombuffer(buf, dtype=np.uint8)
    return {
        "bits": ray.put(bits),
        "num_bits": num_bits,
        "num_hashes": num_hashes,
    }


def bloom_prefilter(ds, bloom: dict, on: str):
    """Approximate semi-join prefilter: keeps every row whose key IS in
    the build set (no false negatives) plus a bounded false-positive
    fraction — the cheap first stage before an exact partitioned join
    when the build side's distinct keys exceed worker memory."""
    from .spatial import _cached_kernel

    num_bits, num_hashes = bloom["num_bits"], bloom["num_hashes"]
    ref = {"__ref__": bloom["bits"]}
    ckey = f"bloom:{bloom['bits'].hex()}"

    def apply(batch: pa.Table) -> pa.Table:
        bits = _cached_kernel(ckey, ref, lambda b: b)
        if not batch.num_rows:
            return batch
        vals = np.asarray(batch[on])
        keep = np.ones(len(vals), dtype=bool)
        for pos in _bloom_positions(vals, num_bits, num_hashes):
            keep &= (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return batch.filter(pa.array(keep))

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# salted join (hot-key skew handling)
# ---------------------------------------------------------------------------


def salted_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    salt: int = 8,
    num_partitions: int = 32,
):
    """Inner hash join that survives pathological key skew: a hot key's
    left rows spread across ``salt`` sub-shards (key, s) while the right
    side replicates ``salt``-fold, so no single join partition ever holds
    a hot key's full volume — the classic salted-join rewrite, here as a
    first-class operator.

    The salt assignment is an arbitrary per-batch round-robin: the inner
    join OUTPUT is identical for every assignment (each left row still
    meets every matching right row exactly once), so determinism of the
    result does not depend on block layout.  Cost model: right-side
    shuffle volume multiplies by ``salt`` — use for small-to-medium right
    sides against a skew-prone left (the FK-join shape); for broadcast-
    sized right sides :func:`lookup_join` is strictly cheaper."""
    right_on = right_on or on

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__salt", pa.array(np.arange(b.num_rows, dtype=np.int64) % salt)
        )

    def explode_right(b: pa.Table) -> pa.Table:
        idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), salt)
        out = b.take(pa.array(idx))
        return out.append_column(
            "__salt",
            pa.array(np.tile(np.arange(salt, dtype=np.int64), b.num_rows)),
        )

    lt = left.map_batches(tag_left, batch_format="pyarrow").repartition(
        num_partitions
    )
    rt = right.map_batches(explode_right, batch_format="pyarrow").repartition(
        num_partitions
    )
    joined = lt.join(
        rt,
        "inner",
        num_partitions=num_partitions,
        on=(on, "__salt"),
        right_on=(right_on, "__salt"),
    )
    return joined.drop_columns(["__salt"])


def key_set_op(left, right, key_col: str, *, op: str,
               num_buckets: int = 64):
    """Distributed DISTINCT set algebra over an int64 key column:
    ``op`` in {"intersect", "except", "union"} with SQL DISTINCT
    semantics.  Per-batch ``np.unique`` partials tagged with a side bit
    ride ONE coarse-bucket shuffle on key hash (all copies of a key —
    from either side — share a bucket); the per-bucket resolve is a
    sorted-run membership scan.  Keys are HIGH-cardinality so they
    never meet a fine groupby, and only distinct (key, side) pairs
    ever shuffle."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = np.unique(np.asarray(b[key_col], np.int64))
            if len(k) and (k.min() < 0 or k.max() >= (1 << 62)):
                raise ValueError("keys must be in [0, 2^62)")
            cg = _bucket_of(k, num_buckets)
            return pa.table(
                {
                    "k": pa.array(k),
                    "side": pa.array(
                        np.full(len(k), side, dtype=np.int64)
                    ),
                    "__cg": pa.array(cg),
                }
            )

        return fn

    def resolve(g):
        import pandas as pd

        k = g["k"].to_numpy(np.int64)
        s = g["side"].to_numpy(np.int64)
        # distinct (key, side), then membership per key via sorted runs
        pk = np.unique(k * 2 + s)
        ku = pk >> 1
        starts = np.flatnonzero(
            np.concatenate([[True], ku[1:] != ku[:-1]])
        )
        n = np.diff(np.append(starts, len(ku)))
        in_both = n == 2
        first_side = pk[starts] & 1
        if op == "intersect":
            keep = ku[starts][in_both]
        elif op == "except":
            keep = ku[starts][(~in_both) & (first_side == 0)]
        else:  # union
            keep = ku[starts]
        return pd.DataFrame({key_col: keep})

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("__cg").map_groups(resolve, batch_format="pandas")
