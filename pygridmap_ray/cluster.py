"""Cluster-derived execution defaults.

Shuffle widths must never be literals in a pipeline plan: a constant
that fits one laptop caps exchange parallelism on a 256-node cluster
and concentrates per-partition memory.  Every partitioned join /
repartition in the engine derives its width from the live cluster via
:func:`default_num_partitions` (CPU-count based in this single-node
sandbox; on a real cluster ``ray.cluster_resources()`` reflects all
nodes, so the same call scales the plan with the cluster).
"""

from __future__ import annotations

import ray


def default_num_partitions(min_parts: int = 2, per_cpu: float = 0.5) -> int:
    """Shuffle width for partitioned joins / repartitions.

    ``per_cpu`` defaults to 0.5 (one exchange partition per two cores):
    hash-join build/probe tasks are memory-hungry, so oversubscribing
    cores with exchange partitions only adds object-store churn.  Falls
    back to 4 CPUs when no Ray session exists yet (plan built before
    ``ray.init`` — the width is re-derived lazily at call time by every
    pipeline, so this path only serves unit imports).
    """
    cpus = 4.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 4.0))
    return max(min_parts, int(cpus * per_cpu))


def ensure_block_schema(ds, schema):
    """Force EVERY block of ``ds`` to carry exactly ``schema``.

    Ray's hash-shuffle ``groupby().map_groups()`` SKIPS the UDF on empty
    hash partitions and emits their blocks as-is — EMPTY AND COLUMN-LESS.
    ``map_batches`` stages silently absorb those, but ``Dataset.join`` /
    ``union`` consume blocks per partition and reject a degenerate
    schema (Acero: "No match ... for key field reference").  The legacy
    workaround — ``.repartition(n)`` to merge them away — only works
    while every output partition receives at least one non-empty block,
    i.e. it silently breaks when ``n`` (cluster-derived!) exceeds the
    non-empty block count; small inputs on wide clusters hit exactly
    that.  This helper is width-independent: degenerate blocks are
    replaced by an empty table of ``schema``, real blocks are projected
    and cast to it.  ``batch_size=None`` keeps the mapping per-block
    (zero-copy; never concatenates mismatched schemas).

    Use it on any join/union input produced by a hash-shuffle
    ``map_groups`` / ``aggregate`` stage."""
    import pyarrow as pa

    empty = schema.empty_table()

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return empty
        return b.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow", batch_size=None)


def compact_blocks(ds, schema=None, sentinel_keys: dict | None = None):
    """Rebuild ``ds`` from its NON-EMPTY blocks only — the deterministic
    guard against Ray 2.49's hash-shuffle schema race.

    The join/shuffle operator broadcasts a side's schema to data-less
    partitions only from the FIRST block it shuffles
    (``hash_shuffle.py``: an empty first block returns before the
    ``send_empty_blocks`` loop, but ``_has_schemas_broadcasted`` is set
    anyway), so a side whose first-dispatched block is empty leaves
    every row-less partition COLUMN-LESS and Acero fails with "No match
    ... for key field reference" — a scheduling race, reproduced
    deterministically by putting empty blocks first.  ``map_batches``
    cannot heal it: the UDF is never invoked on zero-row blocks.

    This helper materializes the side, keeps only non-empty block refs
    (blocks stay in the object store — nothing is fetched to the
    driver), normalizes them to Arrow with exactly ``schema``, and
    returns a dataset with no empty blocks at all (one schema-ful empty
    table if the side has no rows anywhere).

    USE ON BOUNDED SIDES ONLY (candidate/id-scale join inputs —
    anything downstream of a filter, ``map_groups``, aggregate or join
    whose volume is already reduced): the materialize pins the side in
    the object store.  Raw reads and dense map stages have no empty
    blocks and need no guard — at production scale every partition has
    rows and the race is unobservable; this is a small-input
    correctness guard, and the gate runs small inputs.
    """
    import pyarrow as pa
    import ray.data as rd

    if schema is not None:
        def fix(b):
            return b.select(schema.names).cast(schema)
    else:
        # identity through a pyarrow map: non-empty pandas blocks become
        # Arrow (from_arrow_refs needs that); empty blocks skip the UDF
        # and are dropped below anyway
        def fix(b):
            return b

    mat = ds.map_batches(fix, batch_format="pyarrow", batch_size=None).materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        # an empty single block would be the side's first-shuffled block
        # and lose the race deterministically: emit ONE sentinel row with
        # never-matching keys instead (the join drops it)
        if schema is None:
            raise ValueError(
                "compact_blocks: side has no rows anywhere and no schema "
                "was given — pass an explicit schema for sides that can "
                "be globally empty"
            )
        cols = []
        for f in schema:
            if f.name in (sentinel_keys or {}):
                cols.append(pa.array([sentinel_keys[f.name]], f.type))
            else:
                cols.append(pa.nulls(1, f.type))
        return rd.from_arrow(pa.table(dict(zip(schema.names, cols))))
    return rd.from_arrow_refs(refs)


def safe_join(
    left,
    right,
    join_type: str,
    *,
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
    left_schema=None,
    right_schema=None,
):
    """``Dataset.join`` hardened against the hash-shuffle schema race:
    each side whose ``*_schema`` is given is compacted via
    :func:`compact_blocks` so no empty block can ever be its side's
    first-shuffled block.  Pass the schema for EVERY side that can
    carry empty or column-less blocks (downstream of a filter,
    ``map_groups``, aggregate, join, or a width>rows repartition) AND
    whose volume is bounded (the compact materializes); pass ``None``
    for dense corpus-scale sides (raw reads / row-preserving maps /
    fresh balanced repartitions with rows >= width), which have no
    empty blocks to race on.  Pass the string ``"auto"`` to guard a
    side whose schema is awkward to state (generic value columns): the
    schema is derived from the materialized non-empty blocks —
    "auto" sides must not be globally empty (no sentinel can be built
    without a schema; such sides need the explicit form)."""
    if join_type == "left_outer" and left_schema is not None:
        raise ValueError(
            "left_outer: guard only the right side (a left sentinel row "
            "would surface in the output); left sides of outer joins must "
            "be dense by construction"
        )
    rkeys = right_on or on
    if left_schema is not None:
        sch = None if left_schema == "auto" else left_schema
        sent = (
            {k: _sentinel_for(sch.field(k).type, "left") for k in on}
            if sch is not None
            else None
        )
        left = compact_blocks(left, sch, sent)
    if right_schema is not None:
        sch = None if right_schema == "auto" else right_schema
        sent = (
            {k: _sentinel_for(sch.field(k).type, "right") for k in rkeys}
            if sch is not None
            else None
        )
        right = compact_blocks(right, sch, sent)
    return left.join(
        right,
        join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


#: sentinel key values per side — never equal to each other, never real
LEFT_SENTINEL = -(1 << 62)
RIGHT_SENTINEL = -(1 << 61)


def _sentinel_for(field_type, side: str):
    """A key value that can never occur in real data nor match the
    other side's sentinel."""
    import pyarrow as pa

    tag = LEFT_SENTINEL if side == "left" else RIGHT_SENTINEL
    if pa.types.is_integer(field_type):
        return tag
    if pa.types.is_floating(field_type):
        return float(tag)
    if pa.types.is_string(field_type) or pa.types.is_large_string(field_type):
        return f"\x00__pygridmap_sentinel_{side}__"
    if pa.types.is_binary(field_type) or pa.types.is_large_binary(field_type):
        return f"\x00__pygridmap_sentinel_{side}__".encode()
    raise TypeError(f"no sentinel rule for join key type {field_type}")
