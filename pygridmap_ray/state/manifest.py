"""Checkpoint/resume with per-partition lineage manifests.

The north-rule contract (SURVEY.md §7.5.7): stage outputs are partitioned
parquet trees whose ``_manifest.json`` records enough lineage — stage
fingerprint (config + input identity), per-file row counts — that a
resumed run can VALIDATE the existing output and skip recomputation
entirely, and a half-written run (killed mid-write) never validates
(files are write-temp-renamed, the manifest is written last, atomically).

Granularity: stage-level skip with per-file validation.  Finer
per-partition resume follows the same protocol with one manifest per
partition directory; at 100TB each input shard maps to one partition dir
so a failed run redoes only the missing shards.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable


def stage_fingerprint(**config) -> str:
    """Deterministic fingerprint of a stage's config + input identity
    (paths, resolutions, layer hashes, code version...)."""
    blob = json.dumps(config, sort_keys=True, default=repr)
    return hashlib.md5(blob.encode()).hexdigest()


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def validate_output(out_dir: str, fingerprint: str | None = None) -> bool:
    """True iff the manifest exists, matches ``fingerprint`` (when given),
    and every recorded file is present with its recorded row count."""
    import pyarrow.parquet as pq

    mp = _manifest_path(out_dir)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if fingerprint is not None and m.get("fingerprint") != fingerprint:
        return False
    recorded = set()
    for entry in m.get("files", []):
        path = os.path.join(out_dir, entry["path"])
        recorded.add(os.path.normpath(path))
        if not os.path.exists(path):
            return False
        if path.endswith(".parquet"):
            try:
                if pq.read_metadata(path).num_rows != entry["rows"]:
                    return False
            except Exception:
                return False
        # csv tiles: existence-only (no cheap row-count metadata)
    # orphan data files (e.g. a task retried after renaming its file into
    # place) would duplicate rows on read — an output with extras is NOT
    # valid
    import glob as _glob

    for ext in ("parquet", "csv"):
        for f in _glob.glob(
            os.path.join(out_dir, "**", f"*.{ext}"), recursive=True
        ):
            if os.path.normpath(f) not in recorded:
                return False
    return True


def checkpointed_write(
    ds_factory: Callable,
    out_dir: str,
    partition_cols: list[str],
    fingerprint: str,
) -> dict:
    """Run-or-skip a partitioned stage write.

    ``ds_factory`` is only CALLED (and the pipeline only executed) when the
    existing output does not validate against ``fingerprint`` — a lazy
    Dataset thunk, so resume costs one manifest read + file stats.
    Returns {"skipped": bool, "rows": int}.
    """
    from ..tiler import write_partitioned

    if validate_output(out_dir, fingerprint):
        with open(_manifest_path(out_dir)) as f:
            m = json.load(f)
        return {"skipped": True, "rows": m["total_rows"]}
    rows = write_partitioned(ds_factory(), out_dir, partition_cols, mode="overwrite")
    # stamp the fingerprint into the manifest (atomic rewrite)
    mp = _manifest_path(out_dir)
    with open(mp) as f:
        m = json.load(f)
    m["fingerprint"] = fingerprint
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.rename(tmp, mp)
    return {"skipped": False, "rows": rows}
