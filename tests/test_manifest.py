"""Checkpoint/resume semantics: second run skips, tampering invalidates,
half-written outputs never validate."""

import glob
import json
import os

import numpy as np
import pandas as pd

from pygridmap_ray.state import checkpointed_write, stage_fingerprint, validate_output


def _factory_calls(counter):
    import ray.data as rd

    def factory():
        counter["calls"] += 1
        df = pd.DataFrame(
            {"xt": np.repeat([0, 1], 500), "v": np.arange(1000.0)}
        )
        return rd.from_pandas(df)

    return factory


def test_resume_skips_valid_output(ray_session, tmp_path):
    out = str(tmp_path / "stage1")
    fp = stage_fingerprint(stage="test", resolution=1000, input="fixed")
    counter = {"calls": 0}
    r1 = checkpointed_write(_factory_calls(counter), out, ["xt"], fp)
    assert not r1["skipped"] and r1["rows"] == 1000 and counter["calls"] == 1
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(f"{out}/**/*.parquet", recursive=True)}
    r2 = checkpointed_write(_factory_calls(counter), out, ["xt"], fp)
    assert r2["skipped"] and r2["rows"] == 1000
    assert counter["calls"] == 1  # pipeline never re-executed
    assert mtimes == {
        p: os.path.getmtime(p) for p in glob.glob(f"{out}/**/*.parquet", recursive=True)
    }


def test_changed_fingerprint_reruns(ray_session, tmp_path):
    out = str(tmp_path / "stage2")
    counter = {"calls": 0}
    checkpointed_write(_factory_calls(counter), out, ["xt"], stage_fingerprint(v=1))
    r = checkpointed_write(_factory_calls(counter), out, ["xt"], stage_fingerprint(v=2))
    assert not r["skipped"] and counter["calls"] == 2


def test_tampered_file_invalidates(ray_session, tmp_path):
    out = str(tmp_path / "stage3")
    fp = stage_fingerprint(v=1)
    counter = {"calls": 0}
    checkpointed_write(_factory_calls(counter), out, ["xt"], fp)
    victim = glob.glob(f"{out}/**/*.parquet", recursive=True)[0]
    os.remove(victim)
    assert not validate_output(out, fp)
    r = checkpointed_write(_factory_calls(counter), out, ["xt"], fp)
    assert not r["skipped"] and counter["calls"] == 2
    assert validate_output(out, fp)


def test_half_written_never_validates(ray_session, tmp_path):
    """Simulate a kill between data files and manifest: no manifest ->
    invalid; corrupt manifest -> invalid."""
    out = str(tmp_path / "stage4")
    fp = stage_fingerprint(v=1)
    counter = {"calls": 0}
    checkpointed_write(_factory_calls(counter), out, ["xt"], fp)
    mp = os.path.join(out, "_manifest.json")
    os.remove(mp)
    assert not validate_output(out, fp)
    with open(mp, "w") as f:
        f.write("{not json")
    assert not validate_output(out, fp)


def test_killed_midrun_resume_byte_identical(ray_session, tmp_path):
    """E2E crash/resume: a write killed mid-run (a transform raises after
    some batches have already renamed files into place) leaves an output
    that does NOT validate; the resumed run rewrites it, and the final
    tree is byte-identical in content to an uninterrupted run (SURVEY
    7.5.7's byte-identical clause, previously asserted only at manifest
    level)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    def data():
        df = pd.DataFrame(
            {
                "xt": np.repeat(np.arange(8), 250),
                "v": np.arange(2000.0),
                "w": np.arange(2000)[::-1].astype(np.int64),
            }
        )
        return rd.from_pandas(df).repartition(8)

    poison_flag = str(tmp_path / "poison")

    def make_factory(poison: bool):
        def factory():
            def maybe_die(b: pa.Table) -> pa.Table:
                # first batches pass; once a marker file appears a later
                # task dies -> the run aborts with files already visible
                if poison:
                    if os.path.exists(poison_flag):
                        raise RuntimeError("simulated worker crash")
                    open(poison_flag, "w").close()
                return b

            return data().map_batches(maybe_die, batch_format="pyarrow")

        return factory

    fp = stage_fingerprint(stage="crash-test", v=1)
    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")

    try:
        checkpointed_write(make_factory(True), out_a, ["xt"], fp)
        crashed = False
    except Exception:
        crashed = True
    assert crashed
    # the interrupted tree must NOT validate (manifest missing/stale)
    assert not validate_output(out_a, fp)

    # resume: rewrites the stage (factory without poison)
    res = checkpointed_write(make_factory(False), out_a, ["xt"], fp)
    assert res == {"skipped": False, "rows": 2000}
    assert validate_output(out_a, fp)
    # second resume is a pure skip
    assert checkpointed_write(make_factory(False), out_a, ["xt"], fp)["skipped"]

    # uninterrupted reference run
    checkpointed_write(make_factory(False), out_b, ["xt"], fp)

    def content_hash(root):
        h = hashlib.md5()
        for part in sorted(
            glob.glob(f"{root}/xt=*/*.parquet"),
            key=lambda p: os.path.relpath(p, root).split(os.sep)[0],
        ):
            t = pq.read_table(part).sort_by([("v", "ascending")])
            h.update(str(t.to_pydict()).encode())
        return h.hexdigest()

    assert content_hash(out_a) == content_hash(out_b)


def test_incremental_aggregate_contract(ray_session, tmp_path):
    """Only changed partitions recompute; vanished partitions drop; the
    fold always equals a direct full aggregate."""
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pygridmap_ray.state.incremental import incremental_aggregate
    from pygridmap_ray.tiler import write_partitioned

    base = str(tmp_path)
    df = pd.DataFrame(
        {
            "pt": np.arange(900, dtype=np.int64) % 3,
            "k": np.array(["a", "b", "c"])[np.arange(900) % 3],
            "v": np.arange(900, dtype=np.int64),
        }
    )
    write_partitioned(
        rd.from_pandas(df).repartition(3), f"{base}/in", ["pt"],
        mode="overwrite",
    )
    _, s1 = incremental_aggregate(
        f"{base}/in", f"{base}/c", key_cols=["k"], value_col="v"
    )
    assert s1 == {"recomputed": 3, "cached": 0, "dropped": 0}
    out2, s2 = incremental_aggregate(
        f"{base}/in", f"{base}/c", key_cols=["k"], value_col="v"
    )
    assert s2 == {"recomputed": 0, "cached": 3, "dropped": 0}
    ref = df.groupby("k")["v"].sum()
    got = out2.to_pandas().set_index("k")["v"]
    assert (got.sort_index() == ref.sort_index()).all()
    # mutate one partition, delete another
    extra = pd.DataFrame({"k": ["a"], "v": [10_000]})
    pq.write_table(
        pa.Table.from_pandas(extra, preserve_index=False),
        f"{base}/in/pt=1/extra.parquet",
    )
    shutil.rmtree(f"{base}/in/pt=2")
    out3, s3 = incremental_aggregate(
        f"{base}/in", f"{base}/c", key_cols=["k"], value_col="v"
    )
    assert s3 == {"recomputed": 1, "cached": 1, "dropped": 1}
    ref3 = (
        pd.concat([df[df["pt"] != 2], extra.assign(pt=1)])
        .groupby("k")["v"]
        .sum()
    )
    got3 = out3.to_pandas().set_index("k")["v"]
    assert (got3.sort_index() == ref3.sort_index()).all()
