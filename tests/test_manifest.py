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
