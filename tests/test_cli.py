"""ray-job-submit entrypoint (pygridmap_ray.cli): flagship run + resume."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.cli import main
from pygridmap_ray.synth import build_spans_array, derive_xy


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("cli_corpus"))

    def synth(b):
        did = np.asarray(b["id"], dtype=np.int64)
        x, y = derive_xy(did)
        return pa.table(
            {"doc_id": did, "x": x, "y": y, "spans": build_spans_array(did)}
        )

    rd.range(5000, override_num_blocks=4).map_batches(
        synth, batch_format="pyarrow"
    ).write_parquet(d)
    return d


def test_flagship_run_and_resume(corpus, tmp_path, capsys, ray_session):
    out = str(tmp_path / "tiles")
    argv = [
        "flagship", "--input", corpus, "--output", out,
        "--level", "9", "--validate", "--n-polys", "100",
    ]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] > 0 and first["skipped"] is False
    man = json.load(open(os.path.join(out, "_manifest.json")))
    # per-partition lineage metrics present
    assert man["partitions"] and all(
        {"files", "rows", "bytes", "write_ms"} <= set(v)
        for v in man["partitions"].values()
    )
    assert sum(v["rows"] for v in man["partitions"].values()) == first["rows"]

    # identical config resumes without rewriting
    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["skipped"] is True and second["rows"] == first["rows"]

    # config change invalidates the fingerprint -> rerun
    argv2 = argv[:-1] + ["200"]  # different --n-polys
    assert main(argv2) == 0
    third = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert third["skipped"] is False


def test_rollup_cmd(corpus, tmp_path, capsys, ray_session):
    out = str(tmp_path / "roll")
    assert main(["rollup", "--input", corpus, "--output", out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] > 0
    assert os.path.exists(os.path.join(out, "_manifest.json"))


def test_incr_agg_cli(tmp_path, capsys, ray_session):
    import json

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pygridmap_ray.cli import main
    from pygridmap_ray.tiler import write_partitioned

    df = pd.DataFrame(
        {"pt": np.arange(300, dtype=np.int64) % 3,
         "k": ["a", "b"] * 150, "v": np.ones(300, dtype=np.int64)}
    )
    write_partitioned(
        rd.from_pandas(df).repartition(2), f"{tmp_path}/in", ["pt"],
        mode="overwrite",
    )
    rc = main([
        "incr-agg", "--input", f"{tmp_path}/in",
        "--cache", f"{tmp_path}/c", "--keys", "k", "--value", "v",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] == 2 and out["recomputed"] == 3
    rc = main([
        "incr-agg", "--input", f"{tmp_path}/in",
        "--cache", f"{tmp_path}/c", "--keys", "k", "--value", "v",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["recomputed"] == 0 and out["cached"] == 3
