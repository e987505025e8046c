"""qtree/prll output equality (the G3 conformance target), grid-origin
alignment, dataset bbox, and salted aggregation equivalence."""

import numpy as np
import pandas as pd
import pytest

from pygridmap_ray.gridding import make_grid
from pygridmap_ray.planning import align_pos_location, dataset_bbox
from pygridmap_ray.synth import DOMAIN, polygon_layer


@pytest.mark.parametrize("cellsize,interior", [(10_000.0, False), (7_500.0, False), (7_500.0, True)])
def test_qtree_equals_prll(ray_session, cellsize, interior):
    kw = dict(cellsize=cellsize, bbox=DOMAIN, tile=(16, 16), interior=interior)
    mask = polygon_layer()
    a = (
        make_grid(mask, mode="prll", **kw)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    b = (
        make_grid(mask, mode="qtree", **kw)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert a["cell_id"].tolist() == b["cell_id"].tolist()
    for c in ["ix", "iy", "tile_id", "intersects", "within"]:
        assert a[c].tolist() == b[c].tolist(), c
    assert np.array_equal(a["x"].to_numpy(), b["x"].to_numpy())


def test_make_grid_bad_mode(ray_session):
    with pytest.raises(ValueError, match="mode"):
        make_grid(True, cellsize=1000.0, bbox=(0, 0, 5000, 5000), mode="turbo")


def test_align_pos_location():
    got = align_pos_location((1000.0, 1000.0), (1230.0, 4560.0, 7890.0, 9990.0))
    assert got == (1000.0, 4000.0, 8000.0, 10000.0)
    # non-zero anchor: lines pass through (500, 250)
    got = align_pos_location((1000.0, 500.0), (1230.0, 4560.0, 7890.0, 9990.0), (500.0, 250.0))
    assert (got[0] - 500.0) % 1000.0 == 0 and got[0] <= 1230.0
    assert (got[1] - 250.0) % 500.0 == 0 and got[1] <= 4560.0


def test_dataset_bbox(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"x": [3.0, -1.0, 7.5], "y": [0.0, 9.0, 4.0]})
    assert dataset_bbox(rd.from_pandas(df)) == (-1.0, 0.0, 7.5, 9.0)


def test_salted_agg_equals_plain(ray_session):
    """Salted two-phase collect produces the same per-key result as a
    direct groupby — exercised on a skewed key distribution (one hot key
    holds 80% of rows, like a dense urban cell)."""
    import ray.data as rd

    from pygridmap_ray.state.skew import salted_groupby_agg

    rng = np.random.default_rng(3)
    n = 5000
    key = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 20, n))
    df = pd.DataFrame({"cell": key.astype(np.int64), "rowid": np.arange(n), "v": rng.random(n)})

    def partial_fn(g):
        return pd.DataFrame({"s": [g["v"].sum()], "c": [len(g)]})

    def merge_fn(g):
        return pd.DataFrame({"v_sum": [g["s"].sum()], "n": [int(g["c"].sum())]})

    got = (
        salted_groupby_agg(
            rd.from_pandas(df),
            ["cell"],
            salt_col="rowid",
            nsalt=8,
            partial_fn=partial_fn,
            merge_fn=merge_fn,
        )
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("cell")
        .agg(v_sum=("v", "sum"), n=("v", "size"))
        .reset_index()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert got["cell"].tolist() == exp["cell"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert np.allclose(got["v_sum"], exp["v_sum"])
