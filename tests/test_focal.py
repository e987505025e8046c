"""focal.focal_counts — neighbourhood sums over sparse cells."""

import numpy as np
import pyarrow as pa
import pytest


def _run(rows, **kw):
    import ray.data as rd

    from pygridmap_ray.focal import focal_counts

    ds = rd.from_arrow(
        pa.table(
            {
                "ix": pa.array([r[0] for r in rows], pa.int64()),
                "iy": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = focal_counts(ds, **kw).to_pandas()
    return out.sort_values(["ix", "iy"], ignore_index=True)


def test_focal_isolated_cell(ray_session):
    # one occupied cell, 3 points: focal sum = its own count only
    out = _run([(5, 5)] * 3)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_docs"], r["focal_sum"]) == (3, 3)
    assert r["focal_mean"] == pytest.approx(3 / 9.0, abs=1e-6)


def test_focal_adjacent_and_diagonal(ray_session):
    # (0,0)x2, (1,0)x1, (2,2)x5: (0,0) and (1,0) are mutual neighbours;
    # (2,2) is Chebyshev distance 2 from both -> isolated at ksize=1
    out = _run([(0, 0), (0, 0), (1, 0), (2, 2)] + [(2, 2)] * 4)
    got = {(r.ix, r.iy): (r.n_docs, r.focal_sum) for r in out.itertuples()}
    assert got[(0, 0)] == (2, 3)  # self 2 + neighbour (1,0) 1
    assert got[(1, 0)] == (1, 3)  # self 1 + neighbour (0,0) 2
    assert got[(2, 2)] == (5, 5)  # no occupied cell within distance 1


def test_focal_ksize2(ray_session):
    # ksize=2: (0,0) and (2,2) now see each other (Chebyshev distance 2)
    out = _run([(0, 0), (2, 2), (2, 2)], ksize=2)
    got = {(r.ix, r.iy): (r.n_docs, r.focal_sum) for r in out.itertuples()}
    assert got[(0, 0)] == (1, 3)
    assert got[(2, 2)] == (2, 3)
    assert out["focal_mean"].iloc[0] == pytest.approx(3 / 25.0, abs=1e-6)


def test_focal_negative_cell_rejected(ray_session):
    with pytest.raises(Exception):
        _run([(-1, 0)])
