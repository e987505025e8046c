"""Distributed moments / covariance / PCA vs numpy ground truth."""

import numpy as np
import pandas as pd


def _emb_ds(x, blocks):
    import ray.data as rd

    df = pd.DataFrame(
        {"vec_id": np.arange(len(x), dtype=np.int64),
         "embedding": [row.astype(np.float32).tolist() for row in x]}
    )
    return rd.from_pandas(df).repartition(blocks)


def test_moments_match_numpy_and_partitioning(ray_session):
    from pygridmap_ray.stats import embedding_moments

    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 8))
    x32 = x.astype(np.float32).astype(np.float64)  # engine widens f32->f64
    for blocks in (1, 7):
        n, s, xx = embedding_moments(_emb_ds(x, blocks))
        assert n == 300
        np.testing.assert_allclose(s, x32.sum(axis=0), rtol=1e-12)
        np.testing.assert_allclose(xx, x32.T @ x32, rtol=1e-12)


def test_pca_project_matches_numpy(ray_session):
    from pygridmap_ray.stats import pca_project

    rng = np.random.default_rng(11)
    # anisotropic cloud: stretched along a known direction
    base = rng.normal(size=(400, 6)) * np.array([5.0, 2.0, 1, 0.5, 0.2, 0.1])
    got = (
        pca_project(_emb_ds(base, 5), k=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = base.astype(np.float32).astype(np.float64)
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2].T.copy()
    flip = np.abs(comps).argmax(axis=1)
    sign = np.sign(comps[np.arange(2), flip])
    comps *= np.where(sign == 0, 1.0, sign)[:, None]
    ref = (x - mu) @ comps.T
    np.testing.assert_allclose(got["pc1"].to_numpy(), ref[:, 0], atol=1e-8)
    np.testing.assert_allclose(got["pc2"].to_numpy(), ref[:, 1], atol=1e-8)
    # variance ordering: pc1 explains more than pc2
    assert got["pc1"].var() > got["pc2"].var()


def test_pca_project_deterministic_sign(ray_session):
    from pygridmap_ray.stats import pca_project

    rng = np.random.default_rng(4)
    x = rng.normal(size=(200, 4)) * np.array([3.0, 1.0, 0.3, 0.1])
    a = pca_project(_emb_ds(x, 3), k=1).to_pandas().sort_values("vec_id")
    b = pca_project(_emb_ds(x, 8), k=1).to_pandas().sort_values("vec_id")
    np.testing.assert_allclose(
        a["pc1"].to_numpy(), b["pc1"].to_numpy(), atol=1e-9
    )
