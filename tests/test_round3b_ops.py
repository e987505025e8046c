"""Round-3 continuation wave: PMI collocations, fuzzy vocabulary join,
triangle census, seasonal-naive backtest, terrain indices, and the
driver-final distinct-pair variant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(d):
    import ray.data as rd

    return rd.from_arrow(pa.table(d))


def test_levenshtein_block_matches_reference(ray_session):
    from pygridmap_ray.text import _levenshtein_block

    def ref(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, lb + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[lb]

    rng = np.random.RandomState(7)
    alpha = "abcd"
    words_a = ["".join(rng.choice(list(alpha), rng.randint(1, 8)))
               for _ in range(12)]
    words_b = ["".join(rng.choice(list(alpha), rng.randint(1, 8)))
               for _ in range(9)]
    La = max(len(w) for w in words_a)
    Lb = max(len(w) for w in words_b)
    A = np.zeros((len(words_a), La), np.uint8)
    B = np.zeros((len(words_b), Lb), np.uint8)
    for i, w in enumerate(words_a):
        A[i, : len(w)] = np.frombuffer(w.encode(), np.uint8)
    for i, w in enumerate(words_b):
        B[i, : len(w)] = np.frombuffer(w.encode(), np.uint8)
    la = np.array([len(w) for w in words_a], np.int64)
    lb = np.array([len(w) for w in words_b], np.int64)
    got = _levenshtein_block(A, la, B, lb)
    for i, wa in enumerate(words_a):
        for j, wb in enumerate(words_b):
            assert got[i, j] == ref(wa, wb), (wa, wb)


def test_fuzzy_vocab_pairs_small(ray_session):
    from pygridmap_ray.text import fuzzy_vocab_pairs

    docs = _mk(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["cat bat cart", "cat dog", "frog dog dig"], pa.string()
            ),
        }
    )
    out = fuzzy_vocab_pairs(docs, max_dist=2).to_pandas()
    out = out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True)
    pairs = set(zip(out.tok_a, out.tok_b))
    # cat-bat 1, cat-cart 2, bat-cart 3(no)... dig-dog 1, dog-frog >2
    assert ("bat", "cat") in pairs
    assert ("cart", "cat") in pairs
    assert ("dig", "dog") in pairs
    assert all(a < b for a, b in pairs)
    row = out[(out.tok_a == "bat") & (out.tok_b == "cat")].iloc[0]
    assert row.dist == 1 and row.cnt_a == 1 and row.cnt_b == 2


def test_pmi_bigrams_hand_law(ray_session):
    from pygridmap_ray.text import pmi_bigrams

    docs = _mk(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b a b", "a b"], pa.string()),
        }
    )
    out = pmi_bigrams(docs, min_count=1).to_pandas()
    out = out.set_index(["w1", "w2"])
    # N1=10 tokens (6a? no: a b a b + a b = 4+2 tokens each word: a x3, b x3)
    # tokens: a,b,a,b,a,b -> c_a=3, c_b=3, N1=6; bigrams: (a b)x3, (b a)x1, N2=4
    ab = out.loc[("a", "b")]
    assert ab.cnt == 3
    expect = np.log(((3.0 * 6.0) * 6.0) / ((3.0 * 3.0) * 4.0))
    assert abs(ab.pmi - round(expect, 6)) < 1e-9


def test_triangle_stats_known_graph(ray_session):
    from pygridmap_ray.graph import triangle_stats

    # K4 plus a pendant: 4 triangles? K4 has C(4,3)=4 triangles.
    edges = pa.table(
        {
            "u": pa.array([0, 0, 0, 1, 1, 2, 0], pa.int64()),
            "v": pa.array([1, 2, 3, 2, 3, 3, 9], pa.int64()),
            "w": pa.array([1] * 7, pa.int64()),
        }
    )
    st = triangle_stats(edges).to_pandas().iloc[0]
    assert st.n_nodes == 5
    assert st.n_edges == 7
    assert st.n_triangles == 4
    # degrees: 0->4, 1..3 ->3 each, 9->1; wedges = 6+3+3+3+0 = 15
    assert st.n_wedges == 15
    assert st.clustering == round(12.0 / 15.0, 6)


def test_cooccurrence_edge_table(ray_session):
    from pygridmap_ray.graph import cooccurrence_edge_table

    # groups: {1,2,3} x2, {1,2} x1 -> pair (1,2) w=3, (1,3) w=2, (2,3) w=2
    g = [10, 10, 10, 11, 11, 11, 12, 12]
    it = [1, 2, 3, 1, 2, 3, 1, 2]
    ds = _mk({"g": pa.array(g, pa.int64()), "i": pa.array(it, pa.int64())})
    edges = cooccurrence_edge_table(ds, "g", "i", min_weight=3).to_pandas()
    assert len(edges) == 1
    assert (edges.u[0], edges.v[0], edges.w[0]) == (1, 2, 3)
    edges2 = cooccurrence_edge_table(ds, "g", "i", min_weight=2).to_pandas()
    assert len(edges2) == 3


def test_distinct_int_pairs_table(ray_session):
    from pygridmap_ray.graph import distinct_int_pairs_table

    ds = _mk(
        {
            "a": pa.array([1, 1, 2, 2, 1], pa.int64()),
            "b": pa.array([5, 5, 6, 6, 7], pa.int64()),
        }
    ).repartition(3)
    t = distinct_int_pairs_table(ds, "a", "b").to_pandas()
    assert sorted(zip(t.a, t.b)) == [(1, 5), (1, 7), (2, 6)]


def test_terrain_index_hand_window(ray_session):
    """3x3 all-valid window: tpi/tri/rough laws on a hand grid."""
    from pygridmap_ray.raster import (NODATA, RasterSource,
                                      terrain_index_raster)

    class Tiny(RasterSource):
        width = 3
        height = 3
        resolution = 1.0
        x_min = 0.0
        y_min = 0.0

        def read_window(self, band, r0, c0, h, w):
            z = np.arange(9, dtype=np.float64).reshape(3, 3) ** 2
            return z[r0 : r0 + h, c0 : c0 + w]

    out = terrain_index_raster(Tiny(), tile_size_cell=3).to_pandas()
    assert len(out) == 1  # only the interior pixel
    z = np.arange(9, dtype=np.float64).reshape(3, 3) ** 2
    zc = z[1, 1]
    nb = np.array([z[0, 0], z[0, 1], z[0, 2], z[1, 0], z[1, 2],
                   z[2, 0], z[2, 1], z[2, 2]])
    assert out.tpi[0] == zc - nb.sum() / 8.0
    assert out.tri[0] == np.sqrt(((zc - nb) ** 2).sum())
    assert out.rough[0] == max(zc, nb.max()) - min(zc, nb.min())
