"""Round-3 wave: link prediction, assortativity, ROC AUC, daily-series
ACF / cross-correlation, inter-arrival burstiness, Kaplan-Meier."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _mk(d):
    import ray.data as rd

    return rd.from_arrow(pa.table(d))


def test_adamic_adar_hand_graph(ray_session):
    from pygridmap_ray.graph import adamic_adar_table

    # path 0-1-2 plus edge 1-3: AA pairs through hub 1 (deg 3)
    edges = pa.table(
        {
            "u": pa.array([0, 1, 1], pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
            "w": pa.array([1, 1, 1], pa.int64()),
        }
    )
    out = adamic_adar_table(edges).to_pandas()
    out = out.sort_values(["u", "w"]).reset_index(drop=True)
    # non-adjacent two-hop pairs: (0,2),(0,3),(2,3), all via node 1
    assert list(zip(out.u, out.w)) == [(0, 2), (0, 3), (2, 3)]
    assert (out.n_common == 1).all()
    expect = round(1.0 / np.log(3.0), 6)
    assert np.allclose(out.aa, expect)


def test_adamic_adar_excludes_direct_edges(ray_session):
    from pygridmap_ray.graph import adamic_adar_table

    # triangle: every two-hop pair is also a direct edge -> empty
    edges = pa.table(
        {
            "u": pa.array([0, 0, 1], pa.int64()),
            "v": pa.array([1, 2, 2], pa.int64()),
            "w": pa.array([1, 1, 1], pa.int64()),
        }
    )
    assert adamic_adar_table(edges).num_rows == 0


def test_assortativity_star_is_negative_one(ray_session):
    from pygridmap_ray.graph import assortativity_table

    # star K1,3: perfectly disassortative, r = -1
    edges = pa.table(
        {
            "u": pa.array([0, 0, 0], pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
            "w": pa.array([1, 1, 1], pa.int64()),
        }
    )
    st = assortativity_table(edges).to_pandas().iloc[0]
    assert st.n_edges == 3
    assert st.assortativity == -1.0


def test_assortativity_regular_graph_is_null(ray_session):
    from pygridmap_ray.graph import assortativity_table

    # 4-cycle: all degrees equal -> zero variance -> None
    edges = pa.table(
        {
            "u": pa.array([0, 1, 2, 0], pa.int64()),
            "v": pa.array([1, 2, 3, 3], pa.int64()),
            "w": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    st = assortativity_table(edges).to_pandas().iloc[0]
    assert pd.isna(st.assortativity)


def test_pearson_int_matches_numpy():
    from pygridmap_ray.pipelines.relational import _pearson_int

    rng = np.random.RandomState(3)
    x = rng.randint(0, 100, 40).astype(np.int64)
    y = (x + rng.randint(-10, 10, 40)).astype(np.int64)
    got = _pearson_int(
        len(x), int(x.sum()), int(y.sum()), int((x * y).sum()),
        int((x * x).sum()), int((y * y).sum()),
    )
    assert abs(got - np.corrcoef(x, y)[0, 1]) < 1e-6
    # degenerate: constant series
    assert _pearson_int(3, 6, 6, 12, 12, 12) is None


def test_auc_hand_law(ray_session):
    """AUC of a perfect separator is 1, of a tie-heavy score is 0.5."""
    import duckdb

    from pygridmap_ray.pipelines.queries import _sql_auc_nchars, q_auc_nchars

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got = q_auc_nchars("/root/testdata/sf0.001").to_pandas()
    exp = con.sql(_sql_auc_nchars()).df()
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        exp.reindex(sorted(exp.columns), axis=1),
        check_dtype=False,
    )
    assert 0.0 <= got.auc[0] <= 1.0


def test_km_hand_example(ray_session, tmp_path):
    """Classic KM hand computation on a 4-user toy events table."""
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import DAY_US, events_survival

    # users: 1 converts day 1, 2 converts day 1, 3 converts day 3,
    # 4 never converts (censored at day 2)
    base = 1_700_000_000_000_000
    rows = [
        (1, "view", 0), (1, "purchase", 1 * DAY_US),
        (2, "view", 0), (2, "purchase", 1 * DAY_US + 5),
        (3, "view", 0), (3, "purchase", 3 * DAY_US),
        (4, "view", 0), (4, "click", 2 * DAY_US),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [base + r[2] for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_survival(str(tmp_path)).to_pandas()
    out = out.sort_values("t_day").reset_index(drop=True)
    # death times: day 1 (2 deaths, 4 at risk), day 3 (1 death, 1 at risk)
    assert list(out.t_day) == [1, 3]
    assert list(out.n_risk) == [4, 1]
    assert list(out.n_events) == [2, 1]
    assert out.survival[0] == 0.5
    assert out.survival[1] == 0.0


def test_interarrival_single_user(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import events_interarrival

    base = 1_700_000_000_000_000
    gaps = [10, 20, 30, 40]  # seconds
    ts = np.concatenate([[0], np.cumsum(gaps)]) * 1_000_000 + base
    t = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "user_id": pa.array([7] * len(ts), pa.int64()),
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_interarrival(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    g = np.array(gaps, np.float64)
    mean = g.mean()
    sd = np.sqrt(((g - mean) ** 2).mean())
    assert r.n_gaps == 4
    assert abs(r.mean_gap_s - mean) < 1e-6
    assert abs(r.cv - sd / mean) < 1e-6
    assert abs(r.burstiness - (sd - mean) / (sd + mean)) < 1e-6


def test_acf_constant_series_excluded(ray_session, tmp_path):
    """A flat daily series has zero variance -> no ACF rows."""
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import DAY_US, events_acf

    base = 1_700_000_000_000_000
    # 10 days x 3 events/day, identical counts
    ts = [base + d * DAY_US + k for d in range(10) for k in range(3)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_acf(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_hits_hand_bipartite(ray_session):
    from pygridmap_ray.graph import hits_scores

    # hubs {0,1}, auths {10, 11}; hub 0 -> both, hub 1 -> 10 only
    pairs = pa.table(
        {
            "a": pa.array([0, 0, 1], pa.int64()),
            "b": pa.array([10, 11, 10], pa.int64()),
        }
    )
    out = hits_scores(pairs).to_pandas()
    hub = out[out.kind == "hub"].set_index("node").score
    aut = out[out.kind == "auth"].set_index("node").score
    # auth 10 cited by both hubs -> max; hub 0 cites both auths -> max
    assert aut[10] == 1.0 and aut[11] < 1.0
    assert hub[0] == 1.0 and hub[1] < 1.0


def test_doc_keywords_hand_law(ray_session):
    import ray.data as rd

    from pygridmap_ray.text import doc_keywords

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["apple apple banana", "banana cherry", "cherry dog"],
                    pa.string(),
                ),
            }
        )
    )
    out = doc_keywords(docs, k=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    # apple: tf=2, df=1 -> 2*ln(3); banana: tf=1, df=2 -> ln(1.5)
    assert list(d0.tok) == ["apple", "banana"]
    assert abs(d0.tfidf.iloc[0] - round(2 * np.log(3.0), 6)) < 1e-9
    assert abs(d0.tfidf.iloc[1] - round(np.log(1.5), 6)) < 1e-9


def test_seasonal_decompose_additivity(ray_session):
    from pygridmap_ray.pipelines.relational import (
        events_seasonal_decompose,
    )

    out = events_seasonal_decompose("/root/testdata/sf0.001").to_pandas()
    if len(out):
        # n == trend + seasonal + remainder up to the 3 roundings
        resid = out.n - (out.trend + out.seasonal + out.remainder)
        assert np.abs(resid).max() < 1e-5
        # seasonal component sums to ~0 over one full week of weekdays
        wk = out.groupby(out.d % 7).seasonal.first()
        if len(wk) == 7:
            assert abs(wk.sum()) < 1e-4


def test_type_jaccard_hand(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import events_type_jaccard

    # users: 1 does A,B; 2 does A; 3 does B,C
    rows = [(1, "A"), (1, "B"), (2, "A"), (3, "B"), (3, "C"), (1, "A")]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_type_jaccard(str(tmp_path)).to_pandas()
    out = out.set_index(["type_a", "type_b"])
    ab = out.loc[("A", "B")]
    assert (ab.n_both, ab.n_a, ab.n_b) == (1, 2, 2)
    assert ab.jaccard == round(1 / 3, 6)
    bc = out.loc[("B", "C")]
    assert bc.jaccard == 0.5
    assert ("A", "C") not in out.index  # empty intersection emits no row


def test_naive_bayes_hand_law(ray_session):
    import ray.data as rd

    from pygridmap_ray.text import naive_bayes_lang

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["aa aa bb", "aa aa", "cc dd", "cc cc dd"], pa.string()
                ),
                "lang": pa.array(["x", "x", "y", "y"], pa.string()),
            }
        )
    )
    out = naive_bayes_lang(docs).to_pandas().set_index("doc_id")
    # each doc's own class dominates (its tokens are class-exclusive)
    assert list(out.loc[[0, 1]].pred_lang) == ["x", "x"]
    assert list(out.loc[[2, 3]].pred_lang) == ["y", "y"]
    # hand-check doc 1 score: prior ln(2/4) + 2*ln((c_aa+1)/(nt_x+V))
    # x tokens: aa x4, bb x1 -> nt_x=5, V=4; c(aa|x)=4
    expect = np.log(2 / 4) + 2 * np.log((4 + 1) / (5 + 4))
    assert abs(out.loc[1].score - round(expect, 6)) < 1e-9


def test_state_intervals_hand(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import (
        DAY_US, events_state_intervals,
    )

    base = 1_700_000_000_000_000
    # user 1: A on day 0 (two events, last wins), A on day 1, B on day 2,
    # gap, A on day 5
    rows = [
        (1, "B", 0), (1, "A", 10),            # day 0: last is A
        (1, "A", DAY_US),                     # day 1
        (1, "B", 2 * DAY_US),                 # day 2
        (1, "A", 5 * DAY_US),                 # day 5 after a gap
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([base + r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_state_intervals(str(tmp_path)).to_pandas()
    out = out.sort_values("from_day").reset_index(drop=True)
    base_day = base // DAY_US
    got = [
        (r.state, r.from_day - base_day, r.to_day - base_day, r.n_days)
        for r in out.itertuples()
    ]
    assert got == [("A", 0, 1, 2), ("B", 2, 2, 1), ("A", 5, 5, 1)]


def test_holt_linear_hand(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import (
        DAY_US, HOLT_ALPHA, HOLT_BETA, events_holt_linear,
    )

    base = 1_700_000_000_000_000
    counts = [4, 6, 5, 9]
    ts = [
        base + d * DAY_US + k
        for d, c in enumerate(counts)
        for k in range(c)
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_holt_linear(str(tmp_path)).to_pandas()
    assert len(out) == 3  # from the 2nd day on
    a, B = HOLT_ALPHA, HOLT_BETA
    lv, bv = 4.0, 2.0
    for i, n in enumerate(counts[1:]):
        fit = lv + bv
        nl = a * n + (1 - a) * (lv + bv)
        bv = B * (nl - lv) + (1 - B) * bv
        lv = nl
        assert abs(out.fitted[i] - round(fit, 6)) < 1e-9
        assert abs(out.level[i] - round(nl, 6)) < 1e-9
        assert abs(out.trend[i] - round(bv, 6)) < 1e-9


def test_transition_stationary_two_state(ray_session, tmp_path):
    """Two-state chain with known stationary distribution."""
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import (
        events_transition_stationary,
    )

    base = 1_700_000_000_000_000
    # one user cycling A->A->B->A->A->B ... : P(A->A)=.5, P(A->B)=.5,
    # P(B->A)=1 -> stationary (2/3, 1/3)
    seq = ["A", "A", "B"] * 40
    t = pa.table(
        {
            "event_id": pa.array(range(len(seq)), pa.int64()),
            "user_id": pa.array([1] * len(seq), pa.int64()),
            "event_type": pa.array(seq, pa.string()),
            "ts": pa.array(
                [base + i * 1000 for i in range(len(seq))],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_transition_stationary(str(tmp_path)).to_pandas()
    out = out.set_index("event_type").stationary
    assert abs(out["A"] - 2 / 3) < 0.02  # 8 iterations converge close
    assert abs(out["B"] - 1 / 3) < 0.02
    assert abs(out.sum() - 1.0) < 1e-6


def test_equalize_uniform_ramp(ray_session):
    """A nodata-free ramp raster equalizes to the identity ramp."""
    from pygridmap_ray.raster import RasterSource, equalize_raster

    class Ramp(RasterSource):
        width = 16
        height = 16
        resolution = 1.0
        x_min = 0.0
        y_min = 0.0
        bands = ("elev",)

        def read_window(self, band, r0, c0, h, w):
            base = np.arange(16 * 16, dtype=np.float64).reshape(16, 16)
            return base[r0 : r0 + h, c0 : c0 + w]

    out = equalize_raster(Ramp(), tile_size_cell=8).to_pandas()
    assert len(out) == 256
    out = out.sort_values("z").reset_index(drop=True)
    # uniform histogram: eq = (rank * 255) // 255 = rank for 256 levels
    assert list(out["eq"]) == list(range(256))


def test_events_rfm_hand_quartiles(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import DAY_US, events_rfm

    # user i (1..8): i events on day (8 - i), value 10*i each ->
    # recency 0..7 ascending, frequency 1..8, monetary 10*i*i —
    # all three metrics strictly ascending in i, so quartile scores
    # follow the closed NTILE-free boundary law exactly.
    base = 1_700_000_000_000_000
    uid, ts, val = [], [], []
    for i in range(1, 9):
        for j in range(i):
            uid.append(i)
            ts.append(base + (8 - i) * DAY_US + j)
            val.append(10.0 * i)
    t = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_rfm(str(tmp_path)).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert list(out.recency) == list(range(8))
    assert list(out.frequency) == list(range(1, 9))
    assert list(out.monetary) == [10.0 * i * i for i in range(1, 9)]
    assert list(out.r_score) == [4, 4, 3, 3, 2, 2, 1, 1]
    assert list(out.f_score) == [1, 1, 2, 2, 3, 3, 4, 4]
    assert list(out.m_score) == [1, 1, 2, 2, 3, 3, 4, 4]
    assert list(out.rfm_code) == [
        r * 100 + f * 10 + m
        for r, f, m in zip(out.r_score, out.f_score, out.m_score)
    ]


def test_assoc_rules_hand_baskets(ray_session):
    from pygridmap_ray.graph import assoc_rules

    # baskets: u1={A,B}, u2={A,B} (with a duplicate row), u3={A,C}, u4={B}
    t = pa.table(
        {
            "u": pa.array([1, 1, 2, 2, 2, 3, 3, 4], pa.int64()),
            "it": pa.array(
                ["A", "B", "A", "B", "B", "A", "C", "B"], pa.string()
            ),
        }
    )
    import ray.data as rd

    out = assoc_rules(rd.from_arrow(t), "u", "it").to_pandas()
    out = out.sort_values(["antecedent", "consequent"]).reset_index(
        drop=True
    )
    got = {
        (r.antecedent, r.consequent): (
            r.n_both, r.n_ante, r.n_cons, r.n_baskets,
            r.support, r.confidence, r.lift,
        )
        for r in out.itertuples()
    }
    assert got == {
        ("A", "B"): (2, 3, 3, 4, 0.5, 0.666667, 0.888889),
        ("B", "A"): (2, 3, 3, 4, 0.5, 0.666667, 0.888889),
        ("A", "C"): (1, 3, 1, 4, 0.25, 0.333333, 1.333333),
        ("C", "A"): (1, 1, 3, 4, 0.25, 1.0, 1.333333),
    }


def test_events_ltv_hand_curve(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.relational import WEEK_US, events_ltv

    W = 2809  # arbitrary absolute week id
    rows = [  # (user, week, value)
        (1, W, 10.0), (1, W + 1, 20.0),   # cohort W, cum 10 -> 30
        (2, W + 1, 5.0),                  # cohort W+1, cum 5
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] * WEEK_US for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_ltv(str(tmp_path)).to_pandas()
    out = out.sort_values(["cohort_week", "offset_weeks"]).reset_index(
        drop=True
    )
    got = [
        (r.cohort_week - W, r.offset_weeks, r.n_users, r.cum_rev, r.arpu)
        for r in out.itertuples()
    ]
    assert got == [(0, 0, 1, 10.0, 10.0), (0, 1, 1, 30.0, 30.0),
                   (1, 0, 1, 5.0, 5.0)]


def test_mutual_info_independent_is_zero(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pygridmap_ray.pipelines.queries import q_mutual_info

    # perfectly independent 2x2 (all four cells equal) -> MI = 0, and
    # perfectly dependent diagonal -> MI = ln 2 = entropy, NMI = 1
    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "lang": pa.array(["en", "en", "de", "de"] * 2, pa.string()),
            "source": pa.array(["a", "b"] * 4, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_mutual_info(str(tmp_path)).to_pandas().iloc[0]
    assert out.n == 8 and out.mi == 0.0 and out.nmi == 0.0

    t2 = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "lang": pa.array(["en", "de"] * 4, pa.string()),
            "source": pa.array(["a", "b"] * 4, pa.string()),
        }
    )
    pq.write_table(t2, str(tmp_path / "documents.parquet"))
    out2 = q_mutual_info(str(tmp_path)).to_pandas().iloc[0]
    ln2 = round(float(np.log(2.0)), 6)
    assert out2.mi == ln2 and out2.h_lang == ln2 and out2.nmi == 1.0


def test_trimmed_mean_hand_band(ray_session):
    import ray.data as rd

    from pygridmap_ray.stats import trimmed_mean

    # values 1..10 plus an outlier 1000: over 11 values the q05 fence
    # interpolates to 1.5 (h = 0.05*10 between v1=1 and v2=2) and q95 to
    # 505 (between 10 and 1000) — so BOTH tails trim one row each:
    # kept = 2..10, trimmed mean = 54/9 = 6.0
    vals = list(range(1, 11)) + [1000]
    t = pa.table(
        {
            "k": pa.array(["a"] * 11, pa.string()),
            "v": pa.array([float(x) for x in vals], pa.float64()),
        }
    )
    out = trimmed_mean(
        rd.from_arrow(t), key="k", value="v"
    ).to_pandas().iloc[0]
    assert out.n_total == 11 and out.n_kept == 9
    assert out.trimmed_mean == 6.0
