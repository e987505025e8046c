"""Round-3 event-geo kernels: OD matrix, dwell runs — brute-force parity
on the real sf0.001 events table (partition-invariance via bucketed plans)."""

import duckdb
import numpy as np

from pygridmap_ray.hex import _pack, hex_axial
from pygridmap_ray.pipelines.relational import (
    events_hex_dwell,
    events_od_matrix,
)
from pygridmap_ray.synth import derive_xy

SIZE = 25_000.0


def _events(sf_dir):
    return duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).df()


def test_od_matrix_bruteforce(ray_session, sf_dir):
    out = (
        events_od_matrix(sf_dir, hex_size=SIZE)
        .to_pandas()
        .sort_values(["oq", "orr", "dq", "dr"])
        .reset_index(drop=True)
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    flows = {}
    for uid, g in ev.groupby("user_id", sort=True):
        fe = int(g["event_id"].iloc[0])
        le = int(g["event_id"].iloc[-1])
        ox, oy = derive_xy(np.array([fe]))
        dx, dy = derive_xy(np.array([le]))
        ok = tuple(int(v[0]) for v in hex_axial(ox, oy, SIZE))
        dk = tuple(int(v[0]) for v in hex_axial(dx, dy, SIZE))
        flows[(ok, dk)] = flows.get((ok, dk), 0) + 1
    assert len(out) == len(flows)
    for row in out.itertuples(index=False):
        assert flows[((row.oq, row.orr), (row.dq, row.dr))] == row.n_users


def test_hex_dwell_bruteforce(ray_session, sf_dir):
    out = (
        events_hex_dwell(sf_dir, hex_size=SIZE)
        .to_pandas()
        .set_index("user_id")["max_run"]
    )
    ev = _events(sf_dir).sort_values(["user_id", "us", "event_id"])
    x, y = derive_xy(ev["event_id"].to_numpy(np.int64))
    ev = ev.assign(hkey=_pack(*hex_axial(x, y, SIZE)))
    for uid, g in ev.groupby("user_id", sort=True):
        k = g["hkey"].to_numpy()
        best = run = 1
        for i in range(1, len(k)):
            run = run + 1 if k[i] == k[i - 1] else 1
            best = max(best, run)
        assert out[uid] == best
