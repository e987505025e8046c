"""Byte-level span invariance through every stage, and the actor-pool
(concurrency=) code paths that the stateless default no longer exercises."""

import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.synth import build_spans_array, derive_xy, polygon_layer


@pytest.fixture(scope="module")
def span_docs(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])

    def add(b: pa.Table) -> pa.Table:
        did = np.asarray(b["doc_id"])
        x, y = derive_xy(did)
        return (
            b.append_column("x", pa.array(x))
            .append_column("y", pa.array(y))
            .append_column("spans", build_spans_array(did))
        )

    return ds.map_batches(add, batch_format="pyarrow")


def _spans_by_doc(df):
    return {
        int(d): [tuple(s.values()) for s in row]
        for d, row in zip(df["doc_id"], df["spans"])
    }


def test_spans_byte_identical_through_stages(span_docs, tmp_path):
    """The per-row (kind, text, media_ref, offset) sequence survives
    cell-encode -> spatial join -> partitioned write -> read back, element
    for element (golden property 6, FIXTURES.md)."""
    import ray.data as rd

    from pygridmap_ray.spatial import join_points_to_polygons
    from pygridmap_ray.tiler import with_cell_columns, write_partitioned

    before = _spans_by_doc(span_docs.to_pandas())
    ds = with_cell_columns(span_docs, resolution=1000.0, tile_size_cell=128)
    ds = join_points_to_polygons(ds, polygon_layer(), how="left")
    write_partitioned(ds, str(tmp_path / "out"), ["xt"])
    back = rd.read_parquet(str(tmp_path / "out"), file_extensions=["parquet"]).to_pandas()
    after = _spans_by_doc(back.drop_duplicates("doc_id"))
    assert set(before) == set(after)
    for d in before:
        assert before[d] == after[d], f"doc {d} spans changed"


def test_make_grid_actor_pool_path(ray_session):
    from pygridmap_ray.gridding import make_grid
    from pygridmap_ray.synth import DOMAIN

    mask = polygon_layer()
    a = (
        make_grid(mask, cellsize=25_000.0, bbox=DOMAIN)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    b = (
        make_grid(mask, cellsize=25_000.0, bbox=DOMAIN, concurrency=2)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_join_actor_pool_path(span_docs):
    from pygridmap_ray.spatial import join_points_to_polygons

    a = (
        join_points_to_polygons(span_docs, polygon_layer(), how="inner")
        .to_pandas()
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    b = (
        join_points_to_polygons(
            span_docs, polygon_layer(), how="inner", concurrency=2
        )
        .to_pandas()
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    assert a[["doc_id", "poly_id"]].equals(b[["doc_id", "poly_id"]])


def test_overlay_actor_pool_path(ray_session):
    from pygridmap_ray.gridding import make_grid
    from pygridmap_ray.overlay import overlay_fragments
    from pygridmap_ray.planning import plan_grid
    from pygridmap_ray.synth import DOMAIN

    spec = plan_grid(DOMAIN, 50_000.0, tile=(8, 8))
    grid = make_grid(True, cellsize=50_000.0, bbox=DOMAIN, tile=(8, 8))
    a = (
        overlay_fragments(grid, polygon_layer(), spec)
        .to_pandas()
        .sort_values(["cell_id", "poly_id"])
        .reset_index(drop=True)
    )
    b = (
        overlay_fragments(grid, polygon_layer(), spec, concurrency=2)
        .to_pandas()
        .sort_values(["cell_id", "poly_id"])
        .reset_index(drop=True)
    )
    assert a[["cell_id", "poly_id", "area"]].equals(b[["cell_id", "poly_id", "area"]])
