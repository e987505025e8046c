"""Partitioned-hash-join spatial join equals the broadcast join."""

import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.synth import derive_xy, polygon_layer


@pytest.fixture(scope="module")
def pts(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])

    def add(b: pa.Table) -> pa.Table:
        x, y = derive_xy(np.asarray(b["doc_id"]))
        return b.append_column("x", pa.array(x)).append_column("y", pa.array(y))

    return ds.map_batches(add, batch_format="pyarrow")


def test_cell_index_join_equals_broadcast(pts):
    from pygridmap_ray.spatial import (
        join_points_to_polygons,
        join_points_via_cell_index,
    )

    layer = polygon_layer()
    broadcast = (
        join_points_to_polygons(pts, layer, how="inner")
        .to_pandas()[["doc_id", "poly_id"]]
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    hashed = (
        join_points_via_cell_index(pts, layer, resolution=10_000.0, num_partitions=8)
        .to_pandas()[["doc_id", "poly_id"]]
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    assert broadcast.equals(hashed)


def test_polygon_cells_index_flags(ray_session):
    from pygridmap_ray.spatial import polygon_cells_index

    layer = polygon_layer()
    idx = polygon_cells_index(layer, resolution=10_000.0).to_pandas()
    # P0 is a 200km x 150km rect at 10km cells: 20*15 cells, ALL full
    # (polygon edges are grid-aligned)
    p0 = idx[idx.poly_id == 0]
    assert len(p0) == 20 * 15 and p0["full"].all()
    # the hole polygon (P3) excludes its hole cells
    p3 = idx[idx.poly_id == 3]
    assert len(p3) == 20 * 20 - 10 * 10
