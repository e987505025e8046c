"""GeoJSON layer reader, CSV cell paths, crop helpers, CRS check."""

import glob
import json

import numpy as np
import pandas as pd
import pytest

GEOJSON = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"NUTS_ID": "BE100", "pop": 42.5},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                    # hole, given in CCW (wrong) orientation -> reader fixes
                    [[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]],
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {"NUTS_ID": "BE200", "pop": 7.0},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[20, 0], [30, 0], [30, 10], [20, 10], [20, 0]]],
                    [[[40, 0], [45, 0], [45, 5], [40, 5], [40, 0]]],
                ],
            },
        },
        {"type": "Feature", "properties": {}, "geometry": {"type": "Point", "coordinates": [1, 1]}},
    ],
}


def test_read_geojson_layer(tmp_path):
    from pygridmap_ray.geom import points_in_rings
    from pygridmap_ray.sources.geojson import read_geojson_layer

    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(GEOJSON))
    layer = read_geojson_layer(str(p), id_property="NUTS_ID", keep_properties=("pop",))
    assert len(layer) == 2  # the Point feature is skipped
    a, b = layer
    assert a["nuts_id"] == "BE100" and a["pop"] == 42.5
    assert a["area"] == pytest.approx(100.0 - 16.0)  # hole subtracted
    assert b["area"] == pytest.approx(100.0 + 25.0)  # multipart summed
    # hole actually excludes points (orientation was auto-fixed)
    inside = points_in_rings(np.array([3.0, 1.0]), np.array([3.0, 1.0]), a["rings"])
    assert inside.tolist() == [False, True]
    assert b["bbox"] == (20.0, 0.0, 45.0, 10.0)


def test_geojson_layer_joins(ray_session, tmp_path):
    """The imported layer drops straight into the spatial join."""
    import ray.data as rd

    from pygridmap_ray.sources.geojson import read_geojson_layer
    from pygridmap_ray.spatial import join_points_to_polygons

    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(GEOJSON))
    layer = read_geojson_layer(str(p), id_property="NUTS_ID", keep_properties=("pop",))
    pts = rd.from_pandas(pd.DataFrame({"pid": [0, 1, 2], "x": [1.0, 3.0, 25.0], "y": [1.0, 3.0, 5.0]}))
    out = (
        join_points_to_polygons(pts, layer, how="left", attr_cols=("nuts_id", "pop"))
        .to_pandas()
        .sort_values("pid")
    )
    assert out["nuts_id"].tolist()[0] == "BE100"
    assert pd.isna(out["nuts_id"].tolist()[1])  # in the hole
    assert out["nuts_id"].tolist()[2] == "BE200"


def test_csv_cells_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from pygridmap_ray.tiler import (
        csv_to_parquet,
        read_cells_csv,
        with_cell_columns,
        write_partitioned,
    )

    df = pd.DataFrame(
        {"x": [0.0, 1000.0, 130_000.0], "y": [0.0, 2000.0, 1000.0], "pop": [1.0, 2.0, 3.5]}
    )
    csv_path = tmp_path / "cells.csv"
    df.to_csv(csv_path, index=False)
    ds = read_cells_csv(str(csv_path))
    ds = with_cell_columns(ds, resolution=1000.0, tile_size_cell=128)
    n = write_partitioned(
        ds, str(tmp_path / "tiles"), ["xt"], file_format="csv"
    )
    assert n == 3
    files = glob.glob(str(tmp_path / "tiles" / "xt=*" / "*.csv"))
    dirs = {f.split("/")[-2] for f in files}
    assert dirs == {"xt=0", "xt=1"}  # one dir per tile; files are per-block
    header = open(files[0]).readline().strip().strip('"').split('","')
    assert header[0] == "x" and header[1] == "y"  # x,y first
    # csv -> parquet conversion with int downcast
    csv_to_parquet(str(csv_path), str(tmp_path / "pq"))
    back = rd.read_parquet(str(tmp_path / "pq")).to_pandas()
    assert len(back) == 3


def test_crop_helpers(ray_session):
    import ray.data as rd

    from pygridmap_ray.gridding import make_grid
    from pygridmap_ray.overlay import crop_grid_bbox, crop_grid_tiles

    grid = make_grid(True, cellsize=10_000.0, bbox=(0, 0, 100_000, 100_000), tile=(5, 5))
    df = grid.to_pandas()
    sub = crop_grid_bbox(rd.from_pandas(df), (0, 0, 30_000, 30_000)).to_pandas()
    assert len(sub) == 16  # x,y in [0,30000] -> 4x4 LL corners
    tiles = crop_grid_tiles(rd.from_pandas(df), [0]).to_pandas()
    assert set(tiles["tile_id"]) == {0} and len(tiles) == 25


def test_check_ref_crs():
    from pygridmap_ray.tiler import check_ref_crs

    assert check_ref_crs("EPSG:3035", "EPSG:3035") == "EPSG:3035"
    assert check_ref_crs("EPSG:3035", None) == "EPSG:3035"
    with pytest.raises(ValueError, match="CRS mismatch"):
        check_ref_crs("EPSG:3035", "EPSG:4326")


def test_cells_to_geometry_wkb_and_rings(ray_session):
    """Geometry export stage: WKB layout decodes to the exact cell ring;
    ring-list format carries the same coordinates."""
    import ray.data as rd

    from pygridmap_ray.export import cells_to_geometry, wkb_to_rings
    from pygridmap_ray.geom.kernels import rings_area

    df = pd.DataFrame({"ix": [0, 3, -2], "iy": [1, 0, 5], "v": [1.0, 2.0, 3.0]})
    ds = rd.from_pandas(df).map_batches(
        lambda b: cells_to_geometry(b, resolution=100.0, x_origin=10.0),
        batch_format="pyarrow",
    )
    out = ds.to_pandas()
    ring = wkb_to_rings(out["geometry"].iloc[1])
    assert ring[0].tolist() == [10.0 + 300.0, 0.0]
    assert (ring[0] == ring[4]).all()  # closed
    assert abs(rings_area([ring[:4]]) - 100.0 * 100.0) < 1e-9
    ds2 = rd.from_pandas(df).map_batches(
        lambda b: cells_to_geometry(b, resolution=100.0, x_origin=10.0, fmt="rings"),
        batch_format="pyarrow",
    )
    flat = ds2.to_pandas()["geometry"].iloc[1]
    assert np.asarray(flat).reshape(5, 2).tolist() == ring.tolist()


def test_geojson_write_roundtrip(ray_session, tmp_path):
    """write_geojson_tiles output reads back through read_geojson_layer
    with identical geometry (area) and properties."""
    import ray.data as rd

    from pygridmap_ray.export import write_geojson_tiles
    from pygridmap_ray.sources.geojson import read_geojson_layer

    df = pd.DataFrame(
        {"ix": np.arange(6), "iy": np.arange(6) % 3, "pop": np.arange(6) * 2.0}
    )
    out = str(tmp_path / "gj")
    n = write_geojson_tiles(
        rd.from_pandas(df),
        out,
        resolution=1000.0,
        properties=("pop",),
    )
    assert n == 6
    layer = []
    for f in sorted(glob.glob(f"{out}/*.geojson")):
        layer.extend(read_geojson_layer(f, keep_properties=("pop",)))
    assert len(layer) == 6
    assert all(abs(p["area"] - 1000.0 * 1000.0) < 1e-6 for p in layer)
    assert sorted(p["pop"] for p in layer) == [0.0, 2.0, 4.0, 6.0, 8.0, 10.0]


def test_rings_to_wkb_roundtrip_and_cell_identity():
    """General WKB polygon codec: fixture round trip (incl. the hole
    polygon) and byte-identity with the fixed 93-byte cell layout."""
    import numpy as np

    from pygridmap_ray.export import (
        rings_to_wkb, wkb_to_polygon, wkb_to_rings,
    )
    from pygridmap_ray.synth import polygon_layer

    for p in polygon_layer():
        back = wkb_to_polygon(rings_to_wkb(p["rings"]))
        assert len(back) == len(p["rings"])
        for a, b in zip(back, p["rings"]):
            assert np.array_equal(a, np.asarray(b, float))
    rect = np.array(
        [[0.0, 0.0], [1000.0, 0.0], [1000.0, 1000.0], [0.0, 1000.0]]
    )
    w = rings_to_wkb([rect])
    assert len(w) == 93
    assert np.array_equal(wkb_to_rings(w)[:4], rect)
