"""GeoJSON vector-layer reader (pure json — no geopandas/fiona).

The reference loads its polygon layers with ``gpd.read_file`` (GISCO
border / NUTS GeoJSON, tests/overlay.ipynb cell 16); this reader parses
Polygon / MultiPolygon features into the engine's broadcast layer format
(list of dicts with ``rings``/``bbox``/attrs) so any GISCO-style GeoJSON
drops straight into make_grid / grid_overlay / join_points_to_polygons.
"""

from __future__ import annotations

import json

import numpy as np

from ..geom.kernels import as_ring, rings_area


def _polygon_rings(coords) -> list[np.ndarray]:
    """GeoJSON Polygon coordinates -> ring list; holes re-oriented CW so
    signed areas subtract (engine convention, geom.kernels docstring)."""
    out = []
    for i, ring_coords in enumerate(coords):
        r = as_ring(ring_coords)
        area = rings_area([r])
        if i == 0:  # exterior CCW
            if area < 0:
                r = r[::-1].copy()
        else:  # hole CW
            if area > 0:
                r = r[::-1].copy()
        out.append(r)
    return out


def read_geojson_layer(
    path_or_obj,
    *,
    id_property: str | None = None,
    keep_properties: tuple[str, ...] = (),
) -> list[dict]:
    """FeatureCollection -> broadcast polygon layer.

    ``id_property``: feature property to use as ``nuts_id`` (falls back to
    the feature ``id`` or the index).  Numeric properties named in
    ``keep_properties`` are copied onto the layer dicts (e.g. the
    extensive variable for area interpolation); names colliding with
    engine-computed keys (``area``, ``poly_id``, ...) are stored as
    ``prop_<name>`` instead of clobbering them.
    """
    if isinstance(path_or_obj, (str,)):
        with open(path_or_obj) as f:
            gj = json.load(f)
    else:
        gj = path_or_obj
    feats = gj["features"] if gj.get("type") == "FeatureCollection" else [gj]
    layer = []
    for i, feat in enumerate(feats):
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        if gtype == "Polygon":
            rings = _polygon_rings(geom["coordinates"])
        elif gtype == "MultiPolygon":
            rings = []
            for part in geom["coordinates"]:
                rings.extend(_polygon_rings(part))
        else:
            continue  # points/lines are not layer geometries
        if not rings:  # empty coordinates occur in real exports -> skip
            continue
        props = feat.get("properties") or {}
        nuts_id = str(
            props.get(id_property)
            if id_property and id_property in props
            else feat.get("id", i)
        )
        xs = np.concatenate([r[:, 0] for r in rings])
        ys = np.concatenate([r[:, 1] for r in rings])
        d = {
            "poly_id": len(layer),
            "nuts_id": nuts_id,
            "rings": rings,
            "bbox": (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())),
            "area": rings_area(rings),
        }
        for k in keep_properties:
            if k in props:
                # engine-computed keys must not be clobbered by feature
                # attributes (GISCO exports often carry their own 'area');
                # conflicting names land under a 'prop_' prefix
                key = f"prop_{k}" if k in d else k
                d[key] = float(props[k])
        layer.append(d)
    return layer
