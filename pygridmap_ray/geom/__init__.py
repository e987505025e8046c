from .kernels import (  # noqa: F401
    TOL_EPS,
    as_ring,
    bbox_intersection,
    bbox_to_ring,
    bbox_union,
    cells_coverage,
    clip_area_rect,
    clip_ring_rect,
    clip_rings_rect,
    points_in_rings,
    rect_relation,
    ring_signed_area,
    rings_area,
    rings_bbox,
)
from .index import BBoxIndex  # noqa: F401
from .proj import (  # noqa: F401
    laea_forward,
    laea_inverse,
    reproject,
    reproject_rings,
    set_ref_crs,
    supported_crs,
    transform_xy,
    webmercator_forward,
    webmercator_inverse,
)
