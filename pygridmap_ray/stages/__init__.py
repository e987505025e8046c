"""Stage kernels (map_batches bodies / actor classes) by pipeline role."""

from ..gridding import EmitCells, emit_tile_cells, make_grid  # noqa: F401
from ..joins import (  # noqa: F401
    asof_join,
    bloom_build,
    bloom_prefilter,
    interval_join,
    lookup_join,
    semi_join,
)
from ..multimodal import (  # noqa: F401
    ImageResizer,
    MediaDecoder,
    frame_sample,
    media_pipeline,
)
from ..overlay import (  # noqa: F401
    OverlayKernel,
    grid_overlay,
    overlay_fragments,
    poly_metrics,
)
from ..raster import (  # noqa: F401
    ContourKernel,
    D8Kernel,
    HillshadeKernel,
    RasterTileKernel,
    bilinear_raster,
    contour_raster,
    d8_flow_raster,
    hillshade_raster,
    profile_raster,
    resample_raster,
    tiling_raster,
)
from ..spatial import (  # noqa: F401
    KnnJoinKernel,
    PointJoinKernel,
    join_points_to_polygons,
    knn_join,
    ripley_k,
    variogram,
)
from ..tiler import (  # noqa: F401
    assign_cells,
    grid_aggregation,
    grid_tiling,
    grid_transformation,
    with_cell_columns,
    write_partitioned,
)
