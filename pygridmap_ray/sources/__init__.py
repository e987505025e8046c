"""Data sources: synthetic corpora/layers and raster readers."""

from ..raster import RasterSource, SyntheticRaster  # noqa: F401
from ..synth import (  # noqa: F401
    bench_polygon_layer,
    build_spans_array,
    derive_xy,
    polygon_layer,
)
from ..tiler import read_tiles  # noqa: F401
