"""pygridmap_ray — a Ray-Data-native spatial gridding + overlay engine.

From-scratch re-expression of the query/data-processing capabilities of
eurostat/pygridmap (reference at /root/reference) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow batches, actor pools for
stateful stages (polygon indexes, raster handles), explicit shuffles only
where semantics demand (groupby/sort/partitioned write).

Public surface (mirrors SURVEY.md §2):

- :mod:`pygridmap_ray.planning`   — grid/tile planning math (base.py)
- :mod:`pygridmap_ray.gridding`   — ``make_grid`` (GridMaker)
- :mod:`pygridmap_ray.overlay`    — ``grid_overlay`` / ``area_interpolate``
- :mod:`pygridmap_ray.tiler`      — ``grid_tiling`` / ``grid_transformation``
                                     / ``grid_aggregation`` (gridtiler.py)
- :mod:`pygridmap_ray.raster`     — raster→vector tiling (gridtiler_raster.py)
- :mod:`pygridmap_ray.geom`       — numpy geometry kernels + bbox index
- :mod:`pygridmap_ray.synth`      — deterministic geo fixtures (+ SQL twins)
- :mod:`pygridmap_ray.text`       — language-ID / quality / tokens / fingerprint
- :mod:`pygridmap_ray.dedup`      — exact / MinHash-LSH / SimHash / embedding dedup
- :mod:`pygridmap_ray.ann`        — similarity search over embeddings
- :mod:`pygridmap_ray.frame`     — generic batch/row UDF apply (FrameProcessor)

No module in this package calls ``ray.init`` — sessions are owned by the
caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
