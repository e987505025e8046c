"""GridOverlay — spatial join / intersection / union / areal interpolation.

Ray-Data-native re-expression of the reference ``GridOverlay``
(reference overlay.py:187-605).  Architecture:

1. **Fragment stage** (:class:`OverlayKernel`, an actor pool): the polygon
   layer + its bbox index are built ONCE per actor (the reference rebuilds
   ``poly.sindex`` inside every tile task, overlay.py:258); each grid-cell
   batch is joined against candidate polygons and clipped — one output row
   per (cell, polygon) pair with positive overlap area (reference
   clip_polygon + overlay_polygon + area_overlay, overlay.py:244-335).
   ``how='union'`` additionally emits one remainder row per cell with
   uncovered area and null polygon attributes (the NaN ``__area_pct__``
   rows of the reference union output, overlay.ipynb cell 34).
2. **Aggregation stage** (global Ray groupby on ``cell_id`` — equivalent
   to the reference's per-tile groupby because cells never span tiles,
   SURVEY.md §2.3 note): ``cover`` collect-list (overlay.py:312-323) and
   attribute rules sum/min/max/list (overlay.py:338-374).

Remainder semantics (documented): remainder area = max(0, cell_area −
Σ fragment areas) — exact when the polygon layer is non-overlapping,
which holds for every union test the reference exercises (grid-on-grid).

Partitioning assumption: fragment batches should be spatially coherent
(e.g. straight from ``make_grid`` tiles) so the per-polygon dense
coverage window stays small; a shuffled grid still computes correctly but
with larger windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .geom.index import BBoxIndex
from .geom.kernels import TOL_EPS, cells_coverage
from .planning import GridSpec

RULES = ("sum", "min", "max", "list")


class OverlayKernel:
    """Actor-pool fragment producer: broadcast polygon layer in state."""

    def __init__(
        self,
        polygons,
        cellsize: tuple[float, float],
        origin: tuple[float, float],
        how: str = "intersection",
        attr_cols: tuple[str, ...] = ("nuts_id", "pop"),
    ):
        import ray

        if isinstance(polygons, dict) and "__ref__" in polygons:
            polygons = ray.get(polygons["__ref__"])
        self.polys = polygons
        self.index = BBoxIndex(np.array([p["bbox"] for p in polygons]))
        self.w, self.h = float(cellsize[0]), float(cellsize[1])
        self.ox, self.oy = float(origin[0]), float(origin[1])
        if how not in ("intersection", "union"):
            raise ValueError(f"how must be intersection|union, got {how!r}")
        self.how = how
        self.attr_cols = attr_cols
        # null-column types for remainder/empty rows derive from the ACTUAL
        # layer values — the first NON-NULL value across the layer, so a
        # None (or heterogeneous) leading polygon cannot misclassify the
        # column and crash pa.array() at fragment-emission time
        def _first_type(c):
            for p in polygons:
                v = p.get(c)
                if v is not None:
                    return pa.string() if isinstance(v, str) else pa.float64()
            return pa.float64()

        self.attr_types = {c: _first_type(c) for c in attr_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return self._empty(batch)
        ix = np.asarray(batch["ix"], dtype=np.int64)
        iy = np.asarray(batch["iy"], dtype=np.int64)
        w, h = self.w, self.h
        cx0 = self.ox + ix * w
        cy0 = self.oy + iy * h
        cell_area = w * h
        frag_sum = np.zeros(n, dtype=np.float64)
        parts: list[pa.Table] = []
        # prune to polygons whose bbox overlaps this batch's extent — for
        # NUTS-scale layers a spatially-coherent batch touches only a few
        cand_ids = self.index.query(
            float(cx0.min()),
            float(cy0.min()),
            float(cx0.max()) + w,
            float(cy0.max()) + h,
        )
        for p in (self.polys[int(i)] for i in cand_ids):
            bx0, by0, bx1, by1 = p["bbox"]
            sel = (cx0 < bx1) & (cx0 + w > bx0) & (cy0 < by1) & (cy0 + h > by0)
            if not sel.any():
                continue
            pos_all = np.nonzero(sel)[0]
            six, siy = ix[pos_all], iy[pos_all]
            ix0, ix1 = int(six.min()), int(six.max())
            iy0, iy1 = int(siy.min()), int(siy.max())
            cov = cells_coverage(
                p["rings"],
                self.ox + ix0 * w,
                self.oy + iy0 * h,
                w,
                h,
                ix1 - ix0 + 1,
                iy1 - iy0 + 1,
            )
            areas = cov[siy - iy0, six - ix0]
            hit = areas > 0.0
            if not hit.any():
                continue
            pos = pos_all[hit]
            a = areas[hit]
            frag_sum[pos] += a
            t = batch.take(pa.array(pos))
            t = t.append_column("poly_id", pa.array(np.full(len(pos), p["poly_id"]), pa.int64()))
            for c in self.attr_cols:
                # coerce through attr_types: a Python-int attribute would
                # otherwise infer int64 on fragment rows and clash with the
                # float64 nulls of union remainders
                t = t.append_column(c, pa.array([p[c]] * len(pos), self.attr_types[c]))
            t = t.append_column("poly_area", pa.array(np.full(len(pos), p["area"])))
            t = t.append_column("area", pa.array(a))
            t = t.append_column("area_pct", pa.array(a / p["area"]))
            parts.append(t)
        if self.how == "union":
            rem = cell_area - frag_sum
            keep = rem > cell_area * TOL_EPS
            if keep.any():
                pos = np.nonzero(keep)[0]
                t = batch.take(pa.array(pos))
                t = t.append_column("poly_id", pa.nulls(len(pos), pa.int64()))
                for c in self.attr_cols:
                    t = t.append_column(c, pa.nulls(len(pos), self.attr_types[c]))
                t = t.append_column("poly_area", pa.nulls(len(pos), pa.float64()))
                t = t.append_column("area", pa.array(rem[pos]))
                t = t.append_column("area_pct", pa.nulls(len(pos), pa.float64()))
                parts.append(t)
        if not parts:
            return self._empty(batch)
        return pa.concat_tables(parts)

    def _empty(self, batch: pa.Table) -> pa.Table:
        t = batch.slice(0, 0)
        t = t.append_column("poly_id", pa.array([], pa.int64()))
        for c in self.attr_cols:
            t = t.append_column(c, pa.array([], self.attr_types[c]))
        t = t.append_column("poly_area", pa.array([], pa.float64()))
        t = t.append_column("area", pa.array([], pa.float64()))
        t = t.append_column("area_pct", pa.array([], pa.float64()))
        return t


def overlay_fragments(
    grid_ds,
    polygons: list[dict],
    spec: GridSpec,
    *,
    how: str = "intersection",
    attr_cols: tuple[str, ...] = ("nuts_id", "pop"),
    concurrency=None,
    batch_size: int | None = None,
):
    """Fragment rows of grid × polygon layer (reference O4/O5/O6).

    ``concurrency=None`` -> stateless tasks with a per-worker kernel cache
    (elastic, fuses with neighbors); int/tuple -> dedicated actor pool for
    layers whose index build must be strictly amortized."""
    import ray

    if how not in ("intersection", "union"):
        # fail on the driver, not inside actor creation
        raise ValueError(f"how must be intersection|union, got {how!r}")
    ref = {"__ref__": ray.put(polygons)}
    args = (spec.cellsize, spec.bbox[:2], how, attr_cols)
    if concurrency is not None:
        return grid_ds.map_batches(
            OverlayKernel,
            batch_format="pyarrow",
            batch_size=batch_size,
            fn_constructor_args=(ref, *args),
            concurrency=concurrency,
        )
    from .spatial import _cached_kernel

    key = f"overlay:{ref['__ref__'].hex()}:{args!r}"

    def apply(batch: pa.Table) -> pa.Table:
        kern = _cached_kernel(key, ref, lambda p: OverlayKernel(p, *args))
        return kern(batch)

    return grid_ds.map_batches(apply, batch_format="pyarrow", batch_size=batch_size)


def _final_cell_row(
    g: pd.DataFrame,
    rule: str | None,
    columns: list[str],
    carry: list[str],
    cover: bool,
) -> pd.DataFrame:
    row = {"cell_id": g["cell_id"].iloc[0]}
    for c in carry:
        row[c] = g[c].iloc[0]
    real = g[g["poly_id"].notna()]
    if cover:
        ids = sorted(int(v) for v in real["poly_id"].unique())
        row["cover"] = ",".join(str(v) for v in ids) if ids else None
        row["n_polys"] = len(ids)
    if rule in ("sum", "list"):
        for c in columns:
            wv = real[c] * real["area_pct"]
            if rule == "sum":
                row[c] = float(wv.sum()) if len(real) else 0.0
            else:  # deterministic order by poly_id; 9-decimal repr
                order = real["poly_id"].argsort(kind="stable")
                row[c] = ";".join(f"{v:.9f}" for v in wv.iloc[order]) or None
    elif rule in ("min", "max"):
        if len(real):
            asc = rule == "min"
            r = real.sort_values(
                ["area_pct", "poly_id"], ascending=[asc, True], kind="stable"
            ).iloc[0]
            for c in columns:
                row[c] = r[c]
        else:
            for c in columns:
                row[c] = None
    return pd.DataFrame([row])


def grid_overlay(
    grid_ds,
    polygons: list[dict],
    spec: GridSpec,
    *,
    how: str = "intersection",
    rule: str | None = None,
    columns: list[str] | None = None,
    cover: bool = False,
    carry: list[str] | None = None,
    attr_cols: tuple[str, ...] = ("nuts_id", "pop"),
    concurrency=None,
):
    """Full overlay: fragments, then per-cell cover/attribute assignment
    (reference GridOverlay.__call__, overlay.py:433-552).

    ``rule`` in {sum, min, max, list} assigns each ``columns`` polygon
    attribute to cells: sum -> Σ attr·area_pct (weighted areal
    interpolation); min/max -> attr of the fragment with the lowest/highest
    area_pct (tie-broken by ascending poly_id — the reference's sort-then-
    first, overlay.py:340-360, made deterministic); list -> ';'-joined
    weighted values ordered by poly_id.  ``cover`` adds the sorted
    contributing-polygon id string (reference collect-list, overlay.py:
    312-323).  ``carry`` = grid columns to keep (constant per cell).
    Cells with no fragment rows (intersection) are absent, matching the
    reference inner merge (overlay.py:369-374).
    """
    if rule is not None and rule not in RULES:
        raise ValueError(f"rule must be one of {RULES}")
    columns = list(columns or [])
    carry = list(carry or [])
    frags = overlay_fragments(
        grid_ds,
        polygons,
        spec,
        how=how,
        attr_cols=attr_cols,
        concurrency=concurrency,
    )
    if rule is None and not cover:
        return frags

    keep_cols = ["cell_id", *carry, "poly_id", "area_pct", *columns]

    def project(b: pa.Table) -> pa.Table:
        return b.select([c for c in keep_cols if c in b.column_names])

    frags = frags.map_batches(project, batch_format="pyarrow")

    if rule in (None, "sum"):
        # fast path: vectorized per-batch partials + built-in Sum shuffle —
        # the per-cell map_groups final would cost ~1ms/cell in Python,
        # minutes at 1km national grids
        return _sum_cover_two_phase(frags, columns, carry, cover, rule == "sum")

    if rule in ("min", "max") and not cover and how == "intersection":
        # the join path filters to real fragments, so union's
        # remainder-only cells would vanish — route union argext to the
        # generic path, which keeps them with null attrs
        return _argext_joins(frags, rule, columns, carry)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _final_cell_row(g, rule, columns, carry, cover)

    return frags.groupby("cell_id").map_groups(final, batch_format="pandas")


def _argext_joins(frags, rule, columns, carry):
    """Vectorized argext (the reference's sort-then-first, overlay.py:
    340-360): per-cell best area_pct via a built-in aggregate, hash-join
    back, filter to the best rows, then min poly_id as the deterministic
    tie-break — three shuffles, zero per-cell Python."""
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    # join aggregator actors hold CPU slots: size the partition count to
    # the session or the two joins deadlock small clusters
    nparts = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)

    real = frags.map_batches(
        lambda b: b.filter(pc.is_valid(b["poly_id"])), batch_format="pyarrow"
    )
    agg = Max if rule == "max" else Min
    best = real.groupby("cell_id").aggregate(
        agg("area_pct", alias_name="__best_pct__")
    )
    # best/tie are aggregate outputs and f1 a filter-on-join output —
    # all can carry empty blocks on small inputs (the hash-shuffle
    # schema race, cluster.compact_blocks docstring).  Balanced
    # repartitions keep every block non-empty whenever rows >= width
    # without pinning the (cell-scale, unbounded) sides.
    j1 = real.join(
        best.repartition(nparts), "inner", num_partitions=nparts,
        on=("cell_id",),
    )
    f1 = j1.map_batches(
        lambda b: b.filter(
            pc.equal(b["area_pct"], b["__best_pct__"])
        ).drop_columns(["__best_pct__"]),
        batch_format="pyarrow",
    ).repartition(nparts)
    tie = f1.groupby("cell_id").aggregate(Min("poly_id", alias_name="__best_poly__"))
    j2 = f1.join(
        tie.repartition(nparts), "inner", num_partitions=nparts,
        on=("cell_id",),
    )
    out = j2.map_batches(
        lambda b: b.filter(
            pc.equal(b["poly_id"], b["__best_poly__"])
        ).drop_columns(["__best_poly__"]),
        batch_format="pyarrow",
    )
    keep = ["cell_id", *carry, *columns]
    return out.map_batches(
        lambda b: b.select([c for c in keep if c in b.column_names]),
        batch_format="pyarrow",
    )


def _sum_cover_two_phase(frags, columns, carry, cover, with_sum):
    from ray.data.aggregate import AggregateFn, Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        real = df[df["poly_id"].notna()]
        g = df.groupby("cell_id", sort=False)
        # index over ALL cells in the batch — remainder-only cells (union
        # rows with null poly_id) must survive with zero sums, so the
        # frame's index can never come solely from real-fragment groupbys
        res = pd.DataFrame(index=pd.Index(g.size().index, name="cell_id"))
        for c in carry:
            res[c] = g[c].first()
        if with_sum:
            for c in columns:
                w = (real[c] * real["area_pct"]).groupby(
                    real["cell_id"], sort=False
                ).sum()
                res[f"{c}__w"] = w
        if cover:
            res["__cover__"] = real.groupby("cell_id", sort=False)["poly_id"].agg(
                lambda s: ",".join(str(int(v)) for v in sorted(s.unique()))
            )
        res = res.reset_index()
        # cells with only remainder rows: weighted sums default to 0
        if with_sum:
            for c in columns:
                res[f"{c}__w"] = res[f"{c}__w"].fillna(0.0)
        if cover:
            res["__cover__"] = res["__cover__"].fillna("")
        return pa.Table.from_pandas(res, preserve_index=False)

    partials = frags.map_batches(partial, batch_format="pyarrow")
    aggs = []
    for c in carry:
        aggs.append(Max(c, alias_name=c))
    if with_sum:
        for c in columns:
            aggs.append(Sum(f"{c}__w", alias_name=c))
    if cover:
        # merge comma-strings of sorted unique poly ids across partials
        aggs.append(
            AggregateFn(
                init=lambda k: "",
                accumulate_row=lambda acc, row: (
                    acc + "," + row["__cover__"] if acc else row["__cover__"]
                ),
                merge=lambda a, b: (a + "," + b) if a and b else (a or b),
                name="__cover_acc__",
            )
        )
    out = partials.groupby("cell_id").aggregate(*aggs)
    if not cover:
        return out

    def finish(b: pa.Table) -> pa.Table:
        raw = b["__cover_acc__"].to_pylist()
        covs, ns = [], []
        for s in raw:
            ids = sorted({int(v) for v in (s or "").split(",") if v != ""})
            covs.append(",".join(str(v) for v in ids) if ids else None)
            ns.append(len(ids))
        b = b.drop_columns(["__cover_acc__"])
        b = b.append_column("cover", pa.array(covs, pa.string()))
        return b.append_column("n_polys", pa.array(np.asarray(ns, dtype=np.int64)))

    return out.map_batches(finish, batch_format="pyarrow")


def area_interpolate(
    polygons: list[dict],
    grid_ds,
    spec: GridSpec,
    variables: list[str],
    *,
    cover: bool = True,
    concurrency=None,
):
    """Weighted areal interpolation of extensive polygon variables onto the
    grid — the reference's tobler-equivalent wrapper (overlay.py:559-605):
    how='intersection', rule='sum', area=cover=True.  The reference's
    retry-with-memory_split is obsolete under Ray streaming + spill."""
    return grid_overlay(
        grid_ds,
        polygons,
        spec,
        how="intersection",
        rule="sum",
        columns=variables,
        cover=cover,
        concurrency=concurrency,
    )


def crop_grid_bbox(grid_ds, bbox, x_col: str = "x", y_col: str = "y"):
    """Partition pruning by coordinate predicate — O3 strategy (c)
    (reference crop_polygon, overlay.py:206-208): keep cells with
    xmin <= x <= xmax and ymin <= y <= ymax, vectorized per batch."""
    import pyarrow.compute as pc

    xmin, ymin, xmax, ymax = bbox

    def f(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b[x_col], pa.scalar(float(xmin))),
                pc.less_equal(b[x_col], pa.scalar(float(xmax))),
            ),
            pc.and_(
                pc.greater_equal(b[y_col], pa.scalar(float(ymin))),
                pc.less_equal(b[y_col], pa.scalar(float(ymax))),
            ),
        )
        return b.filter(keep)

    return grid_ds.map_batches(f, batch_format="pyarrow")


def crop_grid_tiles(grid_ds, tile_ids, tile_col: str = "tile_id"):
    """Partition pruning by stored tile id — O3 strategy (a) (reference
    overlay.py:196-199): the tile id is a COLUMN, so pruning is a
    vectorized membership filter, not a scheduling concern."""
    import pyarrow.compute as pc

    ids = pa.array(sorted(int(t) for t in tile_ids), pa.int64())

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[tile_col], value_set=ids))

    return grid_ds.map_batches(f, batch_format="pyarrow")


def cells_to_polygon_layer(
    df: pd.DataFrame, spec: GridSpec, value_col: str = "val"
) -> list[dict]:
    """Turn a (small) cell grid into a polygon layer — the second layer of
    the reference's grid-on-grid identity / scale-reduction tests
    (overlay.ipynb cells 26-30)."""
    from .geom.kernels import as_ring

    w, h = spec.cellsize
    out = []
    for r in df.itertuples():
        x0 = spec.bbox[0] + r.ix * w
        y0 = spec.bbox[1] + r.iy * h
        out.append(
            {
                "poly_id": int(r.cell_id),
                "nuts_id": str(int(r.cell_id)),
                "rings": [
                    as_ring([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
                ],
                "bbox": (x0, y0, x0 + w, y0 + h),
                "pop": float(getattr(r, value_col)),
                "area": w * h,
            }
        )
    return out


# ---------------------------------------------------------------------------
# DuckDB twins (oracle side, over the rect-decomposed fixture layer)
# ---------------------------------------------------------------------------


def _sql_frag_ctes(
    spec: GridSpec, poly_rects_cte: str | None = None, round_to: int = 6
) -> str:
    from .synth import sql_polygon_area_cte, sql_polygon_rects_cte

    w, h = spec.cellsize
    x0, y0 = spec.bbox[0], spec.bbox[1]
    r = 10.0**round_to
    return f"""
WITH poly_rects AS ({poly_rects_cte or sql_polygon_rects_cte()}),
poly_area AS ({sql_polygon_area_cte()}),
cells AS (
  SELECT iy.i * {spec.ncols} + ix.i AS cell_id, ix.i AS ix, iy.i AS iy,
         {x0!r} + ix.i * {w!r} AS cx0, {y0!r} + iy.i * {h!r} AS cy0
  FROM (SELECT UNNEST(generate_series(0, {spec.ncols - 1})) AS i) ix,
       (SELECT UNNEST(generate_series(0, {spec.nrows - 1})) AS i) iy
),
frag AS (
  SELECT c.cell_id, c.ix, c.iy, r.poly_id,
         SUM(GREATEST(0, LEAST(c.cx0 + {w!r}, r.rxmax) - GREATEST(c.cx0, r.rxmin))
           * GREATEST(0, LEAST(c.cy0 + {h!r}, r.rymax) - GREATEST(c.cy0, r.rymin))) AS area
  FROM cells c
  JOIN poly_rects r
    ON c.cx0 < r.rxmax AND c.cx0 + {w!r} > r.rxmin
   AND c.cy0 < r.rymax AND c.cy0 + {h!r} > r.rymin
  GROUP BY c.cell_id, c.ix, c.iy, r.poly_id
  HAVING SUM(GREATEST(0, LEAST(c.cx0 + {w!r}, r.rxmax) - GREATEST(c.cx0, r.rxmin))
           * GREATEST(0, LEAST(c.cy0 + {h!r}, r.rymax) - GREATEST(c.cy0, r.rymin))) > 0
),
frag2 AS (
  SELECT f.cell_id, f.ix, f.iy, f.poly_id, p.nuts_id, p.pop,
         ROUND(f.area * {r!r}) / {r!r} AS area,
         ROUND(f.area / p.poly_area * {r!r}) / {r!r} AS area_pct
  FROM frag f JOIN poly_area p USING (poly_id)
)"""


def sql_overlay_fragments(
    spec: GridSpec,
    *,
    how: str = "intersection",
    poly_rects_cte: str | None = None,
    round_to: int = 6,
) -> str:
    """Fragments of the FULL-bbox grid vs the fixture polygon layer.
    area/area_pct rounded to ``round_to`` decimals (both sides) to absorb
    summation-order ulp differences."""
    w, h = spec.cellsize
    cell_area = w * h
    r = 10.0**round_to
    frag = _sql_frag_ctes(spec, poly_rects_cte, round_to)
    if how == "intersection":
        return frag + "\nSELECT * FROM frag2"
    return (
        frag
        + f""",
rem AS (
  SELECT c.cell_id, c.ix, c.iy, NULL::BIGINT AS poly_id, NULL::VARCHAR AS nuts_id,
         NULL::DOUBLE AS pop,
         ROUND(({cell_area!r} - COALESCE(SUM(f.area), 0)) * {r!r}) / {r!r} AS area,
         NULL::DOUBLE AS area_pct
  FROM cells c LEFT JOIN frag f USING (cell_id)
  GROUP BY c.cell_id, c.ix, c.iy
  HAVING {cell_area!r} - COALESCE(SUM(f.area), 0) > {cell_area!r} * {TOL_EPS!r}
)
SELECT * FROM frag2 UNION ALL SELECT * FROM rem"""
    )


def sql_grid_overlay_sum(
    spec: GridSpec,
    variables: list[str] = ("pop",),
    *,
    cover: bool = True,
    round_to: int = 6,
) -> str:
    """Per-cell weighted-sum assignment + cover over the full-bbox grid
    (oracle twin of :func:`area_interpolate`)."""
    base = _sql_frag_ctes(spec, round_to=12)
    r = 10.0**round_to
    aggs = [
        f"ROUND(SUM({v} * area_pct) * {r!r}) / {r!r} AS {v}" for v in variables
    ]
    cov = (
        "STRING_AGG(poly_id::VARCHAR, ',' ORDER BY poly_id) AS cover, "
        "COUNT(DISTINCT poly_id)::BIGINT AS n_polys, "
        if cover
        else ""
    )
    return (
        base
        + f"\nSELECT cell_id, {cov}{', '.join(aggs)} FROM frag2 GROUP BY cell_id"
    )


def disaggregate(
    polygons: list[dict],
    grid_ds,
    spec: GridSpec,
    variables: list[str],
    *,
    concurrency=None,
):
    """Dasymetric disaggregation — the INVERSE of :func:`area_interpolate`:
    each polygon's extensive totals are spread down onto the grid cells
    proportionally to intersection area,
    ``cell_v = sum_p v_p * area(cell ∩ p) / area(p)``, so per-polygon
    mass is conserved exactly for polygons fully inside the grid (the
    Eurostat gridded-statistics production direction: region totals ->
    1 km grid).  Plan: the overlay fragment kernel (broadcast layer,
    bbox-pruned, vectorized coverage) -> one vectorized weight batch ->
    per-cell Sum groupby (two-phase; shuffle carries cells, not
    fragments x variables)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    frags = overlay_fragments(
        grid_ds, polygons, spec, how="intersection", concurrency=concurrency
    )
    max_pid = max(p["poly_id"] for p in polygons)
    parea = np.zeros(max_pid + 1, dtype=np.float64)
    for p in polygons:
        parea[p["poly_id"]] = float(p["area"])

    def weigh(b: pa.Table) -> pa.Table:
        pid = np.asarray(b["poly_id"], dtype=np.int64)
        w = np.asarray(b["area"], dtype=np.float64) / parea[pid]
        out = {c: b[c] for c in ("cell_id", "ix", "iy")}
        for v in variables:
            out[v] = pa.array(np.asarray(b[v], dtype=np.float64) * w)
        return pa.table(out)

    weighted = frags.map_batches(weigh, batch_format="pyarrow")
    return weighted.groupby(["cell_id", "ix", "iy"]).aggregate(
        *(Sum(v, alias_name=v) for v in variables)
    )


def sql_disaggregate(spec: GridSpec, variables: list[str]) -> str:
    """DuckDB twin of :func:`disaggregate` over the fixture layer: the
    fragment CTE (same 6-dp area law) joined to the rect-decomposed
    per-polygon total area, weighted-summed per cell."""
    from .synth import sql_polygon_area_cte, sql_polygon_rects_cte

    sel = ", ".join(
        f"ROUND(SUM(f.{v} * f.area / pa.poly_area) * 1e6) / 1e6 AS {v}"
        for v in variables
    )
    return f"""
WITH frag AS ({sql_overlay_fragments(spec, how="intersection")}),
poly_rects AS ({sql_polygon_rects_cte()}),
parea AS ({sql_polygon_area_cte()})
SELECT f.cell_id, f.ix, f.iy, {sel}
FROM frag f JOIN parea pa USING (poly_id)
GROUP BY f.cell_id, f.ix, f.iy
"""


def poly_metrics(ds, *, rings_col: str = "rings"):
    """Per-polygon shape metrics: net shoelace area (holes CW subtract),
    total boundary length (holes add), shoelace-moment centroid (cx, cy)
    and Polsby-Popper compactness ``4*pi*A / P^2`` (the classic public
    gerrymandering score, rounded 6dp) — the geopandas ``.area`` /
    ``.length`` / ``.centroid`` parity point as a stateless Arrow stage.

    Vectorized across the whole batch: rings flatten to one vertex
    stream, the wraparound next-vertex index is patched at ring ends, and
    ``np.add.reduceat`` folds cross products / edge lengths per ring —
    no per-polygon Python.
    """

    def metrics(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["poly_id"], np.int64)
        rings_rows = b[rings_col].to_pylist()
        xs, ys, ring_starts, ring_poly = [], [], [], []
        pos = 0
        for pi, rings in enumerate(rings_rows):
            for ring in rings:
                pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                xs.append(pts[:, 0])
                ys.append(pts[:, 1])
                ring_starts.append(pos)
                ring_poly.append(pi)
                pos += len(pts)
        if not xs:
            return pa.table(
                {
                    "poly_id": pa.array([], pa.int64()),
                    "area": pa.array([], pa.float64()),
                    "perimeter": pa.array([], pa.float64()),
                    "compactness": pa.array([], pa.float64()),
                }
            )
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        starts = np.asarray(ring_starts, np.int64)
        ends = np.append(starts[1:], len(x)) - 1
        nxt = np.arange(1, len(x) + 1)
        nxt[ends] = starts
        cross = x * y[nxt] - x[nxt] * y
        elen = np.sqrt(
            (x[nxt] - x) * (x[nxt] - x) + (y[nxt] - y) * (y[nxt] - y)
        )
        ring_area = 0.5 * np.add.reduceat(cross, starts)
        ring_perim = np.add.reduceat(elen, starts)
        ring_mx = np.add.reduceat((x + x[nxt]) * cross, starts)
        ring_my = np.add.reduceat((y + y[nxt]) * cross, starts)
        rp = np.asarray(ring_poly, np.int64)
        area = np.bincount(rp, weights=ring_area, minlength=len(ids))
        perim = np.bincount(rp, weights=ring_perim, minlength=len(ids))
        cx = (np.bincount(rp, weights=ring_mx, minlength=len(ids)) / 6.0) / area
        cy = (np.bincount(rp, weights=ring_my, minlength=len(ids)) / 6.0) / area
        comp = (4.0 * np.pi * area) / (perim * perim)
        rnd = lambda v: np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "poly_id": pa.array(ids),
                "area": pa.array(area),
                "perimeter": pa.array(perim),
                "cx": pa.array(rnd(cx)),
                "cy": pa.array(rnd(cy)),
                "compactness": pa.array(rnd(comp)),
            }
        )

    return ds.map_batches(metrics, batch_format="pyarrow")


def sql_poly_metrics(rings_by_poly: dict) -> str:
    """Oracle twin: the fixture ring vertices (and their wraparound
    successors, precomputed — same constants) embedded as VALUES; the
    integer-coordinate fixture keeps every shoelace / length term exact,
    so summation order cannot diverge."""
    rows = []
    for pid, rings in sorted(rings_by_poly.items()):
        for ring in rings:
            pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
            for i in range(len(pts)):
                nx, ny = pts[(i + 1) % len(pts)]
                # ::DOUBLE — bare decimal literals parse as DECIMAL and
                # overflow in the moment products
                rows.append(
                    f"({pid}, {pts[i, 0]!r}::DOUBLE, {pts[i, 1]!r}::DOUBLE,"
                    f" {nx!r}::DOUBLE, {ny!r}::DOUBLE)"
                )
    vals = ", ".join(rows)
    return (
        f"WITH v(poly_id, x, y, nx, ny) AS (VALUES {vals}), "
        f"m AS (SELECT poly_id, SUM(x * ny - nx * y) * 0.5 AS area,"
        f" SUM(sqrt((nx - x) * (nx - x) + (ny - y) * (ny - y)))"
        f" AS perimeter,"
        f" SUM((x + nx) * (x * ny - nx * y)) AS mx,"
        f" SUM((y + ny) * (x * ny - nx * y)) AS my"
        f" FROM v GROUP BY poly_id) "
        f"SELECT poly_id, area, perimeter,"
        f" ROUND(((mx / 6.0) / area) * 1e6) / 1e6 AS cx,"
        f" ROUND(((my / 6.0) / area) * 1e6) / 1e6 AS cy,"
        f" ROUND(((4.0 * pi() * area) / (perimeter * perimeter)) * 1e6)"
        f" / 1e6 AS compactness FROM m"
    )


def poly_overlay(
    subjects_ds,
    clips: list[dict],
    *,
    id_col: str = "poly_id",
    rings_col: str = "rings",
    round_to: int = 6,
    heal_tol: float | None = None,
):
    """Layer x layer overlay: intersection AREA of every (subject
    polygon, convex clip polygon) pair — the general ``gpd.overlay``
    surface of the reference (overlay.py:296-297) for convex clip
    layers (decompose a concave clip into convex pieces first; the
    reference's exercised unions are convex tile rects).

    ``heal_tol`` (optional) runs :func:`geom.kernels.heal_rings` on every
    subject ring before clipping — the reference's TopologyException
    retry analog for user-provided layers with duplicate/spike/collinear
    vertices (reference overlay.py:299-309).

    Subjects stream as a Dataset whose ``rings_col`` is
    ``list<list<list<double>>>`` (outer rings CCW, holes CW — signed
    areas subtract, so holes are exact); the small clip layer ships via
    ``ray.put`` once and is bbox-pruned per subject.  CONCAVE clip
    polygons are ear-clipped into convex (triangle) pieces ONCE on the
    driver (:func:`geom.kernels.triangulate_ring` — areas add exactly
    over the tiling), so the per-batch kernel only ever runs convex SH.
    Per-batch cost is polygons x surviving clip pieces — vertex loops
    are numpy, the pair loop is polygon-scale, never vertex-scale
    Python.  Emits (id_col, clip_id, area) rows with area > 0, rounded
    half-away."""
    import ray

    from .geom.kernels import clip_area_convex, rings_bbox, triangulate_ring
    from .spatial import _cached_kernel

    def _is_convex_ccw(r: np.ndarray) -> bool:
        nxt = np.roll(r, -1, axis=0)
        e = nxt - r
        cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] \
            - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
        return bool((cross >= 0).all())

    payload = []
    for c in clips:
        r = np.asarray(c["ring"], dtype=np.float64)
        payload.append(
            {
                "clip_id": int(c["clip_id"]),
                "pieces": [r] if _is_convex_ccw(r) else triangulate_ring(r),
                "bbox": (
                    float(r[:, 0].min()),
                    float(r[:, 1].min()),
                    float(r[:, 0].max()),
                    float(r[:, 1].max()),
                ),
            }
        )
    ref = {"__ref__": ray.put(payload)}
    ckey = f"polyov:{ref['__ref__'].hex()}"
    tol = 10.0**round_to

    def kernel(b: pa.Table) -> pa.Table:
        cl = _cached_kernel(ckey, ref, lambda p: p)
        ids = np.asarray(b[id_col], dtype=np.int64)
        rings_rows = b[rings_col].to_pylist()
        out_id, out_cid, out_area = [], [], []
        for i, raw in enumerate(rings_rows):
            rings = [np.asarray(r, dtype=np.float64) for r in raw]
            if heal_tol is not None:
                from .geom.kernels import heal_rings

                rings = heal_rings(rings, heal_tol)
            if not rings:
                continue
            bb = rings_bbox(rings)
            for c in cl:
                cb = c["bbox"]
                if bb[0] >= cb[2] or bb[2] <= cb[0] \
                        or bb[1] >= cb[3] or bb[3] <= cb[1]:
                    continue
                a = sum(clip_area_convex(rings, p) for p in c["pieces"])
                # round BEFORE the emission test: SH bridge geometry on a
                # disjoint-but-bbox-overlapping pair is exactly 0 in exact
                # arithmetic but +-1e-16 in float — testing the raw sum
                # could emit a spurious 0.0 row the exact-arithmetic SQL
                # twin never produces (both sides gate on the ROUNDED
                # area)
                ar = np.floor(abs(a) * tol + 0.5) / tol
                if a > 0.0 and ar > 0.0:
                    out_id.append(ids[i])
                    out_cid.append(c["clip_id"])
                    out_area.append(ar)
        return pa.table(
            {
                id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
                "clip_id": pa.array(np.asarray(out_cid, dtype=np.int64)),
                "area": pa.array(np.asarray(out_area, dtype=np.float64)),
            }
        )

    return subjects_ds.map_batches(kernel, batch_format="pyarrow")
