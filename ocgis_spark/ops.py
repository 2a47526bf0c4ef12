"""OcgOperations — the reference's primary entry point
(``/root/reference/src/ocgis/ops/core.py:61-185``) as a typed config that
composes the engine's DataFrame operators into one plan and executes it.

Parameter names follow the reference (``ops/parms/definition.py``); the
execution order mirrors ``OperationsEngine._process_subsettables_``
(``ops/engine.py:158-385``): nonspatial subsets → snippet/slice → spatial
subset (per geometry) → select_nearest → aggregation/calcs → converter.
Cross-parameter validation replicates ``_validate_`` (``core.py:324-416``).
Unlike the reference's eager per-geometry generator, everything here is ONE
lazy Catalyst plan per selection geometry, unioned with a ``ugid`` column
(the SpatialCollection analogue, SURVEY.md §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import conv
from .geo import wkb as WKB
from .geo.cellindex import GridSpec
from .operators import aggregate as agg_ops
from .operators import calc_registry, calcmath, knn as knn_ops, spatial, temporal
from .request import Field, RequestDataset


class DefinitionValidationError(ValueError):
    """Cross-parameter validation failure (ops/core.py:324-416)."""


#: known linear unit conversions for ``conform_units_to`` strings — the
#: cf_units subset the reference's test workloads actually exercise
#: (units.py / definition.py ``ConformUnitsTo``); arbitrary pairs go
#: through an explicit (factor, offset) tuple
UNIT_CONVERSIONS: dict[str, tuple[float, float]] = {
    "K->C": (1.0, -273.15),
    "C->K": (1.0, 273.15),
    "C->F": (1.8, 32.0),
    "F->C": (1.0 / 1.8, -32.0 / 1.8),
    "m->km": (0.001, 0.0),
    "km->m": (1000.0, 0.0),
    "kg m-2 s-1->mm day-1": (86400.0, 0.0),
    "mm day-1->kg m-2 s-1": (1.0 / 86400.0, 0.0),
}


def _close_ring(r: np.ndarray) -> np.ndarray:
    """Normalize user-supplied rings to CLOSED form at the facade ingress:
    the interior-test kernels (geometry.points_in_ring and its batch
    forms) require closure, while the clip kernels accept open rings —
    an open selection ring silently misclassified every interior
    cell/element (r4 review finding)."""
    r = np.asarray(r, dtype="f8")
    if len(r) >= 3 and not (r[0] == r[-1]).all():
        r = np.vstack([r, r[:1]])
    return r


@dataclass
class OcgOperations:
    dataset: Any  # RequestDataset | Field | DataFrame
    geom: Any = None  # rings ndarray(s) | WKB bytes | (minx,miny,maxx,maxy)
    spatial_operation: str = "intersects"  # 'intersects' | 'clip'
    abstraction: str = "point"  # 'point' | 'polygon'
    aggregate: bool = False
    #: union ALL selection geometries into one selection before subsetting
    #: (``ops/parms/definition.py:74``); ``geom`` is then a LIST of
    #: geometries. Relationally: one multi-geometry subset plan, ugid
    #: dropped, rows deduped — a row in several selections appears once.
    agg_selection: bool = False
    select_nearest: bool = False
    calc: list[dict] | None = None  # [{'func': 'mean', 'name': 'mean', ...}]
    calc_grouping: list | None = None  # ['month'] | ['year','month'] | 'day'
    calc_sample_size: bool = False
    time_range: tuple[str, str] | None = None
    time_region: dict | None = None  # {'month': [...], 'year': [...], 'day': [...]}
    level_range: tuple[float, float] | None = None
    snippet: bool = False
    allow_empty: bool = True
    optimized_bbox_subset: bool = False
    keep_touches: bool | None = None
    search_radius_mult: float = 2.0
    output_format: str = "ocgis"
    prefix: str = "ocgis_spark_output"
    dir_output: str = "."
    grid: GridSpec | None = None
    melted: bool = False
    #: linear units conversion of the value column before calcs —
    #: (factor, offset) tuple or a known pair string like 'K->C'
    #: (``conform_units_to``, definition.py / units.py analogue)
    conform_units_to: Any = None
    #: arbitrary Python predicate over a pandas Series of datetimes
    #: (reference ``time_subset_func``, temporal.py:345-378)
    time_subset_func: Any = None
    #: 'wrap' | 'unwrap' the DATA longitudes before subsetting
    #: (reference ``spatial_wrapping``)
    spatial_wrapping: str | None = None
    #: wrap OUTPUT longitudes back to -180..180 (reference ``vector_wrap``)
    vector_wrap: bool = False
    #: transform output coordinates to this CRS (adds x/y columns via
    #: transform_crs — reference ``output_crs``, crs.py:458+)
    output_crs: str | None = None
    #: label-based positional slice per axis, e.g. {'time': 0}
    #: (reference ``slice``; renamed: ``slice`` is a builtin)
    slice_: dict | None = None
    #: filter a GeomCabinet selection (geom=str uri) to these UGIDs
    #: (reference ``geom_select_uid``/``select_ugid``)
    geom_select_uid: list | None = None
    #: SQL where clause applied to the GeomCabinet attribute table
    #: (reference ``geom_select_sql_where``)
    geom_select_sql_where: str | None = None
    #: aggregate=True + calc: run calcs over RAW pooled values instead of
    #: the spatially aggregated series (reference ``calc_raw``)
    calc_raw: bool = False
    #: conservative regrid of the value column to this destination
    #: VectorGridSpec after subsetting (reference ``regrid_destination``)
    regrid_destination: Any = None
    #: reference ``regrid_options``: {'regrid_method': 'conservative'
    #: (default) | 'bilinear' | 'nearest_stod'} (regrid/base.py:646-700)
    regrid_options: dict | None = None
    #: reference ``geom_uid`` (definition.py:837-850): attribute name used
    #: as the selection UID in the geom table / shapefile dbf (default:
    #: the cabinet's 'ugid' column / shapefile FID)
    geom_uid: str | None = None
    #: reference ``spatial_reorder`` (definition.py:1224,
    #: engine.py:555-568): present output rows in ascending-longitude
    #: order when the data is WRAPPED; a no-op for unwrapped data (the
    #: reference warns and does nothing)
    spatial_reorder: bool = False
    #: reference ``interpolate_spatial_bounds`` (definition.py:853-858,
    #: engine.py:248-252): when no grid is available, extrapolate cell
    #: bounds from the frame's coordinate centroids
    #: (``VectorGridSpec.from_centroids`` — the set_extrapolated_bounds
    #: path); ignored when a grid is already present (the reference's
    #: BoundsAlreadyAvailableError branch)
    interpolate_spatial_bounds: bool = False
    #: reference ``callback`` (core.py:93): progress fn f(percent, message)
    callback: Any = None
    #: reference ``file_only`` (definition.py:590-597): write the output
    #: file's structure/metadata with NO data rows (schema-only sink)
    file_only: bool = False
    #: reference ``add_auxiliary_files`` (conv/base.py:100-114,208): when
    #: False, write only the target output file — skip the conv_meta
    #: lineage companion
    add_auxiliary_files: bool = True
    #: reference ``output_format_options`` (definition.py): converter-
    #: specific options dict (csv: {'sep'}, parquet: {'compression'})
    output_format_options: dict | None = None
    #: reference ``backend`` (definition.py Backend, valid=('ocg',))
    backend: str = "ocg"
    #: reference ``format_time`` (definition.py:600-605): True attaches
    #: the decoded calendar parts (cf_year/cf_month/cf_day — the
    #: value_datetime analogue) for CF-numeric requests; False leaves the
    #: raw numeric time untouched
    format_time: bool = True
    #: reference ``optimizations`` (definition.py:901-922): shares
    #: precomputed in-memory TemporalGroupDimension/Field objects between
    #: runs — n/a here (grouping keys are inline codegen CASE columns,
    #: nothing to precompute or share); rejected loudly below
    optimizations: dict | None = None

    def __post_init__(self):
        self._validate()

    # ---- validation (core.py:324-416 analogue) ----
    def _validate(self):
        if self.spatial_operation not in ("intersects", "clip"):
            raise DefinitionValidationError(
                f"spatial_operation {self.spatial_operation!r} invalid"
            )
        if self.spatial_operation == "clip" and self.abstraction == "point":
            raise DefinitionValidationError(
                "clip requires polygon abstraction (cell geometries)"
            )
        if self.output_format not in conv.get_converter_map():
            raise DefinitionValidationError(
                f"output_format {self.output_format!r} not in "
                f"{sorted(conv.get_converter_map())}"
            )
        if self.calc:
            for c in self.calc:
                if "func" not in c:
                    raise DefinitionValidationError("calc entries need 'func'")
                func = str(c["func"])
                if not func.startswith("eval=") and func not in calc_registry.SCALAR_CALCS:
                    try:
                        calc_registry.get(c["func"])
                    except KeyError as e:
                        raise DefinitionValidationError(str(e)) from None
        if self.calc_grouping and not self.calc:
            raise DefinitionValidationError("calc_grouping requires calc")
        if self.aggregate and self.calc:
            # ADVICE r2: the aggregate+calc branch collapses the frame to
            # (ts, value) before running calcs, so row-level scalar calcs
            # (whose operand columns no longer exist) cannot follow it —
            # reject here instead of KeyError-ing inside execute()
            for c in self.calc:
                f = str(c.get("func"))
                if not f.startswith("eval=") and f in calc_registry.SCALAR_CALCS:
                    raise DefinitionValidationError(
                        f"aggregate=True cannot be combined with row-level "
                        f"scalar calc {f!r} (spatial aggregation collapses "
                        f"its operand columns); run the scalar calc without "
                        f"aggregate, or aggregate its output"
                    )
        if self.select_nearest and self.spatial_operation == "clip":
            raise DefinitionValidationError(
                "select_nearest is incompatible with clip"
            )
        # agg_selection + clip is supported for rectilinear selections via
        # the rectunion dissolve (round 3); non-rectilinear inputs are
        # rejected in execute() once the geometries are coerced to rings.
        if self.spatial_wrapping not in (None, "wrap", "unwrap"):
            raise DefinitionValidationError(
                f"spatial_wrapping {self.spatial_wrapping!r} invalid "
                "(None | 'wrap' | 'unwrap')"
            )
        if self.calc_raw and not (self.aggregate and self.calc):
            raise DefinitionValidationError(
                "calc_raw=True requires aggregate=True and calc"
            )
        if self.regrid_options is not None:
            method = self.regrid_options.get("regrid_method", "conservative")
            if method not in ("conservative", "bilinear", "nearest_stod",
                              "idw"):
                # reference users also pass 'patch' (ESMF patch recovery,
                # regrid/base.py:646-700) — documented n/a in SURVEY (needs
                # ESMF's finite-element machinery); fail loudly at
                # validation, not KeyError mid-plan (VERDICT r3 #7)
                raise DefinitionValidationError(
                    f"regrid_method {method!r} is not supported "
                    "(supported: conservative | bilinear | nearest_stod "
                    "| idw; 'patch' needs ESMF patch recovery — see "
                    "SURVEY §2.3)"
                )
        if self.conform_units_to is not None:
            if not (
                isinstance(self.conform_units_to, (tuple, list))
                and len(self.conform_units_to) == 2
            ) and str(self.conform_units_to) not in UNIT_CONVERSIONS:
                raise DefinitionValidationError(
                    f"conform_units_to must be (factor, offset) or one of "
                    f"{sorted(UNIT_CONVERSIONS)}"
                )
        if self.regrid_destination is not None and self.select_nearest:
            raise DefinitionValidationError(
                "regrid_destination is incompatible with select_nearest"
            )
        if self.backend != "ocg":
            # reference Backend parameter: valid=('ocg',) — same contract
            raise DefinitionValidationError(
                f"backend {self.backend!r} invalid (only 'ocg' exists)"
            )
        if self.optimizations is not None:
            # reference 'tgds'/'fields' keys share precomputed IN-MEMORY
            # TemporalGroupDimension/Field objects between runs
            # (definition.py:901-922); the relational engine computes
            # grouping keys as inline codegen CASE columns — there is no
            # object to precompute or share. Reject loudly rather than
            # silently ignore a reference-meaningful input.
            raise DefinitionValidationError(
                "optimizations ('tgds'/'fields') precompute in-memory "
                "temporal-group/field objects — n/a in the relational "
                "engine (grouping keys are computed inline by Catalyst); "
                "remove the parameter"
            )
        if self.callback is not None and not callable(self.callback):
            raise DefinitionValidationError("callback must be callable")
        if self.file_only and self.output_format in (
            "ocgis", "shapefile", "csv-shp"
        ):
            # 'ocgis' creates no file; the shapefile writers need >= 1
            # record (geo/shp.py) — reject up front instead of crashing
            # on an empty collect
            raise DefinitionValidationError(
                "file_only requires a rowless-capable file output_format "
                "(csv | parquet | wkb-parquet | geojson | meta-json)"
            )
        if self.output_format_options:
            allowed = {"csv": {"sep"}, "csv-shp": {"sep"},
                       "parquet": {"compression"},
                       "wkb-parquet": {"compression"}}
            ok = allowed.get(self.output_format, set())
            bad_keys = set(self.output_format_options) - ok
            if bad_keys:
                raise DefinitionValidationError(
                    f"output_format_options {sorted(bad_keys)} not "
                    f"supported for {self.output_format!r} "
                    f"(allowed: {sorted(ok) or 'none'})"
                )
        if self.geom_uid is not None and not isinstance(self.geom, str):
            raise DefinitionValidationError(
                "geom_uid names an attribute in a cabinet selection source "
                "— it requires geom=<table uri or shapefile path>"
            )

    # ---- geometry coercion ----
    def _rings(self) -> list[np.ndarray] | None:
        g = self.geom
        if g is None:
            return None
        if isinstance(g, dict):
            # GeoJSON geometry dicts (the modern counterpart of the
            # reference's shapely-object geom inputs, ops/parms.py Geom):
            # convert to WKB and fall through to the WKB branch
            t = g.get("type")
            co = g.get("coordinates")
            if t == "Polygon":
                g = WKB.polygon_to_wkb(
                    [np.asarray(r, dtype="f8") for r in co]
                )
            elif t == "Point":
                g = WKB.point_to_wkb(float(co[0]), float(co[1]))
            elif t == "MultiPolygon":
                raise DefinitionValidationError(
                    "GeoJSON MultiPolygon: pass one entry per part — "
                    "geom=[{'type': 'Polygon', 'coordinates': part}, ...] "
                    "(the multi-geometry SpatialCollection path)"
                )
            else:
                raise DefinitionValidationError(
                    f"unsupported GeoJSON geometry type {t!r} "
                    "(Polygon | Point; MultiPolygon via a geom list)"
                )
        if isinstance(g, (bytes, bytearray)):
            kind, data = WKB.parse_wkb(bytes(g))
            if kind == "polygon":
                return data
            if kind == "point":
                # point selection: buffer by search_radius_mult x resolution
                # (ops/engine.py:515-531). The reference buffers with
                # cap_style=3 (SQUARE caps) — so the square buffer here is
                # semantics-exact, not an approximation.
                grid = self._grid()
                res = getattr(grid, "res", None)
                if res is None:  # VectorGridSpec: conservative max cell size
                    res = float(
                        max(np.diff(grid.xb()).max(), np.diff(grid.yb()).max())
                    )
                r = self.search_radius_mult * res
                x, y = data
                from .fixtures import rect_ring

                return [rect_ring(x - r, y - r, x + r, y + r)]
            raise DefinitionValidationError(f"unsupported WKB kind {kind}")
        if isinstance(g, tuple) and len(g) == 4:
            from .fixtures import rect_ring

            return [rect_ring(*g)]
        if isinstance(g, np.ndarray):
            return [_close_ring(g)]
        if isinstance(g, list):
            return [_close_ring(np.asarray(r, dtype="f8")) for r in g]
        raise DefinitionValidationError(f"cannot interpret geom {type(g)}")

    def _grid(self) -> GridSpec:
        if self.grid is not None:
            return self.grid
        if isinstance(self.dataset, Field) and self.dataset.grid is not None:
            return self.dataset.grid
        if isinstance(self.dataset, RequestDataset) and self.dataset.grid is not None:
            return self.dataset.grid
        raise DefinitionValidationError(
            "a GridSpec is required (grid=...; or pass "
            "interpolate_spatial_bounds=True with x/y centroid columns)"
        )

    # ---- execution (engine.py:53-385 analogue) ----
    def execute(self, spark: SparkSession):
        if isinstance(self.dataset, RequestDataset):
            fld = self.dataset.get(spark)
        elif isinstance(self.dataset, Field):
            fld = self.dataset
        else:
            from .request import DEFAULT_DIMENSION_MAP

            fld = Field(self.dataset, dict(DEFAULT_DIMENSION_MAP), self.grid)
        df = fld.df
        dm = fld.dimension_map
        ts = dm.get("time", "ts")
        value = dm.get("value", "value")
        self._progress(5, "dataset loaded")

        # interpolate_spatial_bounds (engine.py:248-252 /
        # set_extrapolated_bounds): no grid anywhere -> extrapolate cell
        # edges from the coordinate CENTROIDS (the distinct x/y vectors —
        # coordinate-axis-sized, a bounded driver collect like ncmodel's
        # axis read) via midpoint/mirror edge extrapolation. Resolved here
        # so every dataset kind (RequestDataset included) gets it; when a
        # grid is already present this is the reference's
        # BoundsAlreadyAvailableError ignore branch.
        if (self.interpolate_spatial_bounds and self.grid is None
                and fld.grid is None):
            xc, yc = dm.get("x", "lon"), dm.get("y", "lat")
            if {xc, yc} <= set(df.columns):
                from .geo.cellindex import VectorGridSpec

                xs = sorted(r[xc] for r in df.select(xc).distinct().collect())
                ys = sorted(r[yc] for r in df.select(yc).distinct().collect())
                if len(xs) >= 2 and len(ys) >= 2:
                    self.grid = VectorGridSpec.from_centroids(xs, ys)

        # format_time (definition.py:600-605): CF-numeric requests attach
        # the decoded calendar parts (the value_datetime analogue);
        # format_time=False leaves the raw numeric axis untouched
        if (self.format_time and isinstance(self.dataset, RequestDataset)
                and self.dataset.time_units is not None
                and ts in df.columns):
            from .operators import cfcalendar as CF

            df = CF.decode_time(
                df, ts, self.dataset.time_calendar, self.dataset.time_units
            )

        # data-coordinate wrapping (engine.py spatial_wrapping prep)
        if self.spatial_wrapping is not None:
            from .operators import crs as crs_ops

            lon_col = dm.get("x", "lon")
            fn = (crs_ops.wrap_lon if self.spatial_wrapping == "wrap"
                  else crs_ops.unwrap_lon)
            df = df.withColumn(lon_col, fn(F.col(lon_col)))

        # units conform BEFORE any calc (engine.py:158-190 prep order)
        if self.conform_units_to is not None:
            from .operators import crs as crs_ops

            cu = self.conform_units_to
            factor, offset = (
                cu if isinstance(cu, (tuple, list))
                else UNIT_CONVERSIONS[str(cu)]
            )
            df = crs_ops.conform_units(df, value, float(factor), float(offset))

        # nonspatial subsets (engine.py:387-406)
        if self.time_range is not None:
            if "ts_lb" not in df.columns:
                df = temporal.with_time_bounds(df, ts)
            df = temporal.time_range(df, *self.time_range)
        if self.time_region is not None:
            df = temporal.time_region(
                df,
                months=self.time_region.get("month"),
                years=self.time_region.get("year"),
                days=self.time_region.get("day"),
                ts=ts,
            )
        if self.level_range is not None and "level" in df.columns:
            lo, hi = self.level_range
            df = df.filter(F.col("level").between(lo, hi))
        if self.time_subset_func is not None:
            df = temporal.time_subset_func(df, self.time_subset_func, ts=ts)
        if self.snippet and ts in df.columns:
            fld2 = Field(df, dm, fld.grid)
            df = fld2.get_field_slice({"time": 0}).df
        if self.slice_:
            df = Field(df, dm, fld.grid).get_field_slice(self.slice_).df

        self._progress(25, "nonspatial subsets applied")
        # GeomCabinet selection (geom = table uri string): resolve to the
        # [(ugid, rings), ...] list with UID / SQL-where pushdown
        # (reference geom='state_boundaries' + select_ugid/select_sql_where,
        # util/geom_cabinet.py:215-276)
        cabinet_polys = None
        if isinstance(self.geom, str):
            from .geom_cabinet import GeomCabinet

            cabinet_polys = GeomCabinet(self.geom).iter_geoms(
                spark, select_uid=self.geom_select_uid,
                select_sql_where=self.geom_select_sql_where,
                uid_field=self.geom_uid,
            )
            if not cabinet_polys:
                raise DefinitionValidationError(
                    f"geom {self.geom!r} selected no geometries"
                )

        # multi-geometry selection WITHOUT agg_selection: the reference's
        # SpatialCollection — one subset per selection geometry keyed by
        # ugid (engine.py:287-385); ours is ONE multi-geometry plan
        if not self.agg_selection and (
            cabinet_polys is not None or isinstance(self.geom, list)
        ):
            grid = self._grid()
            if cabinet_polys is not None:
                polys = cabinet_polys
            else:
                polys = [
                    (i + 1, OcgOperations(
                        dataset=self.dataset, geom=g, grid=grid,
                        abstraction=self.abstraction,
                    )._rings())
                    for i, g in enumerate(self.geom)
                ]
            df = spatial.spatial_subset_many(
                spark, df, grid, polys, abstraction=self.abstraction,
                keep_touches=self.keep_touches,
            )
            if not self.allow_empty and len(df.take(1)) == 0:
                raise spatial.ExtentError(
                    "spatial subset returned no rows (allow_empty=False)"
                )
            rings = None
            self_geom_handled = True
        else:
            self_geom_handled = False

        # spatial subset per geometry (engine.py:287-385); agg_selection
        # unions the selection set first — cabinet selections included
        if self_geom_handled:
            pass
        elif self.agg_selection and (
            cabinet_polys is not None or isinstance(self.geom, list)
        ):
            grid = self._grid()
            if cabinet_polys is not None:
                polys = cabinet_polys
            else:
                polys = []
                for i, g in enumerate(self.geom):
                    one = OcgOperations(
                        dataset=self.dataset, geom=g, grid=grid,
                        abstraction=self.abstraction,
                    )._rings()
                    polys.append((i + 1, one))
            if self.spatial_operation == "clip":
                # clip against the UNIONED selection (field.py:422-469):
                # dissolve rectilinear selections with the rectunion
                # edge-cancellation union, then clip against each dissolved
                # polygon; disjoint pieces' per-row areas sum
                from .geo import geometry as G
                from .geo import rectunion

                bad = [u for u, r in polys if not G._rings_is_axis_rect(r)]
                if bad:
                    # non-rectilinear selections: the union still exists
                    # when the selections are pairwise DISJOINT (the
                    # common case — distinct watersheds/states): clip per
                    # geometry and sum per-cell areas. Only genuinely
                    # OVERLAPPING non-rectilinear selections lack a
                    # dissolve here (reference get_unioned,
                    # geom.py:870-1075 — needs GEOS; FIDELITY.md)
                    over = [
                        (polys[i][0], polys[j][0])
                        for i in range(len(polys))
                        for j in range(i + 1, len(polys))
                        if G.rings_overlap(polys[i][1], polys[j][1])
                    ]
                    if over:
                        # overlapping SIMPLE selections (holes allowed)
                        # dissolve via half-plane difference decomposition
                        # into interior-disjoint convex pieces (the
                        # engine-side get_unioned branch, geom.py:870-1075)
                        # — the per-piece clip areas then sum without
                        # double counting the overlap region. Non-convex
                        # hole-free outers ear-clip into triangles; holed
                        # polygons vertical-slab sweep into trapezoids
                        # (both interior-disjoint within one polygon), so
                        # the same convex sweep covers the whole
                        # simple-polygon-with-holes family. A hole covered
                        # by another selection re-enters the union through
                        # that selection's own pieces — even-odd semantics
                        # compose correctly under the sweep.
                        convex_inputs: list[np.ndarray] = []
                        for _, r in polys:
                            convex_inputs.extend(G.polygon_convex_pieces(r))
                        upolys = [
                            [p]
                            for p in G.convex_union_pieces(convex_inputs)
                        ]
                    else:
                        upolys = [r for _, r in polys]
                else:
                    rects = np.array(
                        [[r[0][:, 0].min(), r[0][:, 1].min(),
                          r[0][:, 0].max(), r[0][:, 1].max()] for _, r in polys]
                    )
                    upolys = rectunion.union_boxes(
                        *rectunion.disjointify_boxes(
                            rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
                        )
                    )
                # ONE pass over the corpus regardless of piece count:
                # union-of-coverings semijoin + a single Arrow refine
                # whose closure carries every dissolved piece (per-row
                # area = sum of per-piece clip areas; exact — pieces are
                # interior-disjoint)
                kt = self.keep_touches if self.keep_touches is not None \
                    else False  # polygon abstraction default (grid.py:627-631)
                df = spatial.clip_disjoint_pieces(
                    spark, df, grid, upolys, keep_touches=kt,
                )
            else:
                sub = spatial.spatial_subset_many(
                    spark, df, grid, polys, abstraction=self.abstraction,
                    keep_touches=self.keep_touches,
                )
                df = sub.drop("ugid").distinct()
            rings = None
        else:
            rings = self._rings()
        grid = self._grid() if (rings is not None or self.select_nearest) else None
        if rings is not None:
            from .geo.cellindex import VectorGridSpec

            if isinstance(grid, VectorGridSpec):
                # non-uniform grid: searchsorted cell encode (if absent)
                # then the vector-grid two-phase subset
                from .operators import vectorgrid as vg_ops

                if "vcx" not in df.columns:
                    dm_x = dm.get("x", "lon")
                    dm_y = dm.get("y", "lat")
                    df = vg_ops.encode_cells(df, grid, lon=dm_x, lat=dm_y)
                out = vg_ops.spatial_subset(
                    spark, df, grid, rings,
                    operation=self.spatial_operation,
                    abstraction=self.abstraction,
                    keep_touches=self.keep_touches,
                    lon=dm.get("x", "lon"), lat=dm.get("y", "lat"),
                )
                if not self.allow_empty and len(out.take(1)) == 0:
                    raise spatial.ExtentError(
                        "spatial subset returned no rows (allow_empty=False)"
                    )
                df = out
            else:
                df = spatial.spatial_subset(
                    spark, df, grid, rings,
                    operation=self.spatial_operation,
                    abstraction=self.abstraction,
                    keep_touches=self.keep_touches,
                    optimized_bbox=self.optimized_bbox_subset,
                    allow_empty=self.allow_empty,
                )

        if self.select_nearest:
            from .geo.cellindex import VectorGridSpec

            if not isinstance(self.geom, (bytes, bytearray)):
                raise DefinitionValidationError(
                    "select_nearest needs a point WKB geom"
                )
            kind, (qx, qy) = WKB.parse_wkb(bytes(self.geom))
            if isinstance(grid, VectorGridSpec):
                pts = spark.createDataFrame(
                    [(0, float(qx), float(qy))],
                    "qid int, qlon double, qlat double",
                )
                # single probe: hand the known query cell envelope down so
                # the cell relation is range-filtered pre-distinct
                qcy_a, qcx_a = grid.cell_of(np.array([qx]), np.array([qy]))
                qcx0 = int(min(max(qcx_a[0], 0), grid.nx - 1))
                qcy0 = int(min(max(qcy_a[0], 0), grid.ny - 1))
                nearest = knn_ops.knn_join_vector(
                    pts, df.select("vcx", "vcy"), grid, k=1,
                    qcell_bounds=(qcx0, qcy0, qcx0, qcy0), eager=True,
                ).select("vcy", "vcx")
                df = df.join(F.broadcast(nearest), ["vcy", "vcx"], "leftsemi")
            else:
                nearest = knn_ops.knn_cells(df, grid, qx, qy, k=1).select(
                    "cell_y", "cell_x"
                )
                df = df.join(
                    F.broadcast(nearest), ["cell_y", "cell_x"], "leftsemi"
                )

        # conservative regrid to the destination grid (engine.py:437-470,
        # regrid/base.py:646-839) — non-uniform grids only; the value
        # column is re-expressed on destination cells before calcs
        if self.regrid_destination is not None:
            from .geo.cellindex import VectorGridSpec
            from .operators import regrid as regrid_ops
            from .operators import vectorgrid as vg_ops

            src_grid = self._grid()
            if not (isinstance(src_grid, VectorGridSpec)
                    and isinstance(self.regrid_destination, VectorGridSpec)):
                raise DefinitionValidationError(
                    "regrid_destination needs VectorGridSpec source and "
                    "destination grids (uniform grids: wrap with "
                    "VectorGridSpec.from_edges)"
                )
            if "vcx" not in df.columns:
                df = vg_ops.encode_cells(
                    df, src_grid, lon=dm.get("x", "lon"), lat=dm.get("y", "lat")
                )
            method = (self.regrid_options or {}).get(
                "regrid_method", "conservative"
            )
            if method in ("bilinear", "nearest_stod", "idw"):
                build = {
                    "bilinear": regrid_ops.bilinear_weights_vector,
                    "nearest_stod": regrid_ops.nearest_weights_vector,
                    "idw": regrid_ops.idw_weights_vector,
                }[method]
                w = build(spark, src_grid, self.regrid_destination)
                src_vals = df.withColumn(
                    "src_id",
                    F.col("vcy").cast("bigint") * F.lit(src_grid.nx)
                    + F.col("vcx"),
                )
                df = regrid_ops.apply_weights(
                    src_vals, w, value=value
                ).withColumnRenamed("dst_value", value)
            elif method == "conservative":
                df = regrid_ops.apply_conservative_vector(
                    df, spark, src_grid, self.regrid_destination, value=value
                ).withColumnRenamed("dst_value", value)
            else:
                raise DefinitionValidationError(
                    f"regrid_method {method!r} invalid "
                    "(conservative | bilinear | nearest_stod | idw)"
                )

        # aggregation / calcs (engine.py:573-613; calc/engine.py:48-157)
        if self.aggregate and self.calc:
            # reference semantics (test_simple.test_calc):
            # calc_raw=False — spatially aggregate PER TIME STEP, then run
            # the temporal calc over the aggregated series;
            # calc_raw=True — calcs pool the RAW (unaggregated) values
            # (calc/base.py calc_raw), so the spatial pre-agg is skipped
            weight = "clip_area" if self.spatial_operation == "clip" else None
            if not self.calc_raw:
                gb = df.groupBy(ts)
                if weight and weight in df.columns:
                    df = gb.agg(
                        (F.sum(F.col(value) * F.col(weight)) / F.sum(weight)).alias(value)
                    )
                else:
                    df = gb.agg(F.avg(value).alias(value))
            df, keys = self._with_grouping_keys(df, ts)
            outs = []
            for c in self.calc:
                func = c["func"]
                if str(func).startswith("eval="):
                    df = calcmath.eval_expr(df, func[len("eval="):])
                    continue
                parms = {k: v for k, v in c.items()
                         if k not in ("func", "name")}
                out = calc_registry.get(func)(df, keys, value=value, ts=ts, **parms)
                if "name" in c and func in out.columns:
                    out = out.withColumnRenamed(func, c["name"])
                outs.append(out)
            if outs:
                df = outs[0]
                for o in outs[1:]:
                    df = df.join(o, keys, "outer")
        elif self.aggregate:
            weight = "clip_area" if self.spatial_operation == "clip" else None
            if weight and weight in df.columns:
                df = agg_ops.area_weighted_mean(df, value, weight)
            else:
                df = agg_ops.spatial_mean_unweighted(df, value)
        elif self.calc:
            df, keys = self._with_grouping_keys(df, ts)
            outs = []
            scalar_cols = []
            for c in self.calc:
                func = c["func"]
                if str(func).startswith("eval="):
                    df = calcmath.eval_expr(df, func[len("eval="):])
                    continue
                if func in calc_registry.SCALAR_CALCS:
                    # row-level (multivariate) calc: adds a column in place
                    # (AbstractMultivariateFunction, calc/base.py:771)
                    name = c.get("name", func)
                    kwds = dict(c.get("kwds", {}))
                    df = calc_registry.SCALAR_CALCS[func](df, name, **kwds)
                    scalar_cols.append(name)
                    continue
                parms = {k: v for k, v in c.items() if k not in ("func", "name")}
                out = calc_registry.get(func)(df, keys, value=value, ts=ts, **parms)
                if "name" in c and func in out.columns:
                    out = out.withColumnRenamed(func, c["name"])
                if self.calc_sample_size:
                    n = df.groupBy(*keys).agg(F.count(value).alias("n"))
                    out = out.join(n, keys)
                outs.append(out)
            if outs:
                df = outs[0]
                for o in outs[1:]:
                    df = df.join(o, keys, "outer")
            elif scalar_cols and self.calc_grouping:
                # temporal aggregation of multivariate output
                # (test_simple.test_calc_multivariate: grouped shape)
                df = df.groupBy(*keys).agg(
                    *[F.avg(c).alias(c) for c in scalar_cols]
                )

        # output-side coordinate treatments (engine.py:573-613 epilogue)
        lon_col, lat_col = dm.get("x", "lon"), dm.get("y", "lat")
        if self.vector_wrap and lon_col in df.columns:
            from .operators import crs as crs_ops

            df = df.withColumn(lon_col, crs_ops.wrap_lon(F.col(lon_col)))
        if self.output_crs is not None:
            from .operators import crs as crs_ops

            if lon_col not in df.columns or lat_col not in df.columns:
                raise DefinitionValidationError(
                    "output_crs needs coordinate columns in the output "
                    f"({lon_col!r}/{lat_col!r} not present)"
                )
            df = crs_ops.transform_crs(
                df, "EPSG:4326", self.output_crs, lon=lon_col, lat=lat_col
            )

        # melted output (csv converter's melted form, conv/csv_.py):
        # data variables stacked to (variable, value) rows
        if self.melted and value in df.columns:
            keep = [c for c in df.columns if c != value]
            df = df.select(
                *keep,
                F.lit(value).alias("variable"),
                F.col(value).alias("value"),
            )

        # spatial reorder (engine.py:555-568): ascending-longitude
        # presentation order, applicable only when the data is WRAPPED
        # (the reference warns + no-ops otherwise). Row order is
        # presentation-level in the relational model, so this is an
        # output-stage sort on the selection-sized result.
        reorder_cached = None
        if self.spatial_reorder and lon_col in df.columns:
            from .operators import crs as crs_ops

            # the wrapped-state probe must not re-run the whole plan just
            # to read min/max lon: decide driver-side when the params or
            # grid already say so, and persist around the data probe
            # otherwise (released after the sink consumes the cache)
            if self.vector_wrap or self.spatial_wrapping == "wrap":
                state = "wrapped"
            elif self.spatial_wrapping == "unwrap":
                state = "unwrapped"
            else:
                g = self.grid
                x0 = None
                if g is not None:
                    x0 = (g.lon0 if hasattr(g, "lon0")
                          else float(g.xb()[0]) if hasattr(g, "xb") else None)
                if x0 is not None:
                    state = "wrapped" if x0 < 0.0 else "unwrapped"
                else:
                    df = df.persist()
                    state = crs_ops.is_wrapped_state(df, lon_col)
                    reorder_cached = df
            if state == "wrapped":
                df = df.orderBy(F.col(lon_col).asc())

        self._progress(90, "converting")
        # file_only (definition.py:590-597): structure/metadata only —
        # the sink writes its header/schema with zero data rows
        if self.file_only:
            df = df.limit(0)

        # converter (interpreter.py:120-134)
        writer = conv.get_converter_map()[self.output_format]
        ops_doc = {k: str(v) for k, v in self.__dict__.items() if k != "dataset"}
        if self.output_format == "ocgis":
            out = writer(df)
            self._progress(100, "complete")
            return out
        import os

        path = os.path.join(self.dir_output, self.prefix)
        out = writer(
            df, path, ops_doc,
            aux=self.add_auxiliary_files,
            fmt_options=self.output_format_options,
        )
        if reorder_cached is not None:
            reorder_cached.unpersist()
        self._progress(100, "complete")
        return out

    def _progress(self, pct: int, message: str) -> None:
        """reference ``callback`` (core.py:93): f(percent, message)."""
        if self.callback is not None:
            self.callback(float(pct), message)

    def _with_grouping_keys(
        self, df: DataFrame, ts: str
    ) -> tuple[DataFrame, list[str]]:
        """Derive calc_grouping key columns (temporal.py:227-271 analogue):
        calendar parts become year()/month()/... columns; season lists
        become (season, season_year) with the DJF December year shift."""
        g = self.calc_grouping
        if not g:
            keys = [c for c in ("cell_y", "cell_x", "user_id") if c in df.columns][:1]
            return df, keys
        if isinstance(g, str):
            g = [g]
        if any(isinstance(s, (list, tuple)) for s in g):
            # seasonal month-set grouping, ANY disjoint partition plus the
            # 'year'/'unique' flags (reference temporal.py:467-597,661-692;
            # canonical [[12,1,2],...] is just the special case)
            sets = [s for s in g if isinstance(s, (list, tuple))]
            flags = [s for s in g if isinstance(s, str)]
            bad = [f for f in flags if f not in ("year", "unique")]
            if bad:
                raise DefinitionValidationError(
                    f"seasonal calc_grouping flags {bad!r} invalid "
                    "('year' | 'unique')"
                )
            year_flag = (
                "unique" if "unique" in flags
                else ("year" if "year" in flags else None)
            )
            mode = {None: None, "year": "calendar", "unique": "start"}[
                year_flag
            ]
            label, syear = temporal.custom_season_expr(sets, ts, mode)
            df = df.withColumn("season", label).filter(
                F.col("season").isNotNull()
            )
            keys = ["season"]
            if syear is not None:
                df = df.withColumn("season_year", syear)
                keys.append("season_year")
            if year_flag == "unique":
                # drop incomplete interannual groups (missing months at
                # the data boundary) BEFORE the calc aggregation: one
                # window pass sharing the group keys
                from pyspark.sql import Window

                need = temporal.interannual_need_expr(sets)
                w = Window.partitionBy(*keys)
                nm = F.size(F.collect_set(F.month(ts)).over(w))
                df = df.withColumn("_nm", nm).filter(
                    need.isNull() | (F.col("_nm") == need)
                ).drop("_nm")
            return df, keys
        keys = []
        fns = {"year": F.year, "month": F.month, "day": F.dayofmonth,
               "hour": F.hour}
        for part in g:
            if part == "all":
                continue
            if part not in fns:
                raise DefinitionValidationError(f"unknown grouping {part!r}")
            df = df.withColumn(part, fns[part](ts))
            keys.append(part)
        return df, keys
