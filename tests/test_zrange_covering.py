"""Adaptive multi-resolution Z-range covering (S2 RegionCoverer analogue).

Covers ``cellindex.covering_z_ranges`` (driver-side quad descent),
``spatial.zrange_filter`` (the bounded phase-1 predicate) and
``layout.polygon_scan_zordered`` (stat-pruned polygon reads). Reference
role: the buffered-envelope hint mask (``spatial/grid.py:1234-1272``) /
R-tree thinning (``spatial/index.py:5-87``) for selections whose flat
covering is too large to broadcast.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark import fixtures as FX
from ocgis_spark.geo.cellindex import (
    GridSpec,
    VectorGridSpec,
    covering_cells,
    covering_z_ranges,
    zdecode,
    zencode,
)
from ocgis_spark.operators import layout, spatial
from ocgis_spark.operators.vectorgrid import covering_cells as vg_covering

LSHAPE = FX.QUERY_LSHAPE

#: a thin diagonal strip whose bbox is (nearly) the whole grid extent —
#: the adversarial case for the bbox-envelope fallback
DIAG = np.array(
    [
        [-105.4, 36.6], [-104.9, 36.6], [-101.6, 39.9],
        [-101.6, 40.4], [-102.1, 40.4], [-105.4, 37.1], [-105.4, 36.6],
    ],
    dtype="f8",
)

HOLED = [
    np.array(
        [[-105.2, 36.8], [-101.8, 36.8], [-101.8, 40.2],
         [-105.2, 40.2], [-105.2, 36.8]], dtype="f8"
    ),
    np.array(
        [[-104.5, 37.5], [-103.0, 37.5], [-103.0, 39.0],
         [-104.5, 39.0], [-104.5, 37.5]], dtype="f8"
    ),
]


def _expand(ranges, spec):
    if not ranges:
        return set()
    ks = np.concatenate([np.arange(lo, hi + 1) for lo, hi in ranges])
    cy, cx = zdecode(ks)
    return set(ks[(cy < spec.ny) & (cx < spec.nx)].tolist())


@pytest.mark.parametrize("rings", [[LSHAPE], [DIAG], HOLED])
@pytest.mark.parametrize("n", [64, 256])
def test_unlimited_budget_equals_flat_covering(rings, n):
    spec = GridSpec().scaled(n)
    flat = set(covering_cells(spec, rings).tolist())
    got = _expand(covering_z_ranges(spec, rings, max_cells=10**9), spec)
    assert got == flat


def test_unlimited_budget_equals_flat_on_vector_grid():
    xe = -105.5 + 4.0 * np.linspace(0.0, 1.0, 129) ** 1.5
    ye = 36.5 + 4.0 * np.linspace(0.0, 1.0, 129) ** 0.7
    vg = VectorGridSpec.from_edges(xe, ye)
    cy, cx = vg_covering(vg, [LSHAPE])
    flat = set(zencode(cy, cx).tolist())
    got = _expand(covering_z_ranges(vg, [LSHAPE], max_cells=10**9), vg)
    assert got == flat


@pytest.mark.parametrize("budget", [8, 16, 64, 256])
def test_budget_gives_bounded_sorted_disjoint_superset(budget):
    spec = GridSpec().scaled(256)
    flat = set(covering_cells(spec, [DIAG]).tolist())
    ranges = covering_z_ranges(spec, [DIAG], max_cells=budget)
    # bounded: node budget caps interval count (merging only shrinks)
    assert 0 < len(ranges) <= budget
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert l1 <= h1 and h1 + 1 < l2  # sorted, disjoint, merged
    assert flat <= _expand(ranges, spec)  # never drops a covering cell


def test_budget_monotone_tightening():
    spec = GridSpec().scaled(256)
    sizes = [
        len(_expand(covering_z_ranges(spec, [DIAG], max_cells=b), spec))
        for b in (8, 64, 1024, 10**9)
    ]
    assert sizes == sorted(sizes, reverse=True)
    flat = len(covering_cells(spec, [DIAG]))
    # the diagonal strip: bbox envelope ~ whole grid, adaptive ~ strip
    # (budget 8 may legitimately stop at the 4 root quads = full grid)
    assert sizes[1] < 256 * 256  # 64 nodes already beat the bbox
    assert sizes[-1] == flat


def test_disjoint_polygon_yields_empty():
    assert covering_z_ranges(FX.DOC_GRID, [LSHAPE + [100.0, 0.0]]) == []


def test_zrange_filter_matches_coarse_filter_after_refine(spark):
    # points scattered over (and slightly past) the grid extent
    n = 4000
    rng = np.random.default_rng(7)
    import pandas as pd

    pts = pd.DataFrame({
        "pid": np.arange(n),
        "lon": rng.uniform(-106.0, -101.0, n),
        "lat": rng.uniform(36.0, 41.0, n),
    })
    df = spatial.encode_cells(
        spark.createDataFrame(pts), FX.DOC_GRID
    ).cache()
    for rings in ([LSHAPE], [DIAG], HOLED):
        via_cov = spatial.refine_points(
            spatial.coarse_filter(spark, df, FX.DOC_GRID, rings),
            rings, keep_touches=True,
        )
        via_z = spatial.refine_points(
            spatial.zrange_filter(df, FX.DOC_GRID, rings, max_cells=32),
            rings, keep_touches=True,
        )
        a = sorted(r["pid"] for r in via_cov.select("pid").collect())
        b = sorted(r["pid"] for r in via_z.select("pid").collect())
        assert a == b and len(a) > 0
    df.unpersist()


def test_zrange_filter_plan_no_shuffle_no_python_codegen_survives(spark):
    df = spatial.encode_cells(
        spark.range(100).select(
            (F.col("id") * 0.001 - 105.0).alias("lon"),
            (F.col("id") * 0.001 + 38.0).alias("lat"),
        ),
        FX.DOC_GRID,
    )
    out = spatial.zrange_filter(df, FX.DOC_GRID, [LSHAPE], max_cells=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # only exchange = the interval-table broadcast; no shuffle
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the Morton key is projected ONCE then joined — an inline
    # OR-of-BETWEEN re-expands the spread per comparison and blows
    # janino's 64 KB method limit (silent interpreted fallback).
    # Disabling the fallback makes any such regression fatal here.
    fallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", fallback)


def test_zrange_filter_rejects_wide_grids(spark):
    big = GridSpec(res=4.0 / 100000.0, nx=100000, ny=100000)
    with pytest.raises(ValueError, match="Morton domain"):
        spatial.zrange_filter(None, big, [LSHAPE])


def test_zrange_filter_rejects_ugid_collision(spark):
    # an input that ALREADY carries the output column would collide with
    # the interval table's attribute (a downstream drop would remove
    # both) — zrange_filter_many must fail loudly, not corrupt the column
    df = spark.range(4).select(
        F.lit(7).alias("ugid"),
        (F.col("id") % 2).cast("int").alias("cell_x"),
        (F.col("id") % 2).cast("int").alias("cell_y"),
    )
    with pytest.raises(ValueError, match="ugid"):
        spatial.zrange_filter_many(df, FX.DOC_GRID, [(0, [LSHAPE])])


def test_zrange_filter_preserves_caller_ugid_column(spark):
    # ...but the single-geometry zrange_filter delegates with a PRIVATE
    # column name, so re-subsetting a frame that already carries 'ugid'
    # (e.g. spatial_subset_many output) keeps the caller's column intact
    # (r4s11 review: the guard must not regress zrange_filter's contract)
    df = spark.range(2000).select(
        F.lit(7).alias("ugid"),
        (F.col("id") % 64).cast("int").alias("cell_x"),
        ((F.col("id") * 31) % 64).cast("int").alias("cell_y"),
    )
    out = spatial.zrange_filter(df, FX.DOC_GRID, [LSHAPE], max_cells=64)
    assert "ugid" in out.columns
    assert out.count() > 0
    assert out.select("ugid").distinct().collect()[0][0] == 7


def test_polygon_scan_zordered_parity_and_pruning(spark, tmp_path):
    # 64x64 z-ordered layout, several rows per cell
    df = spark.range(16384).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 64).cast("int").alias("cell_x"),
        ((F.col("id") % 4096) / 64).cast("int").alias("cell_y"),
    )
    path = str(tmp_path / "zpoly")
    layout.zorder_write(df, path, num_files=16)

    # index-space diagonal polygon over the same 64x64 domain
    spec = GridSpec(lon0=0.0, lat0=0.0, res=1.0, nx=64, ny=64)
    rings = [np.array(
        [[0.0, 0.0], [12.0, 0.0], [64.0, 52.0], [64.0, 64.0],
         [52.0, 64.0], [0.0, 12.0], [0.0, 0.0]], dtype="f8")]

    got = layout.polygon_scan_zordered(spark, path, spec, rings, max_cells=256)
    # parity: superset semantics — every flat-covering row present
    cov = set(covering_cells(spec, rings).tolist())
    expect = {
        r["row_id"] for r in df.collect()
        if int(zencode(np.array([r["cell_y"]]), np.array([r["cell_x"]]))[0]) in cov
    }
    got_ids = {r["row_id"] for r in got.collect()}
    assert expect <= got_ids

    # pruning: the diagonal's Z intervals touch fewer files than the
    # bbox envelope (which spans the whole grid -> all 16 files)
    fkr = sorted(
        (r["mn"], r["mx"])
        for r in spark.read.parquet(path)
        .withColumn("_f", F.input_file_name())
        .groupBy("_f").agg(F.min("zkey").alias("mn"), F.max("zkey").alias("mx"))
        .collect()
    )
    ranges = covering_z_ranges(spec, rings, max_cells=256)
    touched = sum(
        1 for lo, hi in fkr
        if any(not (hi < a or lo > b) for a, b in ranges)
    )
    assert touched < len(fkr)

    # the predicate is pushed to the parquet scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan


def test_zrange_filter_on_stream_matches_batch(spark, tmp_path):
    """Geo-fenced STREAMING ingest through the adaptive Z-range phase 1:
    zrange_filter is stateless (narrow projection + stream-static
    broadcast semi-join on the interval table), so continuous ingest gets
    the identical admission set. Stream results == batch results."""
    import pandas as pd

    n = 2000
    rng = np.random.default_rng(11)
    pts = pd.DataFrame({
        "pid": np.arange(n),
        "lon": rng.uniform(-106.0, -101.0, n),
        "lat": rng.uniform(36.0, 41.0, n),
    })
    src = str(tmp_path / "pts_in")
    spark.createDataFrame(pts).repartition(4).write.parquet(src)

    batch = spatial.refine_points(
        spatial.zrange_filter(
            spatial.encode_cells(spark.read.parquet(src), FX.DOC_GRID),
            FX.DOC_GRID, [LSHAPE], max_cells=32,
        ),
        [LSHAPE], keep_touches=True,
    )
    expected = sorted(r["pid"] for r in batch.select("pid").collect())

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    fenced = spatial.refine_points(
        spatial.zrange_filter(
            spatial.encode_cells(stream, FX.DOC_GRID),
            FX.DOC_GRID, [LSHAPE], max_cells=32,
        ),
        [LSHAPE], keep_touches=True,
    )
    assert fenced.isStreaming
    q = (
        fenced.select("pid").writeStream.format("memory")
        .queryName("zrange_fence_t").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckz"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        r["pid"] for r in spark.sql("SELECT * FROM zrange_fence_t").collect()
    )
    assert got == expected and len(got) > 0


def test_zrange_filter_on_vector_grid_matches_covering(spark):
    """The bounded phase 1 is grid-agnostic: on a NON-UNIFORM
    (VectorGridSpec) grid, zrange_filter (vcx/vcy columns) + exact refine
    equals the flat-covering semijoin + refine."""
    import pandas as pd

    from ocgis_spark.operators import vectorgrid as VG

    xe = -105.5 + 4.0 * np.linspace(0.0, 1.0, 97) ** 1.4
    ye = 36.5 + 4.0 * np.linspace(0.0, 1.0, 97) ** 0.8
    vg = VectorGridSpec.from_edges(xe, ye)
    n = 3000
    rng = np.random.default_rng(23)
    pts = pd.DataFrame({
        "pid": np.arange(n),
        "lon": rng.uniform(-106.0, -101.0, n),
        "lat": rng.uniform(36.0, 41.0, n),
    })
    df = VG.encode_cells(spark.createDataFrame(pts), vg).cache()

    cand = spatial.zrange_filter(
        df, vg, [LSHAPE], max_cells=48, cell_x="vcx", cell_y="vcy"
    )
    via_z = spatial.refine_points(cand, [LSHAPE], keep_touches=True)

    cy, cx = vg_covering(vg, [LSHAPE])
    cov = spark.createDataFrame(
        pd.DataFrame({"cov_y": cy.astype("int32"), "cov_x": cx.astype("int32")})
    )
    flat_cand = df.join(
        F.broadcast(cov),
        (df["vcy"] == cov["cov_y"]) & (df["vcx"] == cov["cov_x"]),
        "leftsemi",
    )
    via_cov = spatial.refine_points(flat_cand, [LSHAPE], keep_touches=True)

    a = sorted(r["pid"] for r in via_cov.select("pid").collect())
    b = sorted(r["pid"] for r in via_z.select("pid").collect())
    assert a == b and len(a) > 0
    df.unpersist()


def test_single_geom_subset_fine_grid_envelope_degrade(spark):
    """>16-bit grid + covering too large to broadcast on the SINGLE-
    geometry path: coarse_filter must degrade from the ESTIMATE without
    enumerating the flat covering (pre-fix, covering_cells meshgridded
    ~6e8 cells here and hung the driver — r4s11 review, the twin of the
    spatial_subset_many fix). Exact results still: phase 2 refines."""
    from ocgis_spark.geo import geometry as G
    from ocgis_spark.geo.cellindex import GridSpec

    fine = GridSpec(res=4.0 / 100_000, nx=100_000, ny=100_000)
    pts = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 0.01 - 105.4).alias("lon"),
        (F.col("id") * 0.008 + 37.0).alias("lat"),
    )
    df = spatial.encode_cells(pts, fine)
    out = spatial.spatial_subset(
        spark, df, fine, [LSHAPE], operation="intersects",
        abstraction="point", keep_touches=True,
    )
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    rows = pts.collect()
    px = np.array([r.lon for r in rows])
    py = np.array([r.lat for r in rows])
    ids = np.array([r.doc_id for r in rows])
    mask = G.points_in_polygon(px, py, [LSHAPE], keep_touches=True)
    assert got == set(ids[mask].tolist())
    assert got
