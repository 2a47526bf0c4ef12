"""Non-uniform (VectorGridSpec) + curvilinear grid semantics.

Reference behavior: ``Grid`` accepts arbitrary coordinate vectors with
bounds (``src/ocgis/spatial/grid.py:350-362``) and 2-D curvilinear
coordinates via ``expand_grid`` (``grid.py:1287-1348``); subset/clip treat
each cell as its bounds polygon.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocgis_spark import fixtures as FX
from ocgis_spark.geo import geometry as G
from ocgis_spark.geo.cellindex import VectorGridSpec
from ocgis_spark.operators import vectorgrid as VG


def test_cell_of_matches_range_join_semantics():
    vg = FX.VEC_GRID
    rng = np.random.RandomState(5)
    lon = rng.uniform(vg.x_edges[0] - 0.5, vg.x_edges[-1] + 0.5, 2000)
    lat = rng.uniform(vg.y_edges[0] - 0.5, vg.y_edges[-1] + 0.5, 2000)
    cy, cx = vg.cell_of(lon, lat)
    xb, yb = vg.xb(), vg.yb()
    for i in range(0, 2000, 37):
        # brute-force lb <= v < ub
        ex = np.nonzero((lon[i] >= xb[:-1]) & (lon[i] < xb[1:]))[0]
        ey = np.nonzero((lat[i] >= yb[:-1]) & (lat[i] < yb[1:]))[0]
        assert cx[i] == (ex[0] if len(ex) else -1)
        assert cy[i] == (ey[0] if len(ey) else -1)


def test_encode_cells_spark_matches_numpy(spark):
    vg = FX.VEC_GRID
    rng = np.random.RandomState(6)
    pdf = pd.DataFrame({
        "lon": rng.uniform(-106, -101, 500),
        "lat": rng.uniform(36, 41, 500),
    })
    df = spark.createDataFrame(pdf)
    out = VG.encode_cells(df, vg).toPandas()
    cy, cx = vg.cell_of(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    assert (out["vcx"].to_numpy() == cx).all()
    assert (out["vcy"].to_numpy() == cy).all()


def test_clip_rect_total_area(spark):
    """Rect strictly inside the grid: clipped cell areas sum to rect area."""
    vg = FX.VEC_GRID
    cells = spark.createDataFrame(
        pd.DataFrame({
            "vcx": np.tile(np.arange(vg.nx, dtype="i4"), vg.ny),
            "vcy": np.repeat(np.arange(vg.ny, dtype="i4"), vg.nx),
        })
    )
    rect = (-104.3, 37.6, -102.7, 39.4)
    out = VG.clip_rect_cells(cells, spark, vg, rect).toPandas()
    assert out["clip_area"].sum() == pytest.approx(
        (rect[2] - rect[0]) * (rect[3] - rect[1]), rel=1e-12
    )


def test_nonuniform_polygon_clip_matches_scalar_kernel(spark):
    vg = FX.VEC_GRID
    cells = spark.createDataFrame(
        pd.DataFrame({
            "vcx": np.tile(np.arange(vg.nx, dtype="i4"), vg.ny),
            "vcy": np.repeat(np.arange(vg.ny, dtype="i4"), vg.nx),
        })
    )
    out = VG.spatial_subset(
        spark, cells, vg, [FX.QUERY_PENTAGON], operation="clip",
        abstraction="polygon", keep_touches=False,
    ).toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        minx, miny, maxx, maxy = vg.bounds([int(r.vcy)], [int(r.vcx)])
        exp = G.box_polygon_clip_area(
            [FX.QUERY_PENTAGON], minx[0], miny[0], maxx[0], maxy[0]
        )
        assert r.clip_area == pytest.approx(exp, rel=1e-12)
    # total clip area == pentagon area (pentagon strictly inside the grid)
    assert out["clip_area"].sum() == pytest.approx(
        G.polygon_area([FX.QUERY_PENTAGON]), rel=1e-9
    )


def test_curvilinear_clip_analytic(spark):
    """Sheared grid (parallelogram cells): clip by a polygon covering the
    whole mesh -> per-cell areas equal the parallelogram area; clip by a
    small rect inside one cell -> exactly the rect area."""
    from ocgis_spark.fixtures import GOLDEN_GRID as GG

    spec = VectorGridSpec.from_edges(
        np.linspace(GG.lon0, GG.lon1, 5), np.linspace(GG.lat0, GG.lat1, 5)
    )
    X, Y = VG.expand_edges(spec)
    Xs, Ys = VG.shear_grid(X, Y, 0.25)
    # cover-everything polygon
    big = FX.rect_ring(GG.lon0 - 2, GG.lat0 - 2, GG.lon1 + 4, GG.lat1 + 2)
    out = VG.curvilinear_subset(spark, Xs, Ys, [big], operation="clip").toPandas()
    assert len(out) == 16
    cell_area = (X[0, 1] - X[0, 0]) * (Y[1, 0] - Y[0, 0])  # shear preserves area
    assert np.allclose(out["clip_area"], cell_area, rtol=1e-9)

    # small rect strictly inside the sheared cell (0, 0)
    cxl = Xs[0, 0] + 0.25 * (Y[1, 0] - Y[0, 0]) + 0.05
    rect = FX.rect_ring(cxl + 0.1, Y[0, 0] + 0.3, cxl + 0.4, Y[0, 0] + 0.6)
    out2 = VG.curvilinear_subset(spark, Xs, Ys, [rect], operation="clip").toPandas()
    assert len(out2) == 1
    assert out2["clip_area"].iloc[0] == pytest.approx(0.3 * 0.3, rel=1e-9)


def test_conservative_regrid_vector_properties(spark):
    """Conservation: with full mutual coverage, every dst weight_sum == 1
    and the area-weighted integral is preserved; the applied (join) path
    equals the materialized-weights path."""
    import numpy as np
    from pyspark.sql import functions as F

    from ocgis_spark.operators import regrid as RG

    src, dst = FX.VEC_GRID, FX.VEC_GRID_DST
    cells = spark.range(src.nx * src.ny).select(
        (F.col("id") % src.nx).cast("int").alias("vcx"),
        F.floor(F.col("id") / src.nx).cast("int").alias("vcy"),
    ).withColumn("value", ((F.col("vcy") * 3 + F.col("vcx")) % 5).cast("double"))

    out = RG.apply_conservative_vector(cells, spark, src, dst).toPandas()
    assert len(out) == dst.nx * dst.ny
    assert np.allclose(out["weight_sum"], 1.0, atol=1e-12)

    # integral conservation: sum(dst_value * dst_area) == sum(v * src_area)
    dxb, dyb = dst.xb(), dst.yb()
    d_area = {
        dy * dst.nx + dx: (dxb[dx + 1] - dxb[dx]) * (dyb[dy + 1] - dyb[dy])
        for dy in range(dst.ny) for dx in range(dst.nx)
    }
    dst_integral = sum(r.dst_value * d_area[r.dst_id] for r in out.itertuples())
    sxb, syb = src.xb(), src.yb()
    cpdf = cells.toPandas()
    src_integral = sum(
        r.value * (sxb[r.vcx + 1] - sxb[r.vcx]) * (syb[r.vcy + 1] - syb[r.vcy])
        for r in cpdf.itertuples()
    )
    assert dst_integral == pytest.approx(src_integral, rel=1e-12)

    # parity with the materialized weight table
    w = RG.conservative_weights_vector(spark, src, dst)
    sv = cells.withColumn(
        "src_id", (F.col("vcy").cast("bigint") * src.nx + F.col("vcx"))
    )
    out2 = RG.apply_weights(sv, w).toPandas().sort_values("dst_id")
    out = out.sort_values("dst_id")
    assert np.allclose(out["dst_value"].to_numpy(), out2["dst_value"].to_numpy(),
                       rtol=1e-12)


def test_vector_multi_geometry_clip_matches_scalar(spark):
    """spatial_subset_many polygon abstraction on the vector grid: per-ugid
    clip areas match the scalar kernel for both a rect and the pentagon."""
    vg = FX.VEC_GRID
    cells = spark.createDataFrame(
        pd.DataFrame({
            "vcx": np.tile(np.arange(vg.nx, dtype="i4"), vg.ny),
            "vcy": np.repeat(np.arange(vg.ny, dtype="i4"), vg.nx),
        })
    )
    rect = FX.rect_ring(-104.3, 37.6, -102.7, 39.4)
    polys = [(1, [rect]), (2, [FX.QUERY_PENTAGON])]
    out = VG.spatial_subset_many(
        spark, cells, vg, polys, abstraction="polygon", keep_touches=False
    ).toPandas()
    assert set(out["ugid"]) == {1, 2}
    for _, r in out.iterrows():
        minx, miny, maxx, maxy = vg.bounds([int(r.vcy)], [int(r.vcx)])
        rings = [rect] if r.ugid == 1 else [FX.QUERY_PENTAGON]
        exp = G.box_polygon_clip_area(rings, minx[0], miny[0], maxx[0], maxy[0])
        assert r.clip_area == pytest.approx(exp, rel=1e-12)
    # per-ugid totals conserve the selection areas
    tot = out.groupby("ugid")["clip_area"].sum()
    assert tot[1] == pytest.approx(1.6 * 1.8, rel=1e-9)
    assert tot[2] == pytest.approx(G.polygon_area([FX.QUERY_PENTAGON]), rel=1e-9)


def test_streaming_subset_on_vector_grid(spark, tmp_path):
    """The same vector-grid subset operator runs unchanged on a document
    STREAM (stream == batch per-cell counts)."""
    from pyspark.sql import functions as F

    vg = FX.VEC_GRID
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "doc_id": np.arange(3000),
        "lon": rng.uniform(-105.5, -101.5, 3000),
        "lat": rng.uniform(36.5, 40.5, 3000),
    })
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    batch = VG.encode_cells(spark.read.parquet(src), vg)
    rect = (-104.3, 37.6, -102.7, 39.4)
    from ocgis_spark.operators import spatial
    b_out = (
        spatial.bbox_filter(batch, rect)
        .groupBy("vcx", "vcy").count().toPandas()
        .sort_values(["vcx", "vcy"]).reset_index(drop=True)
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    s_enc = VG.encode_cells(stream, vg)
    s_out = spatial.bbox_filter(s_enc, rect).groupBy("vcx", "vcy").count()
    q = (
        s_out.writeStream.format("memory").queryName("vec_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM vec_stream").toPandas()
        .sort_values(["vcx", "vcy"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, b_out)


def test_edges_from_centroids_matches_reference():
    """set_extrapolated_bounds semantics (helpers.py:195-258): interior
    edges = consecutive-centroid midpoints, end edges mirrored."""
    import numpy as np
    from ocgis_spark.geo.cellindex import VectorGridSpec, edges_from_centroids

    np.testing.assert_allclose(
        edges_from_centroids([1.0, 2.0, 3.0]), [0.5, 1.5, 2.5, 3.5]
    )
    # non-uniform spacing: end edges mirror the nearest midpoint
    np.testing.assert_allclose(
        edges_from_centroids([0.0, 1.0, 4.0]), [-0.5, 0.5, 2.5, 5.5]
    )
    vg = VectorGridSpec.from_centroids([1.0, 2.0, 3.0], [10.0, 20.0])
    assert vg.nx == 3 and vg.ny == 2
    # every centroid falls inside its own cell
    cy, cx = vg.cell_of(np.array([1.0, 2.0, 3.0]), np.array([10.0, 20.0, 20.0]))
    assert list(cx) == [0, 1, 2] and list(cy) == [0, 1, 1]
    import pytest
    with pytest.raises(ValueError):
        edges_from_centroids([1.0])


def test_vector_split_covering_nonconvex_parity(spark):
    """Non-uniform grid, non-convex ring, point abstraction: the
    interior/boundary split path must match direct ray-cast PIP."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.fixtures import VEC_GRID, QUERY_LSHAPE
    from ocgis_spark.geo import geometry as G
    from ocgis_spark.operators import vectorgrid as VG

    vg = VEC_GRID
    icy, icx, bcy, bcx = VG.covering_cells_split(vg, [QUERY_LSHAPE])
    cov_cy, cov_cx = VG.covering_cells(vg, [QUERY_LSHAPE])
    assert len(icy) + len(bcy) == len(cov_cy)
    # no false interior: all 4 corners of interior cells are inside
    if len(icy):
        bminx, bminy, bmaxx, bmaxy = vg.bounds(icy, icx)
        for xs, ys in [(bminx, bminy), (bmaxx, bminy), (bminx, bmaxy),
                       (bmaxx, bmaxy)]:
            assert G.points_in_polygon(xs, ys, [QUERY_LSHAPE], True).all()

    rng = np.random.RandomState(5)
    n = 3000
    lon = rng.uniform(vg.xb()[0], vg.xb()[-1], n)
    lat = rng.uniform(vg.yb()[0], vg.yb()[-1], n)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n), "lon": lon, "lat": lat})
    )
    enc = VG.encode_cells(df, vg)
    got = {
        r["doc_id"]
        for r in VG.spatial_subset(
            spark, enc, vg, [QUERY_LSHAPE], operation="intersects",
            abstraction="point", keep_touches=True,
        ).collect()
    }
    want = set(
        np.arange(n)[
            G.points_in_polygon(lon, lat, [QUERY_LSHAPE], True)
        ].tolist()
    )
    assert got == want


def test_vector_multi_geom_nonconvex_point_parity(spark):
    """spatial_subset_many POINT abstraction on the vector grid with a
    non-convex ugid: the per-ugid interior-raster UDF must match the
    driver-side ray cast for every geometry kind in the same plan."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.fixtures import (
        QUERY_LSHAPE, QUERY_PENTAGON, VEC_GRID, rect_ring,
    )
    from ocgis_spark.geo import geometry as G
    from ocgis_spark.operators import vectorgrid as VG

    vg = VEC_GRID
    rng = np.random.RandomState(23)
    n = 2500
    lon = rng.uniform(vg.xb()[0], vg.xb()[-1], n)
    lat = rng.uniform(vg.yb()[0], vg.yb()[-1], n)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n), "lon": lon, "lat": lat})
    )
    enc = VG.encode_cells(df, vg)
    polys = [
        (1, [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
        (2, [QUERY_PENTAGON]),
        (3, [QUERY_LSHAPE]),  # non-convex -> interior-raster UDF path
    ]
    out = VG.spatial_subset_many(spark, enc, vg, polys, abstraction="point")
    got = {
        u: {r["doc_id"] for r in out.filter(F.col("ugid") == u).collect()}
        for u in (1, 2, 3)
    }
    for u, rings in polys:
        mask = G.points_in_polygon(lon, lat, rings, keep_touches=True)
        assert got[u] == set(np.arange(n)[mask].tolist()), f"ugid {u}"
    assert got[3]
