"""Portability: every pandas→Spark conversion with array-typed columns
must work WITHOUT Arrow (the driver's vanilla SparkSession has
``spark.sql.execution.arrow.pyspark.enabled=false``; round-2's
``curvilinear_clip`` red row was exactly this — numpy-array cells fail
row-wise schema inference with CANNOT_INFER_TYPE_FOR_FIELD).

Arrow enablement is a runtime conf, so we toggle it off on the shared
session, exercise the conversion sites, and restore it."""
import contextlib

import numpy as np
import pytest

from ocgis_spark.operators import vectorgrid as VG
from ocgis_spark.operators import similarity as SIM


@contextlib.contextmanager
def no_arrow(spark):
    key = "spark.sql.execution.arrow.pyspark.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def test_corner_table_without_arrow(spark):
    vg = VG.VectorGridSpec(
        x_edges=(0.0, 1.0, 2.5, 4.0), y_edges=(0.0, 2.0, 3.0)
    )
    X, Y = VG.expand_edges(vg)
    X, Y = VG.shear_grid(X, Y, 0.1)
    with no_arrow(spark):
        df = VG.corner_table(spark, X, Y)
        rows = df.orderBy("elem_id").collect()
    assert len(rows) == 6
    assert [f.name for f in df.schema.fields] == [
        "elem_id", "corner_lons", "corner_lats"
    ]
    assert len(rows[0]["corner_lons"]) == 4
    # ll corner of elem 0 is the (sheared) grid origin
    assert rows[0]["corner_lats"][0] == 0.0


def test_curvilinear_clip_without_arrow(spark):
    """The exact shape of the driver's red row: a curvilinear clip run on
    a session with Arrow disabled."""
    vg = VG.VectorGridSpec(
        x_edges=tuple(np.linspace(0.0, 4.0, 5)),
        y_edges=tuple(np.linspace(0.0, 3.0, 4)),
    )
    X, Y = VG.expand_edges(vg)
    X, Y = VG.shear_grid(X, Y, 0.2)
    ring = np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 2.5], [0.5, 2.5]])
    with no_arrow(spark):
        out = VG.curvilinear_subset(spark, X, Y, [ring], operation="clip")
        got = out.collect()
    assert len(got) > 0


def test_ivf_train_without_arrow(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(64, 8))
    rows = [(int(i), mat[i].tolist()) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with no_arrow(spark):
        cent = SIM.ivf_train(emb, k=4, iters=3)
        got = cent.orderBy("vec_id").collect()
    assert len(got) == 4
    for r in got:
        v = np.array(r["embedding"])
        assert v.shape == (8,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_round3_conversion_sites_without_arrow(spark):
    """Round-3 createDataFrame sites (bilinear/nearest weights, interior
    covering semijoin, kNN eager local relation) under a no-Arrow
    session — the driver's environment."""
    from ocgis_spark.fixtures import (
        DOC_GRID, GOLDEN_GRID, QUERY_LSHAPE, VEC_GRID, VEC_GRID_DST,
    )
    from ocgis_spark.geo.cellindex import covering_cells_split
    from ocgis_spark.operators import knn, regrid, spatial

    with no_arrow(spark):
        w = regrid.bilinear_weights_vector(spark, VEC_GRID, VEC_GRID_DST)
        assert w.count() == 4 * VEC_GRID_DST.nx * VEC_GRID_DST.ny
        nw = regrid.nearest_weights_vector(spark, VEC_GRID, VEC_GRID_DST)
        assert nw.count() == VEC_GRID_DST.nx * VEC_GRID_DST.ny
        iw = regrid.idw_weights_vector(spark, VEC_GRID, VEC_GRID_DST)
        assert iw.count() == 4 * VEC_GRID_DST.nx * VEC_GRID_DST.ny

        int_z, bnd_z = covering_cells_split(DOC_GRID, [QUERY_LSHAPE])
        cells = spark.createDataFrame(
            [(y, x) for y in range(4) for x in range(4)],
            "cell_y int, cell_x int",
        )
        assert spatial._cell_semijoin(
            spark, cells, np.concatenate([int_z, bnd_z])
        ).count() >= 0

        out = knn.knn_cells(cells, GOLDEN_GRID, -104.0, 38.5, k=3)
        assert out.count() == 3


def test_pq_train_without_arrow(spark):
    """pq_train's createDataFrame(pandas) site carries a non-scalar 'cb'
    column — the explicit schema must keep it working on a plain session
    (CLAUDE.md conversion-site rule)."""
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(64, 16))
    rows = [(int(i), mat[i].tolist()) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with no_arrow(spark):
        cb = SIM.pq_train(emb, m=4, k=4, max_sample=64, iters=3)
        got = cb.orderBy("sub", "code").collect()
    assert len(got) == 16
    assert all(len(r["cb"]) == 4 for r in got)


def test_zrange_filter_without_arrow(spark):
    """r4s10 conversion site: zrange_filter's interval table
    (spatial.py — scalar bigint columns with an explicit schema)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ocgis_spark import fixtures as FX
    from ocgis_spark.operators import spatial

    df = spatial.encode_cells(
        spark.range(200).select(
            (F.col("id") * 0.02 - 105.4).alias("lon"),
            (F.col("id") * 0.015 + 37.0).alias("lat"),
        ),
        FX.DOC_GRID,
    )
    with no_arrow(spark):
        out = spatial.zrange_filter(
            df, FX.DOC_GRID, [FX.QUERY_LSHAPE], max_cells=64
        )
        n = out.count()
    assert n > 0


def test_zrange_filter_many_without_arrow(spark):
    """r4s10 conversion sites: zrange_filter_many's (ugid, z_lo, z_hi)
    interval table and the envelope-degrade bbox table (spatial.py —
    scalar columns with explicit schemas). zrange_filter delegates here,
    so this is THE conversion site of both paths."""
    import numpy as np
    from pyspark.sql import functions as F

    from ocgis_spark import fixtures as FX
    from ocgis_spark.operators import spatial

    df = spatial.encode_cells(
        spark.range(200).select(
            (F.col("id") * 0.02 - 105.4).alias("lon"),
            (F.col("id") * 0.015 + 37.0).alias("lat"),
        ),
        FX.DOC_GRID,
    )
    polys = [(1, [FX.QUERY_LSHAPE]), (2, [FX.rect_ring(-105.0, 37.0, -104.0, 38.0)])]
    with no_arrow(spark):
        out = spatial.zrange_filter_many(df, FX.DOC_GRID, polys, max_cells=64)
        n = out.groupBy("ugid").count().count()
    assert n == 2


def test_envelope_degrade_without_arrow(spark):
    """r4s10/r4s11 conversion site: spatial_subset_many's per-ugid
    envelope bbox table (spatial.py — the >16-bit-grid degrade path;
    scalar double columns with an explicit schema)."""
    from pyspark.sql import functions as F

    from ocgis_spark import fixtures as FX
    from ocgis_spark.geo.cellindex import GridSpec
    from ocgis_spark.operators import spatial

    fine = GridSpec(res=4.0 / 100_000, nx=100_000, ny=100_000)
    df = spatial.encode_cells(
        spark.range(200).select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 0.02 - 105.4).alias("lon"),
            (F.col("id") * 0.015 + 37.0).alias("lat"),
        ),
        fine,
    )
    rect = [FX.rect_ring(-105.0, 37.0, -104.0, 38.0)]
    with no_arrow(spark):
        out = spatial.spatial_subset_many(
            spark, df, fine, [(1, rect)], keep_touches=True
        )
        n = out.count()
    assert n > 0
