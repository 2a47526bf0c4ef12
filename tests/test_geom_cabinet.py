"""GeomCabinet catalog: WKB round trip, UID + SQL-where pushdown, and
feeding spatial_subset_many from the catalog."""

import numpy as np
from pyspark.sql import functions as F

from ocgis_spark.fixtures import DOC_GRID, QUERY_PENTAGON, rect_ring, register_docs_geo
from ocgis_spark.geom_cabinet import GeomCabinet, write_geom_table
from ocgis_spark.operators import spatial

SF = "/root/testdata/sf0.001"


def test_cabinet_roundtrip_and_pushdown(spark, tmp_path):
    uri = str(tmp_path / "geoms")
    write_geom_table(
        spark, uri,
        [
            (1, "poly", [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
            (2, "poly", [QUERY_PENTAGON]),
            (3, "point", (-104.0, 38.5)),
            (4, "multipoly", [[rect_ring(0, 0, 1, 1)], [rect_ring(2, 2, 3, 3)]]),
        ],
        attrs={1: "golden", 2: "penta", 3: "pt", 4: "mp"},
    )
    cab = GeomCabinet(uri)
    all_geoms = cab.iter_geoms(spark)
    assert len(all_geoms) == 5  # multipolygon explodes to 2 parts
    by_uid = cab.iter_geoms(spark, select_uid=[1, 3])
    assert sorted({u for u, _ in by_uid}) == [1, 3]
    by_sql = cab.iter_geoms(spark, select_sql_where="note = 'penta'")
    assert [u for u, _ in by_sql] == [2]
    ring = by_sql[0][1][0]
    np.testing.assert_allclose(ring, QUERY_PENTAGON)


def test_cabinet_feeds_multi_subset(spark, tmp_path):
    uri = str(tmp_path / "geoms2")
    write_geom_table(
        spark, uri,
        [
            (1, "poly", [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
            (2, "poly", [QUERY_PENTAGON]),
        ],
    )
    polys = GeomCabinet(uri).iter_geoms(spark)
    dg = register_docs_geo(spark, SF)
    out = spatial.spatial_subset_many(spark, dg, DOC_GRID, polys)
    counts = {r.ugid: r.n for r in
              out.groupBy("ugid").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] > 0 and counts[2] > 0


def test_wkb_scalar_functions(spark, tmp_path):
    from ocgis_spark.geo import wkb as WKB
    from ocgis_spark.operators import geomfuncs as GF

    uri = str(tmp_path / "geoms3")
    write_geom_table(
        spark, uri,
        [
            (1, "poly", [rect_ring(0.0, 0.0, 2.0, 3.0)]),
            (2, "point", (5.0, 5.0)),
            (3, "multipoly", [[rect_ring(0, 0, 1, 1)], [rect_ring(2, 2, 4, 4)]]),
        ],
    )
    df = spark.read.parquet(uri)
    out = {r.ugid: r for r in df.select(
        "ugid",
        GF.wkb_area("geom_wkb").alias("area"),
        GF.wkb_centroid("geom_wkb").alias("c"),
        GF.wkb_bounds("geom_wkb").alias("b"),
    ).collect()}
    assert out[1].area == 6.0
    assert (out[1].c.x, out[1].c.y) == (1.0, 1.5)
    assert out[2].area == 0.0 and (out[2].c.x, out[2].c.y) == (5.0, 5.0)
    assert out[3].area == 1.0 + 4.0
    assert (out[3].b.minx, out[3].b.maxy) == (0.0, 4.0)
    # square-cap buffer grows the envelope by r on every side
    buffered = df.filter(F.col("ugid") == 1).select(
        GF.wkb_bounds(GF.wkb_buffer_box(F.col("geom_wkb"), 0.5)).alias("b")
    ).collect()[0].b
    assert (buffered.minx, buffered.miny, buffered.maxx, buffered.maxy) == (
        -0.5, -0.5, 2.5, 3.5)
