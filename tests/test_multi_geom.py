"""Multi-geometry subset (mixed rect/convex/non-convex) and batch kNN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import DOC_GRID, QUERY_PENTAGON, rect_ring, register_docs_geo
from ocgis_spark.geo import geometry as G
from ocgis_spark.operators import knn, spatial

SF = "/root/testdata/sf0.001"

L_SHAPE = np.array(
    [[-105.4, 36.6], [-103.0, 36.6], [-103.0, 38.0], [-104.2, 38.0],
     [-104.2, 40.0], [-105.4, 40.0], [-105.4, 36.6]], dtype="f8"
)


def test_multi_geom_mixed_kinds(spark):
    dg = register_docs_geo(spark, SF)
    polys = [
        (1, [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
        (2, [QUERY_PENTAGON]),
        (3, [L_SHAPE]),  # non-convex -> UDF path
    ]
    out = spatial.spatial_subset_many(spark, dg, DOC_GRID, polys)
    got = {
        u: {r.doc_id for r in rows}
        for u, rows in (
            (u, out.filter(F.col("ugid") == u).collect()) for u in (1, 2, 3)
        )
    }
    # oracle: apply each geometry driver-side with the same kernel
    pts = dg.select("doc_id", "lon", "lat").collect()
    ids = np.array([r.doc_id for r in pts])
    px = np.array([r.lon for r in pts])
    py = np.array([r.lat for r in pts])
    for u, rings in polys:
        mask = G.points_in_polygon(px, py, rings, keep_touches=True)
        assert got[u] == set(ids[mask].tolist()), f"ugid {u}"
    assert got[3]  # L-shape matched something


def test_multi_geom_membership_duplication(spark):
    """A doc inside two overlapping geometries appears once per ugid."""
    dg = register_docs_geo(spark, SF)
    same = [rect_ring(-104.5, 37.5, -102.5, 39.5)]
    out = spatial.spatial_subset_many(spark, dg, DOC_GRID,
                                      [(1, same), (2, same)])
    counts = dict(
        (r.ugid, r.n)
        for r in out.groupBy("ugid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert counts[1] == counts[2] > 0


def test_knn_join_matches_single_point(spark):
    dg = register_docs_geo(spark, SF)
    pts = spark.createDataFrame(
        [(1, -104.0, 38.5), (2, -102.1, 37.0)], "qid int, qlon double, qlat double"
    )
    out = knn.knn_join(pts, dg, DOC_GRID, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    for qid, (qx, qy) in [(1, (-104.0, 38.5)), (2, (-102.1, 37.0))]:
        single = knn.knn_cells(dg, DOC_GRID, qx, qy, k=3).collect()
        got = [(r.cell_y, r.cell_x, r.rank) for r in sorted(by_q[qid], key=lambda r: r.rank)]
        want = [(r.cell_y, r.cell_x, r.rank) for r in single]
        assert got == want, qid


def test_knn_join_expansion_on_sparse_cells(spark):
    """Cells exist only in one corner; far query points force the radius
    doubling loop."""
    cells = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0)], "cell_y int, cell_x int"
    )
    pts = spark.createDataFrame(
        [(1, -101.6, 40.4)], "qid int, qlon double, qlat double"
    )  # opposite corner of the 64x64 grid
    out = knn.knn_join(pts, cells, DOC_GRID, k=2).collect()
    assert len(out) == 2
    assert {(r.cell_y, r.cell_x) for r in out} <= {(0, 0), (0, 1), (1, 0)}


def test_multi_geom_polygon_abstraction_clip(spark):
    """Mixed rect + pentagon multi-geometry CLIP on cell boxes: per-ugid
    areas match the single-geometry operator."""
    dg = register_docs_geo(spark, SF)
    cells = dg.select("cell_y", "cell_x").distinct()
    polys = [
        (1, [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
        (2, [QUERY_PENTAGON]),
    ]
    many = spatial.spatial_subset_many(
        spark, cells, DOC_GRID, polys, abstraction="polygon",
        keep_touches=False,
    )
    for ugid, rings in polys:
        single = spatial.spatial_subset(
            spark, cells, DOC_GRID, rings, operation="clip",
            abstraction="polygon", keep_touches=False,
        )
        got = {(r.cell_y, r.cell_x): r.clip_area
               for r in many.filter(F.col("ugid") == ugid).collect()}
        want = {(r.cell_y, r.cell_x): r.clip_area for r in single.collect()}
        assert set(got) == set(want), ugid
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), (ugid, k)


def test_multi_geom_zranges_phase1_matches_covering(spark):
    """The bounded interval-table phase 1 (zrange_filter_many) and the
    flat covering table produce IDENTICAL final (doc_id, ugid) sets —
    mixed rect/convex/non-convex selections (r4s10)."""
    dg = register_docs_geo(spark, SF)
    polys = [
        (1, [rect_ring(-104.5, 37.5, -102.5, 39.5)]),
        (2, [QUERY_PENTAGON]),
        (3, [L_SHAPE]),
    ]
    base = spatial.spatial_subset_many(
        spark, dg, DOC_GRID, polys, phase1="covering"
    )
    via_z = spatial.spatial_subset_many(
        spark, dg, DOC_GRID, polys, phase1="zranges"
    )
    a = sorted((r.doc_id, r.ugid) for r in base.select("doc_id", "ugid").collect())
    b = sorted((r.doc_id, r.ugid) for r in via_z.select("doc_id", "ugid").collect())
    assert a == b and len(a) > 0


def test_multi_geom_envelope_degrade_past_morton_domain(spark):
    """auto routing on a >16-bit grid with a covering too large to
    broadcast: the per-ugid envelope join degrade — exact results still
    (phase 2 refines), validated against the driver-side kernel (r4s10)."""
    from ocgis_spark.geo.cellindex import GridSpec

    fine = GridSpec(res=4.0 / 100_000, nx=100_000, ny=100_000)
    dg = register_docs_geo(spark, SF)
    # re-encode cells on the fine grid (cell ids unused by the envelope
    # path; lon/lat drive both phases)
    dg = spatial.encode_cells(dg.drop("cell_x", "cell_y", "cell_id"), fine)
    polys = [(1, [QUERY_PENTAGON]), (2, [L_SHAPE])]
    out = spatial.spatial_subset_many(spark, dg, fine, polys)
    got = {
        u: {r.doc_id for r in out.filter(F.col("ugid") == u).collect()}
        for u in (1, 2)
    }
    pts = dg.select("doc_id", "lon", "lat").collect()
    ids = np.array([r.doc_id for r in pts])
    px = np.array([r.lon for r in pts])
    py = np.array([r.lat for r in pts])
    for u, rings in polys:
        mask = G.points_in_polygon(px, py, rings, keep_touches=True)
        assert got[u] == set(ids[mask].tolist()), f"ugid {u}"
    assert got[1] and got[2]


def test_multi_geom_phase1_validation(spark):
    dg = register_docs_geo(spark, SF)
    with pytest.raises(ValueError, match="unknown phase1"):
        spatial.spatial_subset_many(
            spark, dg, DOC_GRID, [(1, [QUERY_PENTAGON])], phase1="zrange"
        )
    with pytest.raises(ValueError, match="polygon-abstraction"):
        spatial.spatial_subset_many(
            spark, dg, DOC_GRID, [(1, [QUERY_PENTAGON])],
            abstraction="polygon", phase1="zranges",
        )
