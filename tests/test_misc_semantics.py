"""Seam split, melted output, mask (NULL) semantics, eval whitelist."""

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID
from ocgis_spark.operators import temporal
from ocgis_spark.operators.calc_registry import validate_eval_expr
from ocgis_spark.operators.crs import split_bbox_at_seam
from ocgis_spark.ops import OcgOperations
from ocgis_spark.request import Field


def test_split_bbox_at_seam():
    # normal box: untouched
    assert split_bbox_at_seam(-10, 0, 10, 5) == [(-10, 0, 10, 5)]
    # crossing the antimeridian (minx > maxx in wrapped coords)
    parts = split_bbox_at_seam(170.0, -5.0, -170.0, 5.0)
    assert parts == [(170.0, -5.0, 180.0, 5.0), (-180.0, -5.0, -170.0, 5.0)]
    widths = sum(p[2] - p[0] for p in parts)
    assert widths == pytest.approx(20.0)


def test_mask_null_semantics(spark):
    """ocgis masked values == SQL NULL: excluded from aggs and counts
    (mask cascade, grid.py:1282-1284 -> WHERE/NULL, SURVEY §1.4)."""
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (1, 3.0), (2, None)], "k int, value double"
    )
    out = {r.k: (r["mean"], r.n) for r in
           temporal.set_functions(df, ["k"]).collect()}
    assert out[1] == (2.0, 2)  # null skipped, sample size 2
    assert out[2][1] == 0


def test_melted_output(spark, golden_cells):
    fld = Field(
        golden_cells.withColumn("lon", F.lit(-105.0) + F.col("cell_x"))
        .withColumn("lat", F.lit(37.0) + F.col("cell_y")),
        {"time": "ts", "x": "lon", "y": "lat", "value": "value"},
        GOLDEN_GRID,
    )
    ops = OcgOperations(dataset=fld, melted=True, grid=GOLDEN_GRID)
    out = ops.execute(spark)
    assert "variable" in out.columns and "value" in out.columns
    assert out.filter(F.col("variable") == "value").count() == 16


def test_eval_whitelist():
    validate_eval_expr("exp(value) + log(2.0)")
    with pytest.raises(ValueError, match="whitelist"):
        validate_eval_expr("reflect('java.lang.Runtime', 'exec')")


def test_360_longitude_wrap_parity(spark):
    """test_360.py analogue: a 0..360 ('unwrapped') document table wrapped
    at ingest yields the same subset as the natively wrapped table."""
    from ocgis_spark.fixtures import DOC_GRID, QUERY_RECT, register_docs_geo, rect_ring
    from ocgis_spark.operators import crs, spatial

    dg = register_docs_geo(spark, "/root/testdata/sf0.001")
    # simulate an unwrapped source: shift into 0..360, then wrap at ingest
    unwrapped = dg.withColumn("lon", crs.unwrap_lon("lon"))
    assert crs.is_wrapped_state(unwrapped) == "unwrapped"
    rewrapped = unwrapped.withColumn("lon", crs.wrap_lon("lon"))
    a = spatial.spatial_subset(
        spark, dg, DOC_GRID, [rect_ring(*QUERY_RECT)], abstraction="point"
    )
    b = spatial.spatial_subset(
        spark, rewrapped, DOC_GRID, [rect_ring(*QUERY_RECT)], abstraction="point"
    )
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_seam_crossing_subset_unwrapped_data(spark):
    """VERDICT r1 #5 / reference test_360.py: selections in wrapped coords
    against 0..360 data — a 180th-meridian-crossing polygon and a
    lon-0-spanning rect must auto-split/unwrap inside spatial_subset."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.geo.cellindex import GridSpec
    from ocgis_spark.operators import crs as C
    from ocgis_spark.operators import spatial

    # unwrapped global-ish grid: 36 cells x 10 deg starting at 0
    g = GridSpec(lon0=0.0, lat0=-90.0, res=10.0, nx=36, ny=18)
    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({
        "pid": np.arange(4000),
        "lon": rng.uniform(0.0, 360.0, 4000),
        "lat": rng.uniform(-90.0, 90.0, 4000),
    })
    df = spatial.encode_cells(spark.createDataFrame(pdf), g)

    # (a) polygon crossing the 180th meridian, given wrapped
    ring = np.array([
        [170.0, -20.0], [-165.0, -20.0], [-165.0, 25.0], [170.0, 25.0],
        [170.0, -20.0],
    ])
    out = spatial.spatial_subset(
        spark, df, g, [ring], operation="intersects", abstraction="point",
        keep_touches=True, data_wrapped_state="unwrapped",
    ).toPandas()
    exp = pdf[(pdf.lon >= 170.0) & (pdf.lon <= 195.0)
              & (pdf.lat >= -20.0) & (pdf.lat <= 25.0)]
    assert sorted(out["pid"]) == sorted(exp["pid"])

    # (b) rect spanning lon 0 (wrapped -15..20) -> split into 2 pieces
    ring2 = np.array([
        [-15.0, 10.0], [20.0, 10.0], [20.0, 40.0], [-15.0, 40.0], [-15.0, 10.0],
    ])
    out2 = spatial.spatial_subset(
        spark, df, g, [ring2], operation="intersects", abstraction="point",
        keep_touches=True, data_wrapped_state="unwrapped",
    ).toPandas()
    exp2 = pdf[((pdf.lon >= 345.0) | (pdf.lon <= 20.0))
               & (pdf.lat >= 10.0) & (pdf.lat <= 40.0)]
    assert sorted(out2["pid"]) == sorted(exp2["pid"])

    # (c) clip across the split: per-cell areas sum across pieces and
    # total equals the rect area (grid covers the whole rect)
    cells = df.select("cell_y", "cell_x").distinct()
    out3 = spatial.spatial_subset(
        spark, cells, g, [ring2], operation="clip", abstraction="polygon",
        keep_touches=False, data_wrapped_state="unwrapped",
    ).toPandas()
    assert out3.groupby(["cell_y", "cell_x"]).size().max() == 1
    assert out3["clip_area"].sum() == pytest.approx(35.0 * 30.0, rel=1e-12)

    # (d) helper-level: pieces are seam-free
    for piece in C.unwrap_rings_pieces([ring2]):
        lons = piece[0][:, 0]
        assert (lons >= 0).all() and (lons <= 360).all()


def test_icclim_registry_tail(spark):
    """Registry carries the ICCLIM tail as compositions; spot-check
    semantics of SDII / ETR / RX1day / percentile family wiring."""
    import pandas as pd

    from ocgis_spark.operators import calc_registry as CR

    names = set(CR.registry())
    for nm in ["icclim_TX90p", "icclim_TX10p", "icclim_TN90p", "icclim_TN10p",
               "icclim_TG90p", "icclim_TG10p", "icclim_ID", "icclim_HD17",
               "icclim_PRCPTOT", "icclim_RR1", "icclim_SDII", "icclim_R10mm",
               "icclim_R20mm", "icclim_RX1day", "icclim_RX5day", "icclim_CSU",
               "icclim_CFD", "icclim_ETR", "icclim_vDTR"]:
        assert nm in names
    assert sum(n.startswith("icclim_") for n in names) >= 25

    df = spark.createDataFrame(pd.DataFrame({
        "g": [1] * 6,
        "value": [0.5, 2.0, 0.0, 12.0, 25.0, 0.9],
        "tasmax": [10.0, 12.0, 9.0, 15.0, 20.0, 11.0],
        "tasmin": [2.0, 3.0, 1.0, 5.0, 8.0, 2.5],
    }))
    sdii = CR.get("icclim_SDII")(df, ["g"]).collect()[0]["SDII"]
    assert sdii == (2.0 + 12.0 + 25.0) / 3  # wet days only
    etr = CR.get("icclim_ETR")(df, ["g"]).collect()[0]["ETR"]
    assert etr == 20.0 - 1.0
    rx1 = CR.get("icclim_RX1day")(df, ["g"]).collect()[0]["RX1day"]
    assert rx1 == 25.0
    prcptot = CR.get("icclim_PRCPTOT")(df, ["g"]).collect()[0]["PRCPTOT"]
    assert prcptot == 39.0
    r10 = CR.get("icclim_R10mm")(df, ["g"]).collect()[0]["R10mm"]
    assert r10 == 2


def test_unwrap_rings_with_holes():
    """Round-3: seam-crossing polygons WITH HOLES split correctly — the
    hole travels with its outer on both the unwrap and split paths, and
    piece areas sum to (outer - hole)."""
    import numpy as np
    from ocgis_spark.geo import geometry as G
    from ocgis_spark.operators import crs as C

    def closed(pts):
        a = np.array(pts, dtype="f8")
        return np.vstack([a, a[:1]])

    # 1) 180-crossing outer [170..-170] with a hole [175..-175]
    outer = closed([[170.0, -10.0], [-170.0, -10.0], [-170.0, 10.0],
                    [170.0, 10.0]])
    hole = closed([[175.0, -5.0], [-175.0, -5.0], [-175.0, 5.0],
                   [175.0, 5.0]])
    pieces = C.unwrap_rings_pieces([outer, hole])
    assert len(pieces) == 1 and len(pieces[0]) == 2
    area = G.polygon_area(pieces[0])
    assert area == pytest.approx(20.0 * 20.0 - 10.0 * 10.0)
    assert (pieces[0][0][:, 0] >= 170.0).all()  # unwrapped to 0..360

    # 2) lon-0-spanning outer [-20..20] with a hole [-10..10]
    outer2 = closed([[-20.0, -10.0], [20.0, -10.0], [20.0, 10.0],
                     [-20.0, 10.0]])
    hole2 = closed([[-10.0, -5.0], [10.0, -5.0], [10.0, 5.0],
                    [-10.0, 5.0]])
    pieces2 = C.unwrap_rings_pieces([outer2, hole2])
    assert len(pieces2) == 2
    total = sum(G.polygon_area(p) for p in pieces2)
    assert total == pytest.approx(40.0 * 20.0 - 20.0 * 10.0)
    # each piece carries its half of the hole
    assert all(len(p) == 2 for p in pieces2)
    # western piece fully shifted into 0..360
    west = [p for p in pieces2 if p[0][:, 0].max() > 180.0][0]
    assert (west[0][:, 0] >= 340.0).all()
    assert (west[1][:, 0] >= 350.0).all()

    # 3) hole entirely on one side of the seam attaches only there
    hole3 = closed([[5.0, -5.0], [15.0, -5.0], [15.0, 5.0], [5.0, 5.0]])
    pieces3 = C.unwrap_rings_pieces([outer2, hole3])
    n_holes = sorted(len(p) - 1 for p in pieces3)
    assert n_holes == [0, 1]
    total3 = sum(G.polygon_area(p) for p in pieces3)
    assert total3 == pytest.approx(40.0 * 20.0 - 10.0 * 10.0)


def test_null_input_semantics_r4_review(spark):
    """Three null-handling regressions from the r4 review, pinned:
    repetition_ratio emits NO row for a NULL-text doc; temperature_mixture
    excludes the NULL stratum from rate computation; chunk_spans charges a
    NULL-text span 0 tokens (size(null) = -1 must not corrupt prefixes)."""
    from pyspark.sql import functions as F

    from ocgis_spark import spans as SP
    from ocgis_spark.operators import sampling, text as T

    rr = T.repetition_ratio(
        spark.createDataFrame([(1, None), (2, "a b a b")],
                              "doc_id long, text string"), n=2)
    assert [r.doc_id for r in rr.collect()] == [2]

    mix = sampling.temperature_mixture(
        spark.createDataFrame(
            [(i, None if i < 3 else "en") for i in range(1003)],
            "doc_id long, lang string"), "lang")
    assert mix.count() == 1000  # 'en' is the only stratum -> keeps all

    ch = SP.chunk_spans(spark.createDataFrame(
        [(1, [("text", None, "", 0), ("text", "w1 w2", "", 5)])],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")).collect()
    assert [r.span_tokens for r in sorted(ch, key=lambda r: r.pos)] == [0, 2]
