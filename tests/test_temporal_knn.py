"""Temporal grouping goldens (seasonal DJF year shift, month repr day 16)
and kNN tie-break/expansion semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ocgis_spark.fixtures import GOLDEN_GRID
from ocgis_spark.operators import knn, temporal, windows


@pytest.fixture(scope="module")
def multi_month(spark):
    """Daily series Nov 2000 .. Feb 2001 (crosses the DJF year boundary)."""
    start = dt.datetime(2000, 11, 1, 12)
    rows = [
        (i, start + dt.timedelta(days=i), float(i % 7))
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "id int, ts timestamp, value double")


def test_seasonal_djf_year_shift(spark, multi_month):
    out = {
        (r.season, r.season_year): r.n
        for r in temporal.group_season(multi_month).collect()
    }
    # Nov 2000 -> SON 2000; Dec 2000 -> DJF 2001 (year-shift); Jan/Feb 2001 -> DJF 2001
    assert out[("SON", 2000)] == 30
    assert out[("DJF", 2001)] == 31 + 31 + 28
    assert ("DJF", 2000) not in out


def test_month_grouping_repr_day16(spark, multi_month):
    out = temporal.group_month(multi_month).collect()
    reprs = {(r.year, r.month): r.repr_time for r in out}
    assert reprs[(2000, 12)] == dt.datetime(2000, 12, 16)
    ns = {(r.year, r.month): r.n for r in out}
    assert ns[(2001, 1)] == 31


def test_time_range_bounds_aware(spark, multi_month):
    """A row whose [lb, ub] interval OVERLAPS the range is kept even when
    its center is outside (Variable.get_between semantics)."""
    b = temporal.with_time_bounds(multi_month, hours=24)
    out = temporal.time_range(b, "2000-11-05 00:00:00", "2000-11-06 00:00:00")
    ids = sorted(r.id for r in out.collect())
    # centers 11-04 12:00 .. 11-06 12:00: their ±24h intervals overlap the
    # range (e.g. id=3's ub 11-05 12:00 >= range lo), id=2's ub is 11-04
    # 12:00 < 11-05 00:00 -> excluded
    assert ids == [3, 4, 5]


def test_knn_golden_tie_break(spark, golden_cells):
    """Point (-104.0, 38.5) is equidistant (0.5°) from 4 cell centroids;
    the reference's argmin takes the first in y-major order -> (1, 1)."""
    out = knn.knn_cells(golden_cells, GOLDEN_GRID, -104.0, 38.5, k=4).collect()
    assert (out[0].cell_y, out[0].cell_x) == (1, 1)
    # (-104.0, 38.5) sits ON centroid column cx=1: two cells at 0.5°, then
    # a 4-way tie at sqrt(1.25) broken by (cell_y, cell_x) ascending
    assert [r.dist for r in out] == pytest.approx([0.5, 0.5, 1.118033988749895,
                                                   1.118033988749895])
    assert [(r.cell_y, r.cell_x) for r in out] == [(1, 1), (2, 1), (1, 0), (1, 2)]


def test_knn_expands_past_sparse_rings(spark):
    """Only 2 cells exist, far from the query point: the ring expansion
    must widen until it finds them."""
    cells = spark.createDataFrame([(3, 3, 1.0), (0, 0, 1.0)],
                                  "cell_y int, cell_x int, value double")
    out = knn.knn_cells(cells, GOLDEN_GRID, -104.9, 37.1, k=2).collect()
    assert len(out) == 2
    assert (out[0].cell_y, out[0].cell_x) == (0, 0)


def test_freezethaw_transitions(spark):
    rows = [(1, dt.datetime(2000, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate([20.0, 20.0, 5.0, 5.0, 5.0, 30.0, 30.0, 1.0])]
    df = spark.createDataFrame(rows, "cell bigint, ts timestamp, value double")
    out = windows.freezethaw(df, "cell", "ts", "value", threshold=15.0).collect()
    # cumulative excursions: +5,+10,0,-10,-20 (flip to -), +-5, +10 (flip to +), -4 (flip to -)
    assert out[0].transitions == 3


def test_knn_join_releases_cells_cache(spark):
    """ADVICE r2: knn_join must unpersist its internal cells relation —
    repeated calls in a long session must not accumulate cached RDDs."""
    from ocgis_spark.fixtures import GOLDEN_GRID
    from ocgis_spark.operators import knn

    cells = spark.createDataFrame(
        [(y, x) for y in range(4) for x in range(4)],
        "cell_y int, cell_x int",
    )
    pts = spark.createDataFrame(
        [(0, -104.1, 38.2), (1, -103.2, 37.1)],
        "qid int, qlon double, qlat double",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = knn.knn_join(pts, cells, GOLDEN_GRID, k=2)
    assert out.count() == 4
    out.unpersist()
    after = jsc.getPersistentRDDs().size()
    assert after <= before + 1  # only the documented result cache at most


def test_knn_join_vector_qcell_bounds_parity(spark):
    """qcell_bounds envelope prefilter must not change results: the cell
    relation is range-filtered to the r-buffered probe envelope before the
    distinct, so the pruned and unpruned plans return identical neighbors."""
    from ocgis_spark.fixtures import VEC_GRID
    from ocgis_spark.operators import knn

    vg = VEC_GRID
    cells = spark.range(vg.nx * vg.ny).select(
        (F.col("id") % vg.nx).cast("int").alias("vcx"),
        F.floor(F.col("id") / vg.nx).cast("int").alias("vcy"),
    # thin the relation so expansion has to grow past r0 for some probes
    ).filter((F.col("vcx") + F.col("vcy")) % 3 != 1)
    xb, yb = vg.xb(), vg.yb()
    qx = float((xb[3] + xb[4]) / 2)
    qy = float((yb[5] + yb[6]) / 2)
    pts = spark.createDataFrame(
        [(0, qx, qy)], "qid int, qlon double, qlat double")
    import numpy as np
    qcy, qcx = vg.cell_of(np.array([qx]), np.array([qy]))
    bounds = (int(qcx[0]), int(qcy[0]), int(qcx[0]), int(qcy[0]))
    base = {(r["vcy"], r["vcx"], r["rank"]): r["dist"]
            for r in knn.knn_join_vector(pts, cells, vg, k=4).collect()}
    pruned = {(r["vcy"], r["vcx"], r["rank"]): r["dist"]
              for r in knn.knn_join_vector(
                  pts, cells, vg, k=4, qcell_bounds=bounds).collect()}
    assert base.keys() == pruned.keys() and len(base) == 4
    for key in base:
        assert pruned[key] == pytest.approx(base[key], rel=1e-12)


def test_knn_join_vector_offgrid_probe_clamped(spark):
    """ADVICE r2: probes beyond the grid edge used to encode to -1 and
    anchor the disk at the wrong corner. They must return the true
    nearest cells (and do so without needing the max_r fallback)."""
    import numpy as np
    from ocgis_spark.fixtures import VEC_GRID
    from ocgis_spark.operators import knn

    vg = VEC_GRID
    cells = spark.range(vg.nx * vg.ny).select(
        (F.col("id") % vg.nx).cast("int").alias("vcx"),
        F.floor(F.col("id") / vg.nx).cast("int").alias("vcy"),
    )
    # four probes beyond each grid edge + one far corner
    xb, yb = vg.xb(), vg.yb()
    probes = [
        (0, float(xb[-1] + 5.0), float((yb[0] + yb[-1]) / 2)),
        (1, float(xb[0] - 5.0), float((yb[0] + yb[-1]) / 2)),
        (2, float((xb[0] + xb[-1]) / 2), float(yb[-1] + 3.0)),
        (3, float(xb[-1] + 4.0), float(yb[-1] + 4.0)),
    ]
    pts = spark.createDataFrame(probes, "qid int, qlon double, qlat double")
    got = knn.knn_join_vector(pts, cells, vg, k=1).collect()
    assert len(got) == 4
    # brute-force truth
    cy, cx = np.meshgrid(np.arange(vg.ny), np.arange(vg.nx), indexing="ij")
    cy, cx = cy.ravel(), cx.ravel()
    lonc = (xb[cx] + xb[cx + 1]) / 2.0
    latc = (yb[cy] + yb[cy + 1]) / 2.0
    for qid, qlon, qlat in probes:
        d = np.sqrt((lonc - qlon) ** 2 + (latc - qlat) ** 2)
        best = float(d.min())
        row = [r for r in got if r["qid"] == qid][0]
        assert row["dist"] == pytest.approx(best, rel=1e-12), f"probe {qid}"


def test_asof_join_semantics(spark):
    """as-of join: most recent right row per key at or before left.ts;
    exact-timestamp matches included; tolerance nulls stale matches."""
    from ocgis_spark.operators import windows as W

    left = spark.createDataFrame(
        [(1, 4.0, "z"), (1, 10.0, "a"), (1, 15.0, "e"), (1, 20.0, "b"),
         (2, 7.0, "c")],
        "k bigint, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100.0), (1, 15.0, 200.0), (3, 1.0, 9.0)],
        "k bigint, ts double, cal double",
    )
    got = {(r["k"], r["ts"]): r["cal"]
           for r in W.asof_join(left, right, "k").collect()}
    assert got == {(1, 4.0): None, (1, 10.0): 100.0, (1, 15.0): 200.0,
                   (1, 20.0): 200.0, (2, 7.0): None}
    # tolerance: a match older than 4 units becomes null
    got2 = {(r["k"], r["ts"]): r["cal"]
            for r in W.asof_join(left, right, "k", tolerance=4.0).collect()}
    assert got2[(1, 20.0)] is None  # 20 - 15 = 5 > 4
    assert got2[(1, 15.0)] == 200.0  # exact match, staleness 0


def test_asof_join_single_exchange(spark):
    """the union-and-carry shape: exactly ONE (non-broadcast) exchange."""
    from ocgis_spark.operators import windows as W

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("ts")
    )
    right = spark.range(10).select(
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 10).cast("double").alias("ts"),
        F.col("id").cast("double").alias("cal"),
    )
    out = W.asof_join(left, right, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_ex <= 2  # union shuffle (+ possible AQE read); no join explosion
    assert "BatchEvalPython" not in plan


def test_interval_join_bucketing(spark):
    """range join: exact membership vs brute force; plan stays an
    equi-join (no cartesian / NestedLoop)."""
    import numpy as np
    from ocgis_spark.operators import windows as W

    rng = np.random.default_rng(5)
    rows = [(int(k), float(t)) for k, t in
            zip(rng.integers(0, 4, 200), rng.uniform(0, 1000, 200))]
    df = spark.createDataFrame(rows, "k bigint, ts double")
    out = W.interval_join(df, df.select("k", "ts"), "k", "ts", -50.0, 50.0)
    got = out.groupBy("k", "ts").count().collect()
    by = {}
    for k, t in rows:
        by.setdefault(k, []).append(t)
    for r in got:
        want = sum(1 for t in by[r["k"]]
                   if r["ts"] - 50.0 <= t <= r["ts"] + 50.0)
        assert r["count"] == want, (r["k"], r["ts"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """independent oracle: pandas merge_asof(by=key) on random data."""
    import numpy as np
    import pandas as pd
    from ocgis_spark.operators import windows as W

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "ts": np.round(rng.uniform(0, 100, 300), 6),
    }).drop_duplicates(["k", "ts"])
    right = pd.DataFrame({
        "k": rng.integers(0, 6, 60),
        "ts": np.round(rng.uniform(0, 100, 60), 6),
        "cal": np.arange(60, dtype="f8"),
    }).drop_duplicates(["k", "ts"])
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="k", direction="backward",
    )
    got_rows = W.asof_join(
        spark.createDataFrame(left, "k bigint, ts double"),
        spark.createDataFrame(right, "k bigint, ts double, cal double"),
        "k",
    ).collect()
    got = {(r["k"], r["ts"]): r["cal"] for r in got_rows}
    for _, row in want.iterrows():
        g = got[(row["k"], row["ts"])]
        if pd.isna(row["cal"]):
            assert g is None, (row["k"], row["ts"])
        else:
            assert g == row["cal"], (row["k"], row["ts"])


def test_knn_eager_parity_uniform_and_vector(spark):
    """eager=True (collect-per-pass, local-relation result) must return
    exactly the lazy plan's neighbors on both grid types, including when
    the disk has to expand past r0 (thinned cell relation)."""
    import numpy as np
    from ocgis_spark.fixtures import VEC_GRID
    from ocgis_spark.operators import knn

    cells = spark.createDataFrame(
        [(y, x) for y in range(6) for x in range(6) if (x + y) % 3 != 1],
        "cell_y int, cell_x int",
    )
    pts = spark.createDataFrame(
        [(0, -104.1, 38.2), (1, -103.2, 37.1), (2, -107.0, 42.0)],
        "qid int, qlon double, qlat double",
    )
    lazy = {(r["qid"], r["cell_y"], r["cell_x"], r["rank"]): r["dist"]
            for r in knn.knn_join(pts, cells, GOLDEN_GRID, k=3).collect()}
    eager = {(r["qid"], r["cell_y"], r["cell_x"], r["rank"]): r["dist"]
             for r in knn.knn_join(
                 pts, cells, GOLDEN_GRID, k=3, eager=True).collect()}
    assert lazy.keys() == eager.keys() and len(lazy) == 9
    for key in lazy:
        assert eager[key] == lazy[key]

    vg = VEC_GRID
    vcells = spark.range(vg.nx * vg.ny).select(
        (F.col("id") % vg.nx).cast("int").alias("vcx"),
        F.floor(F.col("id") / vg.nx).cast("int").alias("vcy"),
    ).filter((F.col("vcx") + F.col("vcy")) % 3 != 1)
    xb, yb = vg.xb(), vg.yb()
    vpts = spark.createDataFrame(
        [(0, float((xb[3] + xb[4]) / 2), float((yb[5] + yb[6]) / 2)),
         (1, float(xb[-1] + 5.0), float((yb[0] + yb[-1]) / 2))],
        "qid int, qlon double, qlat double",
    )
    vlazy = {(r["qid"], r["vcy"], r["vcx"], r["rank"]): r["dist"]
             for r in knn.knn_join_vector(vpts, vcells, vg, k=4).collect()}
    veager = {(r["qid"], r["vcy"], r["vcx"], r["rank"]): r["dist"]
              for r in knn.knn_join_vector(
                  vpts, vcells, vg, k=4, eager=True).collect()}
    assert vlazy.keys() == veager.keys() and len(vlazy) == 8
    for key in vlazy:
        assert veager[key] == vlazy[key]


def test_knn_eager_leaves_no_cache(spark):
    """The eager path must not leave persisted relations behind (the lazy
    path documents one result cache; eager returns a local relation)."""
    from ocgis_spark.operators import knn

    cells = spark.createDataFrame(
        [(y, x) for y in range(4) for x in range(4)],
        "cell_y int, cell_x int",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = knn.knn_cells(cells, GOLDEN_GRID, -104.0, 38.5, k=4)
    assert out.count() == 4
    after = jsc.getPersistentRDDs().size()
    assert after == before


# ---------------------------------------------------------------------------
# Arbitrary seasonal month-sets + 'year'/'unique' flags (r4; reference
# calc_grouping seasonal path, variable/temporal.py:467-597, 661-692)
# ---------------------------------------------------------------------------


def _monthly_df(spark, years=(2000, 2001, 2002)):
    # one row per (year, month), value = month number
    rows = [
        (f"{y}-{m:02d}-15 00:00:00", float(m))
        for y in years for m in range(1, 13)
    ]
    return spark.createDataFrame(rows, "ts string, value double").select(
        F.to_timestamp("ts").alias("ts"), "value"
    )


def test_custom_seasons_pooled_across_years(spark):
    out = {
        r["season"]: (r["n"], r["mean_value"])
        for r in temporal.group_custom_seasons(
            _monthly_df(spark), [[1, 2, 3], [4, 5, 6]], year_flag=None
        ).collect()
    }
    # plain seasonal grouping pools every year (temporal.py:552-570)
    assert out["1-2-3"] == (9, pytest.approx(2.0))
    assert out["4-5-6"] == (9, pytest.approx(5.0))


def test_custom_seasons_year_flag_is_calendar_year(spark):
    # the reference 'year' flag matches rows on their OWN calendar year —
    # no Dec→Jan shift (temporal.py:556-563): Dec-2000 groups with
    # Jan/Feb-2000, not 2001
    out = {
        (r["season"], r["season_year"]): r["n"]
        for r in temporal.group_custom_seasons(
            _monthly_df(spark), [[12, 1, 2]], year_flag="year"
        ).collect()
    }
    assert out[("DJF", 2000)] == 3 and out[("DJF", 2002)] == 3


def test_custom_seasons_unique_interannual_split(spark):
    # 'unique': Dec-Y + Jan/Feb-(Y+1) keyed by start year Y
    # (get_time_regions split, temporal.py:1028-1049); boundary seasons
    # missing a month are dropped (start-1999 lacks Dec-1999, start-2002
    # lacks Jan/Feb-2003)
    out = {
        (r["season"], r["season_year"]): r["n"]
        for r in temporal.group_custom_seasons(
            _monthly_df(spark), [[12, 1, 2]], year_flag="unique"
        ).collect()
    }
    assert set(out) == {("DJF", 2000), ("DJF", 2001)}
    assert all(n == 3 for n in out.values())


def test_custom_seasons_non_canonical_with_unique(spark):
    # [[11,12,1],[2,3,4]]: first set interannual (head run = [1]),
    # second plain — plain sets keep every (season, year) pair
    out = {
        (r["season"], r["season_year"]): r["n"]
        for r in temporal.group_custom_seasons(
            _monthly_df(spark), [[11, 12, 1], [2, 3, 4]],
            year_flag="unique",
        ).collect()
    }
    assert out[("11-12-1", 2000)] == 3  # Nov,Dec-2000 + Jan-2001
    assert ("11-12-1", 1999) not in out  # Jan-2000 alone: incomplete
    assert ("11-12-1", 2002) not in out  # Nov,Dec-2002 alone: incomplete
    assert out[("2-3-4", 2000)] == 3 and out[("2-3-4", 2002)] == 3


def test_custom_seasons_sorted_seasons_golden():
    # get_sorted_seasons doctest golden (temporal.py:981-1005): sorting
    # by max month orders [[9,10,11],[12,1,2],[6,7,8]] as JJA, SON, DJF;
    # our labels are order-independent, so assert the label mapping the
    # reference's sort relies on
    assert temporal.season_label_of([9, 10, 11]) == "SON"
    assert temporal.season_label_of([12, 1, 2]) == "DJF"
    assert temporal.season_label_of([6, 7, 8]) == "JJA"
    assert temporal.is_interannual([12, 1, 2]) and not temporal.is_interannual(
        [9, 10, 11]
    )
    # interannual split golden (temporal.py:1038-1049): [11,12,1,2] →
    # year-Y months [11,12], year-Y+1 months [1,2]
    assert temporal._head_months([11, 12, 1, 2]) == [1, 2]


def test_custom_seasons_validation():
    with pytest.raises(ValueError, match="more than one"):
        temporal._validate_month_sets([[1, 2], [2, 3]])
    with pytest.raises(ValueError, match="outside"):
        temporal._validate_month_sets([[0, 1]])


def test_facade_custom_seasons_unique(spark):
    from ocgis_spark.ops import DefinitionValidationError, OcgOperations
    from ocgis_spark.request import Field

    df = _monthly_df(spark)
    field = Field(df=df, dimension_map={"time": "ts"})
    out = OcgOperations(
        dataset=field,
        calc=[{"func": "mean", "name": "mean"}],
        calc_grouping=[[12, 1, 2], "unique"],
    ).execute(spark)
    got = {
        (r["season"], r["season_year"]): r["mean"] for r in out.collect()
    }
    assert set(got) == {("DJF", 2000), ("DJF", 2001)}
    assert got[("DJF", 2000)] == pytest.approx((12.0 + 1.0 + 2.0) / 3)
    with pytest.raises(DefinitionValidationError, match="invalid"):
        OcgOperations(
            dataset=field, calc=[{"func": "mean", "name": "mean"}],
            calc_grouping=[[1, 2, 3], "bogus"],
        ).execute(spark)


def test_interval_join_asymmetric_window(spark):
    """lo/hi need not be symmetric or straddle zero: [ts+10, ts+50] —
    the bucket math must still cap explode fan-out at 2 buckets/row."""
    import numpy as np
    from ocgis_spark.operators import windows as W

    rng = np.random.default_rng(9)
    rows = [(int(k), float(t)) for k, t in
            zip(rng.integers(0, 3, 150), rng.uniform(0, 500, 150))]
    df = spark.createDataFrame(rows, "k bigint, ts double")
    out = W.interval_join(df, df.select("k", "ts"), "k", "ts", 10.0, 50.0)
    got = {(r["k"], r["ts"]): r["count"]
           for r in out.groupBy("k", "ts").count().collect()}
    by = {}
    for k, t in rows:
        by.setdefault(k, []).append(t)
    for k, t in rows:
        want = sum(1 for u in by[k] if t + 10.0 <= u <= t + 50.0)
        assert got.get((k, t), 0) == want, (k, t)


def _hav_ref(lon1, lat1, lon2, lat2, R=6370997.0):
    import math as m
    s1 = m.sin(m.radians(lat2 - lat1) / 2)
    s2 = m.sin(m.radians(lon2 - lon1) / 2)
    h = s1 * s1 + m.cos(m.radians(lat1)) * m.cos(m.radians(lat2)) * s2 * s2
    return 2 * R * m.asin(m.sqrt(min(1.0, h)))


def test_radius_join_brute_force_and_seam(spark):
    """radius_join == brute-force haversine on every (query, point)
    pair, including a query whose disk window crosses the ±180° seam
    (the split intervals must still find the across-seam points)."""
    from ocgis_spark.operators.knn import radius_join

    pts = [
        (1, -179.95, 10.0),   # across the seam from query 9
        (2, 179.90, 10.1),    # same side as query 9
        (3, 170.0, 10.0),     # too far
        (4, -104.0, 38.0),
        (5, -104.3, 38.2),
        (6, -103.0, 45.0),
        (7, 0.0, 0.0),
    ]
    df = spark.createDataFrame(pts, "doc_id int, lon double, lat double")
    queries = [(9, 179.98, 10.0), (10, -104.1, 38.1)]
    r = 60000.0  # 60 km
    got = {(row.qid, row.doc_id)
           for row in radius_join(df, queries, r).collect()}
    want = {
        (qi, pid)
        for qi, qlon, qlat in queries
        for pid, plon, plat in pts
        if round(_hav_ref(qlon, qlat, plon, plat), 3) <= r
    }
    assert got == want
    assert (9, 1) in got            # the across-seam hit was found
    # distances match the reference formula at millimeter rounding
    for row in radius_join(df, queries, r).collect():
        q = dict((q[0], q) for q in queries)[row.qid]
        assert row.dist_m == pytest.approx(
            round(_hav_ref(q[1], q[2], row.lon, row.lat), 3), abs=1e-3)

    plan = (
        radius_join(df, queries, r)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # interval table broadcast
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffled


def test_knn_geodesic_matches_brute_force(spark):
    """knn_geodesic == brute-force haversine ranking, including a query
    whose first disks are empty (multi-round doubling) and a k larger
    than the candidate count (half-circumference sweep returns what
    exists)."""
    from ocgis_spark.operators.knn import knn_geodesic

    pts = [(i, -100.0 + (i * 7 % 23) * 0.8, 30.0 + (i * 11 % 17) * 0.7)
           for i in range(40)]
    df = spark.createDataFrame(pts, "doc_id int, lon double, lat double")
    queries = [(1, -95.0, 35.0), (2, 60.0, -10.0)]  # q2 is ~13000 km away
    got = sorted(
        ((r.qid, r.rank, r.doc_id) for r in
         knn_geodesic(df, queries, k=4, r0_m=2000.0).collect())
    )
    want = []
    for qi, qlon, qlat in queries:
        ranked = sorted(
            (round(_hav_ref(qlon, qlat, plon, plat), 3), pid)
            for pid, plon, plat in pts
        )
        want.extend((qi, rk + 1, pid) for rk, (_, pid) in
                    enumerate(ranked[:4]))
    assert got == sorted(want)

    # k exceeding the row count: the capped sweep returns every row once
    tiny = spark.createDataFrame(pts[:3], "doc_id int, lon double, lat double")
    rows = knn_geodesic(tiny, [(9, 0.0, 0.0)], k=10).collect()
    assert sorted(r.rank for r in rows) == [1, 2, 3]

    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        knn_geodesic(df, queries, k=0)
    with _pt.raises(ValueError, match="non-empty"):
        knn_geodesic(df, [], k=3)


def test_radius_join_boundary_rounding_slack(spark):
    """A point whose TRUE distance is just past r but whose rounded-mm
    distance is <= r must be kept: the keep rule is round(d,3) <= r, so
    the phase-1 window is widened by the rounding grain (r4s14 review —
    a tangent-tight window silently dropped this row while the
    no-window oracle kept it)."""
    import math as m

    from ocgis_spark.operators.crs import R_SPHERE
    from ocgis_spark.operators.knn import radius_join

    r = 35000.0
    # due-north point at ground distance r + 0.4 mm (rounds to r)
    dlat = m.degrees((r + 0.0004) / R_SPHERE)
    df = spark.createDataFrame(
        [(1, 0.0, dlat)], "doc_id int, lon double, lat double"
    )
    got = radius_join(df, [(7, 0.0, 0.0)], r).collect()
    assert len(got) == 1 and got[0].dist_m == 35000.0


def test_knn_geodesic_r0_validation(spark):
    from ocgis_spark.operators.knn import knn_geodesic

    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "doc_id int, lon double, lat double")
    import pytest as _pt
    with _pt.raises(ValueError, match="r0_m"):
        knn_geodesic(df, [(1, 0.0, 0.0)], k=1, r0_m=0.0)
    with _pt.raises(ValueError, match="r0_m"):
        knn_geodesic(df, [(1, 0.0, 0.0)], k=1, r0_m=-5.0)


def test_disk_window_contains_geodesic_disk_property():
    """Hypothesis: for random query lat/lon, radius, bearing, and
    fraction, the great-circle destination at distance f·r lies inside
    the union of _disk_windows intervals — phase 1 can never exclude a
    true within-radius point."""
    import math as m

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocgis_spark.operators.crs import R_SPHERE
    from ocgis_spark.operators.knn import _disk_windows

    def dest(qlon, qlat, bearing_deg, dist_m):
        # great-circle destination on the sphere
        d = dist_m / R_SPHERE
        th = m.radians(bearing_deg)
        p1 = m.radians(qlat)
        l1 = m.radians(qlon)
        p2 = m.asin(m.sin(p1) * m.cos(d)
                    + m.cos(p1) * m.sin(d) * m.cos(th))
        l2 = l1 + m.atan2(m.sin(th) * m.sin(d) * m.cos(p1),
                          m.cos(d) - m.sin(p1) * m.sin(p2))
        lon = m.degrees(l2)
        lon = ((lon + 180.0) % 360.0) - 180.0   # normalize to [-180, 180)
        return lon, m.degrees(p2)

    @settings(max_examples=300, deadline=None)
    @given(
        qlon=st.floats(-180.0, 180.0),
        qlat=st.floats(-85.0, 85.0),
        r=st.floats(1e3, 6e6),
        bearing=st.floats(0.0, 360.0),
        frac=st.floats(0.0, 1.0),
    )
    def check(qlon, qlat, r, bearing, frac):
        plon, plat = dest(qlon, qlat, bearing, frac * r)
        wins = _disk_windows([(1, qlon, qlat)], r)
        inside = any(
            la0 <= plat <= la1 and lo0 <= plon <= lo1
            for (_, _, _, la0, la1, lo0, lo1) in wins
        )
        assert inside, (qlon, qlat, r, bearing, frac, plon, plat, wins)

    check()


def test_radius_join_on_stream_matches_batch(spark, tmp_path):
    """Streaming geodesic fence: radius_join is stateless (narrow
    prefilter + stream-static broadcast interval join), so continuous
    ingest admits the identical set. Stream results == batch results."""
    import numpy as np
    import pandas as pd

    from ocgis_spark.operators.knn import radius_join

    n = 1500
    rng = np.random.default_rng(7)
    pts = pd.DataFrame({
        "pid": np.arange(n),
        "lon": rng.uniform(-106.0, -101.0, n),
        "lat": rng.uniform(36.0, 41.0, n),
    })
    src = str(tmp_path / "pts_in")
    spark.createDataFrame(pts).repartition(4).write.parquet(src)
    queries = [(1, -104.2, 38.1), (2, -102.4, 39.7)]

    batch = radius_join(spark.read.parquet(src), queries, 50000.0)
    expected = sorted((r.qid, r.pid) for r in batch.collect())

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    fenced = radius_join(stream, queries, 50000.0)
    assert fenced.isStreaming
    q = (
        fenced.select("qid", "pid").writeStream.format("memory")
        .queryName("radius_fence_t").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckr"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r.qid, r.pid)
        for r in spark.sql("SELECT * FROM radius_fence_t").collect()
    )
    assert got == expected and len(got) > 0
