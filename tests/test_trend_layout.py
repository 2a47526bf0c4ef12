"""Trend/anomaly calcs, Z-order layout, and deterministic corpus shuffle."""

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocgis_spark.operators import layout, sampling, trend


def _ref_spread(x: int) -> int:
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _ref_morton(x: int, y: int) -> int:
    return _ref_spread(x) | (_ref_spread(y) << 1)


# ---- trend / anomaly ----


def test_trend_slope_matches_polyfit(spark):
    rng = np.random.default_rng(7)
    rows = []
    for key in range(5):
        xs = rng.integers(0, 40, size=30)
        ys = 0.5 * key * xs + rng.normal(0, 1, size=30)
        rows += [(key, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "k int, x double, y double")
    got = {
        r["k"]: (r["slope"], r["intercept"], r["n_obs"])
        for r in trend.trend_slope(df, ["k"], "x", "y").collect()
    }
    for key in range(5):
        pts = [(x, y) for k, x, y in rows if k == key]
        slope, intercept = np.polyfit([p[0] for p in pts], [p[1] for p in pts], 1)
        assert got[key][0] == pytest.approx(slope, abs=1e-5)
        assert got[key][1] == pytest.approx(intercept, abs=1e-5)
        assert got[key][2] == 30


def test_trend_slope_degenerate_x_is_null(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 5.0), (1, 2.0, 7.0)], "k int, x double, y double"
    )
    row = trend.trend_slope(df, ["k"], "x", "y").collect()[0]
    assert row["slope"] is None


def test_anomaly_matches_pandas(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), int(rng.integers(0, 3)), int(rng.integers(0, 4)), float(rng.normal(50, 10)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "row_id int, k int, grp int, v double")
    out = trend.anomaly(df, ["k"], "grp", "v").collect()
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["row_id", "k", "grp", "v"])
    clim = pdf.groupby(["k", "grp"])["v"].transform("mean")
    expect = dict(zip(pdf["row_id"], pdf["v"] - clim))
    for r in out:
        assert r["anom"] == pytest.approx(expect[r["row_id"]], abs=1e-5)


def test_trend_calc_registered_centers_timestamps(spark):
    from ocgis_spark.operators import calc_registry as CR

    rows = []
    for day in range(20):
        # value = 2*day + 5 exactly; ts at absolute 2024 dates
        rows.append((1, f"2024-01-{day + 1:02d} 12:00:00", float(2 * day + 5)))
    df = spark.createDataFrame(rows, "k int, ts_s string, value double").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = CR.get("trend")(df, ["k"]).collect()[0]
    assert out["slope"] == pytest.approx(2.0, abs=1e-9)
    # intercept is relative to the key's FIRST day (centered x)
    assert out["intercept"] == pytest.approx(5.0, abs=1e-9)
    anom = CR.get("anomaly")(df, ["k"]).collect()
    assert all(abs(r["clim"] - 24.0) < 1e-9 for r in anom)  # single month


# ---- Z-order layout ----


def test_morton_key_spark_matches_reference(spark):
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    got = df.select("x", "y", layout.morton_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == _ref_morton(r["x"], r["y"])


def test_morton_key_16bit_extremes(spark):
    vals = [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (0xABCD, 0x1234)]
    df = spark.createDataFrame(vals, "x int, y int")
    for r in df.select("x", "y", layout.morton_key(F.col("x"), F.col("y")).alias("z")).collect():
        assert r["z"] == _ref_morton(r["x"], r["y"])


def _file_key_ranges(spark, path):
    """Per-parquet-file [min, max] of the recomputed Morton key."""
    df = spark.read.parquet(path).withColumn(
        "_z", layout.morton_key(F.col("cell_x"), F.col("cell_y"))
    ).withColumn("_f", F.input_file_name())
    return [
        (r["mn"], r["mx"])
        for r in df.groupBy("_f").agg(F.min("_z").alias("mn"), F.max("_z").alias("mx")).collect()
    ]


def test_zorder_write_prunes_bbox_to_few_files(spark, tmp_path):
    # 64x64 grid of cells, several rows per cell
    df = spark.range(16384).select(
        (F.col("id") % 4096).alias("cid"),
        (F.col("id") % 64).cast("int").alias("cell_x"),
        ((F.col("id") % 4096) / 64).cast("int").alias("cell_y"),
    )
    zpath = str(tmp_path / "zsorted")
    layout.zorder_write(df, zpath, num_files=16)

    ranges = sorted(_file_key_ranges(spark, zpath))
    assert len(ranges) == 16
    # range partitioning => file key intervals must not overlap
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi <= lo2

    # an 8x8 bbox covers a handful of Z-runs -> few candidate files
    keys = {_ref_morton(x, y) for x in range(8, 16) for y in range(8, 16)}
    klo, khi = min(keys), max(keys)
    touched = sum(1 for lo, hi in ranges if not (hi < klo or lo > khi))

    # same data written unordered: almost every file intersects the bbox range
    upath = str(tmp_path / "unordered")
    df.repartition(16).write.parquet(upath)
    uranges = _file_key_ranges(spark, upath)
    utouched = sum(1 for lo, hi in uranges if not (hi < klo or lo > khi))

    assert utouched == 16
    assert touched <= 4


def test_morton_ranges_exact_cover():
    # with an unbounded budget the ranges cover EXACTLY the bbox cells
    for bbox in [(3, 11, 5, 14), (0, 0, 0, 0), (0, 31, 7, 7), (10, 20, 10, 20)]:
        x0, x1, y0, y1 = bbox
        ranges = layout.morton_ranges(x0, x1, y0, y1, bits=6, max_ranges=10**9)
        covered = set()
        for lo, hi in ranges:
            covered.update(range(lo, hi + 1))
        expect = {_ref_morton(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)}
        assert covered == expect


def test_morton_ranges_coarsen_is_superset():
    x0, x1, y0, y1 = 3, 27, 5, 21
    exact = layout.morton_ranges(x0, x1, y0, y1, bits=6, max_ranges=10**9)
    coarse = layout.morton_ranges(x0, x1, y0, y1, bits=6, max_ranges=4)
    assert len(coarse) <= 4
    exact_keys = {k for lo, hi in exact for k in range(lo, hi + 1)}
    coarse_keys = {k for lo, hi in coarse for k in range(lo, hi + 1)}
    assert exact_keys <= coarse_keys


def test_bbox_scan_zordered_parity_and_pushdown(spark, tmp_path):
    df = spark.range(16384).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 64).cast("int").alias("cell_x"),
        ((F.col("id") % 4096) / 64).cast("int").alias("cell_y"),
    )
    path = str(tmp_path / "zlayout")
    layout.zorder_write(df, path, num_files=16)

    got = layout.bbox_scan_zordered(spark, path, 8, 15, 8, 15)
    expect = spark.read.parquet(path).filter(
        F.col("cell_x").between(8, 15) & F.col("cell_y").between(8, 15)
    )
    assert sorted(r["row_id"] for r in got.collect()) == sorted(
        r["row_id"] for r in expect.collect()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "zkey" in plan


# ---- deterministic corpus shuffle ----


def test_shuffle_corpus_total_order_and_content(spark, tmp_path):
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = sampling.shuffle_corpus(df, num_files=8)
    path = str(tmp_path / "shuffled")
    out.write.parquet(path)

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 8
    import pandas as pd
    import pyarrow.parquet as pq

    seen = []
    prev_max = None
    for f in files:
        pdf = pq.read_table(f).to_pandas()
        ks = [
            (d * sampling.HASH_MULT % sampling.HASH_MOD, d) for d in pdf["doc_id"]
        ]
        assert ks == sorted(ks)  # sorted within the file
        if ks:
            if prev_max is not None:
                assert prev_max <= ks[0]  # files are globally ordered
            prev_max = ks[-1]
        seen += list(pdf["doc_id"])
    assert sorted(seen) == list(range(5000))  # a permutation, nothing lost
    # it IS a shuffle: the concatenated order differs from insertion order
    assert seen != list(range(5000))


def test_morton_key_checked_rejects_out_of_domain(spark):
    import pytest as _pt

    bad = spark.createDataFrame([(70000, 3)], "x int, y int").select(
        layout.morton_key_checked(F.col("x"), F.col("y")).alias("z")
    )
    with _pt.raises(Exception, match="65535"):
        bad.collect()
    neg = spark.createDataFrame([(3, -1)], "x int, y int").select(
        layout.morton_key_checked(F.col("x"), F.col("y")).alias("z")
    )
    with _pt.raises(Exception, match="65535"):
        neg.collect()
    ok = spark.createDataFrame([(65535, 0), (0, 65535)], "x int, y int").select(
        "x", "y", layout.morton_key_checked(F.col("x"), F.col("y")).alias("z")
    )
    for r in ok.collect():
        assert r["z"] == _ref_morton(r["x"], r["y"])


def test_tile_pyramid_conservation_and_parents(spark):
    """Every pyramid level conserves the doc count and the value sum;
    each tile is the exact merge of its four (or fewer) children; zkey
    is the tile's own-level Morton key; depth<0 rejected."""
    import pytest

    from ocgis_spark.operators import layout

    rows = [
        # (cell_x, cell_y, v) — an uneven spread incl. a hot cell
        (0, 0, 1.0), (0, 0, 2.0), (1, 0, 4.0), (3, 2, 8.0),
        (5, 5, 16.0), (5, 4, 32.0), (2, 3, 64.0), (7, 7, 128.0),
    ]
    df = spark.createDataFrame(rows, "cell_x int, cell_y int, v double")
    out = layout.tile_pyramid(df, depth=3, value="v").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    assert sorted(by_level) == [0, 1, 2, 3]
    for lvl, tiles in by_level.items():
        assert sum(t.n_docs for t in tiles) == len(rows)
        assert sum(t.value_sum for t in tiles) == 255.0
        for t in tiles:
            assert t.zkey == _morton_ref(t.px, t.py)
    # parent/child: every level-d tile equals the merge of its children
    for d in (1, 2, 3):
        kids = {}
        for c in by_level[d - 1]:
            kids.setdefault((c.px // 2, c.py // 2), [0, 0.0])
            kids[(c.px // 2, c.py // 2)][0] += c.n_docs
            kids[(c.px // 2, c.py // 2)][1] += c.value_sum
        assert {(t.px, t.py): [t.n_docs, t.value_sum]
                for t in by_level[d]} == kids
    # level 3 of an 8x8 extent is the single root tile
    assert len(by_level[3]) == 1 and by_level[3][0].px == 0

    plan = (
        layout.tile_pyramid(df, depth=3, value="v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one corpus shuffle (level 0) + one bounded shuffle per level
    assert plan.count("Exchange hashpartitioning") <= 4

    with pytest.raises(ValueError, match="depth"):
        layout.tile_pyramid(df, depth=-1)


def _morton_ref(x, y):
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return out


def test_build_layout_job_with_pyramid(spark, tmp_path, monkeypatch):
    """jobs/build_layout.py end-to-end in-process: Z-ordered layout +
    probe readback + the --pyramid-depth rollup sink (partitioned by
    level, Z-sorted within each, doc counts conserved per level)."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "build_layout",
        os.path.join(os.path.dirname(__file__), "..", "jobs",
                     "build_layout.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    out = str(tmp_path / "zlake")
    monkeypatch.setattr(sys, "argv", [
        "build_layout.py", "--input", "/root/testdata/sf0.001",
        "--output", out, "--files", "4", "--probe-bbox", "2,9,2,9",
        "--pyramid-depth", "3",
    ])
    # the job calls spark.stop() — neuter it so the shared pytest
    # session survives
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    job.main()

    base = spark.read.parquet(out)
    n = base.count()
    assert n > 0 and "zkey" in base.columns

    pyr = spark.read.parquet(out + "_pyramid")
    per_level = {
        r["level"]: r["s"] for r in
        pyr.groupBy("level").agg(F.sum("n_docs").alias("s")).collect()
    }
    assert sorted(per_level) == [0, 1, 2, 3]
    assert set(per_level.values()) == {n}   # conservation at every level


def test_tile_pyramid_distinct_levels_and_accuracy(spark):
    """HLL pyramid: every level's estimate equals the DIRECT sketch of
    the corpus re-gridded at that level (bottom-up register max is
    lossless), the estimate tracks the exact distinct count within HLL
    error, string values hash (the md5-slice path), and the plan stays
    JVM-side with a bounded exchange count."""
    import pytest

    from ocgis_spark.operators import layout, sketch

    # 40 cells x up to 13 string sources each, uneven spread
    rows = []
    for i in range(40):
        for j in range(1 + (i * 7) % 13):
            rows.append((i % 8, i // 8, f"src{(i * j + j) % 17}"))
    df = spark.createDataFrame(rows, "cell_x int, cell_y int, source string")

    pyr = layout.tile_pyramid_distinct(df, depth=3, value="source")
    got = {(r.level, r.px, r.py): r.est_distinct for r in pyr.collect()}
    assert sorted({k[0] for k in got}) == [0, 1, 2, 3]

    vexpr = (f"({sketch.md5_slice_int_sql('CAST(source AS STRING)', 0)}"
             f" % {sketch.H_MOD})")
    for lvl in range(4):
        regrid = df.selectExpr(
            f"CAST(floor(cell_x / {2 ** lvl}) AS BIGINT) AS px",
            f"CAST(floor(cell_y / {2 ** lvl}) AS BIGINT) AS py",
            "source",
        )
        direct = sketch.hll_estimate(
            sketch.hll_sketch(regrid, ["px", "py"], vexpr), ["px", "py"]
        )
        want = {(lvl, r.px, r.py): r.est_distinct for r in direct.collect()}
        assert {k: v for k, v in got.items() if k[0] == lvl} == want
        exact = {
            (lvl, r.px, r.py): r.n for r in regrid.groupBy("px", "py")
            .agg(F.countDistinct("source").alias("n")).collect()
        }
        for k, n in exact.items():
            assert abs(got[k] - n) <= max(2.0, 0.15 * n), (k, got[k], n)

    plan = (
        layout.tile_pyramid_distinct(df, depth=3, value="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # corpus->base registers, level merge, estimate agg: 3 shuffles max
    assert plan.count("Exchange hashpartitioning") <= 3

    with pytest.raises(ValueError, match="depth"):
        layout.tile_pyramid_distinct(df, depth=-1, value="source")


# ---- geohash ----

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection geohash (lon bit first from the MSB)."""
    idx, bit, even, out = 0, 0, True, []
    lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
    while len(out) < precision:
        interval, v = (lon_i, lon) if even else (lat_i, lat)
        mid = (interval[0] + interval[1]) / 2
        if v >= mid:
            idx, interval[0] = idx * 2 + 1, mid
        else:
            idx, interval[1] = idx * 2, mid
        even, bit = not even, bit + 1
        if bit == 5:
            out.append(_GH32[idx])
            idx, bit = 0, 0
    return "".join(out)


def test_geohash_matches_textbook_bisection(spark):
    rng = np.random.default_rng(11)
    pts = [(float(la), float(lo)) for la, lo in zip(
        rng.uniform(-90, 90, 60), rng.uniform(-180, 180, 60))]
    pts += [(0.0, 0.0), (51.5074, -0.1278), (-33.8688, 151.2093),
            (89.999999, 179.999999), (-89.999999, -179.999999)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (2, 4, 6):
        df = layout.geohash_encode(df, p, out=f"gh{p}")
    for r in df.collect():
        for p in (2, 4, 6):
            assert r[f"gh{p}"] == _ref_geohash(r["lat"], r["lon"], p), (
                r["lat"], r["lon"], p)


def test_geohash_prefix_consistent_and_edge_clamped(spark):
    rng = np.random.default_rng(13)
    pts = [(float(la), float(lo)) for la, lo in zip(
        rng.uniform(-90, 90, 40), rng.uniform(-180, 180, 40))]
    # out-of-range inputs clamp into the edge cells instead of overflowing
    pts += [(90.0, 180.0), (91.0, 181.0), (-90.0, -180.0), (-95.0, -200.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (2, 4, 6):
        df = layout.geohash_encode(df, p, out=f"gh{p}")
    for r in df.collect():
        assert r["gh6"][:4] == r["gh4"] and r["gh4"][:2] == r["gh2"]
        assert all(c in _GH32 for c in r["gh6"])
    top = df.where("lat >= 90").select("gh6").distinct().collect()
    assert [r["gh6"] for r in top] == ["zzzzzz"]


def test_geohash_rejects_unsupported_precision():
    for p in (1, 3, 5, 7, 8, 0, -2):
        with pytest.raises(ValueError, match="precision"):
            layout.geohash_sql("lon", "lat", p)


def test_geohash_decode_roundtrip_and_containment(spark):
    rng = np.random.default_rng(17)
    pts = [(float(la), float(lo)) for la, lo in zip(
        rng.uniform(-90, 90, 50), rng.uniform(-180, 180, 50))]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (2, 4, 6):
        n = 5 * p // 2
        out = layout.geohash_decode(
            layout.geohash_encode(df, p, out="gh"), p, gh="gh",
            fields=("lon_lo", "lon_hi", "lat_lo", "lat_hi",
                    "lon_c", "lat_c"),
        )
        out = out.withColumn(
            "gh2", F.expr(layout.geohash_sql("lon_c", "lat_c", p)))
        for r in out.collect():
            # original point inside the decoded cell
            assert r["lon_lo"] <= r["lon"] < r["lon_hi"]
            assert r["lat_lo"] <= r["lat"] < r["lat_hi"]
            # cell dimensions exactly dyadic
            assert r["lon_hi"] - r["lon_lo"] == 360.0 / (1 << n)
            assert r["lat_hi"] - r["lat_lo"] == 180.0 / (1 << n)
            # centre re-encodes to the SAME geohash (round trip)
            assert r["gh2"] == r["gh"]


def test_geohash_decode_rejects_unsupported_precision():
    with pytest.raises(ValueError, match="precision"):
        layout.geohash_decode_sql("gh", 3)
