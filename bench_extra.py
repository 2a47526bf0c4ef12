#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): noop-sink timing of individual
suite queries, with job descriptions (§1.5), optional plan dumps and an
optional live UI for stage-level metrics. ``bench.py`` is FROZEN for
measurement; every number quoted in OPTIMIZATION_r06.md that is not a
full-suite total comes from this file.

Usage:
  python bench_extra.py --list
  python bench_extra.py pii_scan_scaled autocorr_p_scaled --reps 5
  python bench_extra.py knn_point --explain plans/r06 --suffix before
  python bench_extra.py mobility_dwell_od --ui     # UI at :4040 while held
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from ocgis_spark import fixtures as FX  # noqa: E402
from ocgis_spark import spans as SP  # noqa: E402
from ocgis_spark.fixtures import DOC_GRID  # noqa: E402
from ocgis_spark.operators import (  # noqa: E402
    dedup, gridstats, knn, regrid as regrid_ops, similarity, spatial,
    temporal, tiling, trajectory, urls, windows,
)
from ocgis_spark.operators import crs as crs_ops  # noqa: E402
from ocgis_spark.operators import text as textops  # noqa: E402
from ocgis_spark.operators import vectorgrid as vg_ops  # noqa: E402
from ocgis_spark.session import get_spark  # noqa: E402


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


class Ctx:
    """Lazily-built shared inputs, identical to bench.py's setup."""

    def __init__(self, spark, sf_dir):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dg = None
        self._ev = None
        self._docs = None
        self._idx = None

    @property
    def dg(self):
        if self._dg is None:
            repl = int(os.environ.get("SPARK_GRAFT_REPL", "400"))
            docs = self.spark.read.parquet(f"{self.sf_dir}/documents.parquet")
            n = docs.count()
            copies = self.spark.range(repl).withColumnRenamed("id", "copy")
            scaled = (
                copies.crossJoin(F.broadcast(docs))
                .withColumn("doc_id", F.col("doc_id") + F.col("copy") * F.lit(n))
                .drop("copy")
            )
            scaled.createOrReplaceTempView("documents")
            dg = self.spark.sql(FX.docs_geo_sql())
            self._dg = SP.with_spans(dg).persist()
            _materialize(self._dg)
            self.n_docs = n * repl
        return self._dg

    @property
    def ev_geo(self):
        if self._ev is None:
            ev_repl = int(os.environ.get("SPARK_GRAFT_EV_REPL", "50"))
            ev, _ = FX.replicate_events(self.spark, self.sf_dir, ev_repl)
            self._ev = ev.persist()
            _materialize(self._ev)
        return self._ev

    @property
    def docs_raw(self):
        if self._docs is None:
            self._docs = self.spark.read.parquet(
                f"{self.sf_dir}/documents.parquet")
        return self._docs

    @property
    def lsh_idx(self):
        if self._idx is None:
            self._idx = dedup.lsh_band_index(
                self.docs_raw.filter(F.col("doc_id") % 2 == 0), "text"
            ).persist()
            _materialize(self._idx)
        return self._idx


def _builders():
    """name -> fn(ctx) returning the DataFrame bench.py materializes."""

    def flagship(c):
        sub = spatial.spatial_subset(
            c.spark, c.dg, DOC_GRID, [FX.QUERY_PENTAGON],
            operation="intersects", abstraction="point", keep_touches=True)
        tiled = tiling.assign_dest_tiles(sub, DOC_GRID, 16)
        return tiled.select("doc_uid", "cell_id", "tile_id",
                            SP.span_signature_fast().alias("span_sig"))

    def rotated(c):
        glon, glat = crs_ops.rotated_to_lonlat(
            F.col("lon") + 103.5, F.col("lat") - 38.5, -162.0, 39.25)
        return c.dg.select("doc_id", glon.alias("glon"), glat.alias("glat"))

    def knn_batch(c):
        pts = c.dg.filter(F.col("doc_id") < 1000).select(
            F.col("doc_id").alias("qid"), F.col("lon").alias("qlon"),
            F.col("lat").alias("qlat"))
        return knn.knn_join(pts, c.dg.select("cell_y", "cell_x"),
                            DOC_GRID, k=3)

    def bilinear(c):
        g = DOC_GRID
        dst = c.spark.range(1_000_000).select(
            F.col("id").alias("dst_id"),
            (F.lit(g.lon0) + (F.col("id") % 997).cast("double") / 997.0
             * F.lit(g.lon1 - g.lon0)).alias("x"),
            (F.lit(g.lat0) + (F.col("id") % 991).cast("double") / 991.0
             * F.lit(g.lat1 - g.lat0)).alias("y"))
        src = c.spark.range(g.nx * g.ny).select(
            F.col("id").alias("src_id"),
            ((F.col("id") * 31) % 97).cast("double").alias("value"))
        return regrid_ops.bilinear_regrid(src, dst, g)

    return {
        "ingest_scaled": lambda c: c.dg,
        "flagship_join_tiles": flagship,
        "bbox_subset": lambda c: spatial.bbox_filter(c.dg, FX.QUERY_RECT),
        "url_canon_scaled": lambda c: urls.canonicalize(
            c.dg.select("doc_id", F.expr(urls.url_synth_sql()).alias("url"))
        ).select("doc_id", "canon_url", "domain"),
        "clip_cells": lambda c: spatial.spatial_subset(
            c.spark, c.dg.select("cell_y", "cell_x").distinct(), DOC_GRID,
            [FX.rect_ring(*E.QUERY_CLIP)], operation="clip",
            abstraction="polygon"),
        "knn_point": lambda c: knn.knn_cells(
            c.dg, DOC_GRID, *FX.QUERY_POINT, k=8),
        "knn_join_batch": knn_batch,
        "tile_source_assign": lambda c: tiling.assign_source_tiles(
            c.dg.select("cell_y", "cell_x").distinct(),
            tiling.tile_schema_df(c.spark, DOC_GRID, 16), DOC_GRID),
        "rotated_pole_transform": rotated,
        "nonuniform_encode_subset": lambda c: spatial.bbox_filter(
            vg_ops.encode_cells(
                c.dg.select("doc_id", "lon", "lat"), FX.VEC_GRID),
            FX.QUERY_RECT),
        "nonconvex_subset": lambda c: spatial.spatial_subset(
            c.spark, c.dg, DOC_GRID, [FX.QUERY_LSHAPE],
            operation="intersects", abstraction="point", keep_touches=True),
        "zrange_subset_scaled": lambda c: spatial.refine_points(
            spatial.zrange_filter(
                c.dg, DOC_GRID, [FX.QUERY_LSHAPE], max_cells=64),
            [FX.QUERY_LSHAPE], keep_touches=True).select("doc_uid"),
        "pii_scan_scaled": lambda c: textops.pii_scan(c.dg),
        "bilinear_1M": bilinear,
        "minhash_dedup": lambda c: dedup.minhash_dedup(
            c.docs_raw, "text", 0.5, hash_fn="xxhash64"),
        "ingest_screen": lambda c: dedup.near_dup_hits(
            c.docs_raw.filter(F.col("doc_id") % 2 == 1), c.lsh_idx),
        "lm_score": lambda c: textops.lm_score(c.docs_raw),
        "similarity_topk": lambda c: similarity.brute_topk(
            c.spark.read.parquet(f"{c.sf_dir}/embeddings.parquet"),
            c.spark.read.parquet(f"{c.sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") < 20), k=5),
        "set_functions": lambda c: temporal.set_functions(
            c.spark.read.parquet(f"{c.sf_dir}/events.parquet"), ["user_id"]),
        "moving_window": lambda c: windows.moving_window(
            c.spark.read.parquet(f"{c.sf_dir}/events.parquet"),
            "user_id", "ts", "value", tiebreak="event_id"),
        "q1_pricing": lambda c: E.q_q1_pricing(c.spark, c.sf_dir),
        "mobility_dwell_od": lambda c: trajectory.od_flows(
            c.ev_geo, max_step_m=30000.0, min_duration_us=43_200_000_000,
            od_cell_deg=5.0),
        "spacetime_scan_scaled": lambda c: gridstats.spacetime_scan(
            c.ev_geo, cell_deg=5.0, lat0=-65.0, lat1=65.0,
            t0_us=1_704_067_200_000_000, bin_us=172_800_000_000,
            n_bins=15, w_max=4, min_count=5, llr_min=2.0),
        "autocorr_p_scaled": lambda c: gridstats.global_autocorr_p(
            c.ev_geo, cell_deg=5.0, lat0=-65.0, lat1=65.0, n_reps=199),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain", metavar="DIR",
                    help="dump .explain('formatted') to DIR/<name>_<suffix>.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--ui", action="store_true",
                    help="enable Spark UI and hold the session on exit")
    args = ap.parse_args()
    builders = _builders()
    if args.list:
        print("\n".join(builders))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if args.ui:
        # build a UI-enabled clone of get_spark's confs
        spark = (SparkSession.builder.appName("bench_extra")
                 .master(f"local[{cpus}]")
                 .config("spark.sql.shuffle.partitions", str(max(32, cpus)))
                 .config("spark.default.parallelism", str(cpus))
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.sql.ansi.enabled", "false")
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
                 .config("spark.sql.adaptive.skewJoin.enabled", "true")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
                 .config("spark.sql.autoBroadcastJoinThreshold",
                         str(64 * 1024 * 1024))
                 .config("spark.driver.memory",
                         os.environ.get("SPARK_DRIVER_MEM", "8g"))
                 .config("spark.ui.enabled", "true")
                 .getOrCreate())
    else:
        spark = get_spark("bench_extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ctx = Ctx(spark, sf_dir)
    out = {}
    for name in (args.names or list(builders)):
        fn = builders[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(ctx)
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}", file=sys.stderr)
        if args.reps == 0:
            continue
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            _materialize(fn(ctx))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"results": {k: v["min"] for k, v in out.items()}}))
    if args.ui:
        print("UI held at http://localhost:4040 — Ctrl-C to exit",
              file=sys.stderr)
        time.sleep(int(os.environ.get("SPARK_GRAFT_UI_HOLD", "600")))


if __name__ == "__main__":
    main()
