"""SparkSession factory with scale-appropriate defaults.

Tuned for correctness parity with the DuckDB oracle (UTC session time,
non-ANSI arithmetic so % / CAST match DuckDB's classic semantics) and for
the 100 TB posture (AQE on, skew-join on, Arrow-batched Python exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def local_df(spark: SparkSession, rows, schema):
    """Small NULL-FREE local relation via the Arrow/pandas path.

    ``createDataFrame(list_of_tuples)`` builds a Python RDD: EVERY
    evaluation (a collect, a broadcast build, a final action) launches
    ``defaultParallelism`` Python-worker tasks just to re-emit the
    literal rows — measured ~330 ms per evaluation on local[32] vs
    ~45 ms for the same rows shipped as one Arrow batch (guide §4: the
    row-pickle boundary is the cost, not the data). The Arrow batch is
    serialized once driver-side and each evaluation is a single JVM
    task.

    Callers must guarantee rows contain no None/NaN: pandas would
    coerce them per-column (None -> NaN for floats), which the pickled
    row path does not. Empty input falls back to the exact list path.
    """
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = (
        schema.names if hasattr(schema, "names")
        else [f.split()[0] for f in schema.split(",")]
    )
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)


def get_spark(
    app_name: str = "ocgis_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls local parallelism (``local[cpus]``); the bench harness
    uses this to evidence the two-cluster-size scaling rule (N vs 4N cores).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(DEFAULT_SHUFFLE_PARTITIONS, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        # classic (non-ANSI) arithmetic: % and integral division semantics
        # line up with the DuckDB oracle; no hard failure on edge overflow.
        .config("spark.sql.ansi.enabled", "false")
        # AQE: runtime coalescing + skew-join splitting complements our
        # explicit salting (SURVEY.md §4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / mapInPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # keep broadcast threshold generous: polygon coverings / tile
        # schemas / dim tables are always broadcast, never shuffled.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
