"""SparkSession factory with scale-appropriate defaults.

Tuned for correctness parity with the DuckDB oracle (UTC session time,
non-ANSI arithmetic so % / CAST match DuckDB's classic semantics) and for
the 100 TB posture (AQE on, skew-join on, Arrow-batched Python exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


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
