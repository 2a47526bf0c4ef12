"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.9); this is the
Spark-native extension point for continuous ingest: arbitrary per-key state
carried across micro-batches, Arrow-batched. The example operator keeps a
running exceedance counter per key (the streaming form of the engine's
``threshold`` calc) — swap the update function for any per-series recurrence
(e.g. the freezethaw cumulative scan) to make it streaming.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_exceed_counts(
    stream: DataFrame, threshold: float, key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key running count of rows with value > threshold, updated every
    micro-batch (output mode: update)."""

    def update(keys, pdf_iter, state: GroupState):
        (k,) = keys
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += int((pdf[value] > threshold).sum())
        state.update((n,))
        yield pd.DataFrame({key: [k], "n_exceed": [n]})

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"{key} bigint, n_exceed bigint",
        stateStructType="n_exceed bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
