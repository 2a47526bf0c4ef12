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


def streaming_domain_cap(
    stream: DataFrame, cap: int, domain: str = "domain",
    key: str = "doc_id",
) -> DataFrame:
    """Ingest-time per-domain admission cap over a STREAM: admit a
    document iff its registered domain has admitted fewer than ``cap``
    documents so far — the streaming form of ``urls.domain_cap``.

    Semantics differ from the batch operator BY NECESSITY and are
    documented rather than hidden: batch ``domain_cap`` picks a
    deterministic multiplicative-hash sample of each domain (it sees the
    whole corpus); a stream cannot retroactively swap an admitted doc for
    a better-hashed later one, so the streaming cap admits FIRST-ARRIVED
    (within a micro-batch, ordered by ``key`` for determinism). Both
    admit exactly ``min(cap, n_domain)`` docs per domain — asserted
    against the batch count in pytest, along with the prefix property
    (once a domain's cap fills, later batches admit nothing).

    State: ONE integer per domain (O(domains), permanent — a cap is a
    corpus-lifetime budget, so no timeout). Output mode: update."""

    def admit(keys, pdf_iter, state: GroupState):
        (dom,) = keys
        n = state.get[0] if state.exists else 0
        if n >= cap:  # budget spent: don't materialize the batch at all
            state.update((n,))
            return
        # concat the group's Arrow chunks BEFORE sorting — per-chunk
        # head() would make admission depend on Arrow batch boundaries
        chunks = [pdf[[key]] for pdf in pdf_iter]
        if not chunks:
            state.update((n,))
            return
        sel = pd.concat(chunks).sort_values(key).head(cap - n)
        state.update((n + len(sel),))
        yield pd.DataFrame({key: sel[key].tolist(),
                            domain: [dom] * len(sel)})

    return stream.groupBy(domain).applyInPandasWithState(
        admit,
        outputStructType=f"{key} bigint, {domain} string",
        stateStructType="admitted bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
