"""Checkpoint / lineage / resume — resumable tiled execution.

The reference's analogue is the chunked compute loop that fills a template
file tile-by-tile and syncs after each tile
(``/root/reference/src/ocgis/util/large_array.py:170-218``) plus the
chunker's per-tile index rows (``spatial/grid_chunker.py:781-818``). Here:

* work is partitioned by ``tile_id`` (the GridChunker tile);
* each run processes only tiles absent from the checkpoint manifest;
* data lands under ``<root>/data/tile_id=<t>/`` via dynamic partition
  overwrite (idempotent per tile — a re-run of a crashed tile replaces any
  partial files);
* after the data job succeeds, one manifest record per tile is appended
  atomically (single JSON-lines file per commit batch, unique name +
  rename): tile_id, row count, wall time, input lineage fingerprint,
  timestamp — the "per-partition lineage + metrics rows" of the north rule.

On a real cluster the manifest becomes an Iceberg table (atomic commits
come free); this file-based implementation keeps identical semantics
without Iceberg jars in the sandbox.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ---- manifest ----

    def records(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.manifest_dir, name)) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    def committed_tiles(self) -> set[int]:
        return {r["tile_id"] for r in self.records()}

    def _append(self, records: list[dict]) -> None:
        """Atomic append: write to a temp name, then rename (POSIX atomic)."""
        if not records:
            return
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(
            self.manifest_dir, f"commit-{int(time.time() * 1e6)}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        with open(tmp, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, final)

    # ---- resumable stage ----

    def run_stage(
        self,
        spark: SparkSession,
        df: DataFrame,
        tile_col: str = "tile_id",
        lineage: str = "",
    ) -> dict:
        """Process every not-yet-committed tile of ``df`` exactly once.

        Returns {"processed": [...], "skipped": [...]}. Killing the process
        mid-write loses no committed tile: data for uncommitted tiles is
        rewritten (dynamic partition overwrite), committed tiles are never
        touched again (resume filter).
        """
        # resume guard: a manifest committed under a different input/
        # parameter fingerprint must not be silently resumed over — the
        # committed tiles would be a DIFFERENT job's output. ("" lineage
        # opts out; pre-guard manifests with empty lineage are
        # grandfathered, and so is a committed lineage that is a
        # ':'-boundary PREFIX of the current one — jobs extend their
        # fingerprint by appending ':key=value' parameter segments, and a
        # manifest written before a segment existed must still resume
        # under identical inputs.)
        recs = self.records()  # parsed once; feeds the guard AND `done`
        if lineage:
            stale = {
                c
                for c in (r.get("lineage") for r in recs)
                if c and c != lineage and not lineage.startswith(c + ":")
            }
            if stale:
                raise ValueError(
                    f"checkpoint at {self.root!r} was committed with a "
                    f"different lineage fingerprint ({sorted(stale)} vs "
                    f"current {lineage!r}) — the inputs or job parameters "
                    "changed. Use a fresh output dir (or clear the "
                    "manifest) to rebuild."
                )
        done = {r["tile_id"] for r in recs}
        pending_df = df.filter(~F.col(tile_col).isin(list(done)) if done else F.lit(True))

        # per-tile metrics from the SAME filtered frame (one extra agg job)
        counts = {
            r[tile_col]: r["n"]
            for r in pending_df.groupBy(tile_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not counts:
            return {"processed": [], "skipped": sorted(done)}

        t0 = time.time()
        (
            # repartition on the tile key first: without it every task
            # writes a file into every tile directory (tasks x tiles small
            # files at cluster scale); with it each tile is written by the
            # task(s) owning its shuffle partition. Hot tiles can be salted
            # upstream (operators.partitioning) before reaching this sink.
            pending_df.repartition(F.col(tile_col))
            .write.format("parquet")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(tile_col)
            .save(self.data_dir)
        )
        wall = time.time() - t0
        now = time.time()
        self._append(
            [
                {
                    "tile_id": int(t),
                    "rows": int(n),
                    "wall_sec": round(wall, 3),
                    "lineage": lineage,
                    "committed_at": now,
                }
                for t, n in sorted(counts.items())
            ]
        )
        return {"processed": sorted(counts), "skipped": sorted(done)}


def lineage_fingerprint(df: DataFrame, cols: list[str]) -> str:
    """Order-insensitive input fingerprint (bit_xor of xxhash64 per row —
    XOR commutes and cannot overflow, so it is safe under ANSI mode) —
    recorded in the manifest so a resume can detect changed inputs."""
    h = df.select(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(cols) + "))"
        ).alias("h")
    ).collect()[0]["h"]
    return f"xx64:{h}"
