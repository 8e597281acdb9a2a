"""Canonical KG store with snapshot-per-batch checkpoint/resume (S3-S5).

The reference persists the graph to Neo4j with per-element Cypher MERGE
(graph_integration/neo4j_storage.py:155-246) and checkpoints batch progress as
driver-side pickles with max-completed-batch resume
(evaluation/latency/testing_atom.py:65-114, cleanup :266-291).

Here the canonical graph IS a pair of tables. On a production cluster these
are Iceberg tables (`df.writeTo(...)` + `MERGE INTO` for the upsert, snapshot
per batch, `rollback_to_snapshot` for recovery). This sandbox has no Iceberg
runtime jars, so the same contract is implemented over parquet snapshot
directories with atomic commit markers:

    root/
      snapshots/batch=<i>/entities/   (parquet)
      snapshots/batch=<i>/edges/      (parquet)
      snapshots/batch=<i>/_COMMITTED  (marker written after both writes land)

Resume = read the highest committed batch; uncommitted partial snapshot
directories are ignored and overwritten — equivalent to the reference's
find_last_completed_batch + cleanup of incomplete later batches.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from itext2kg_spark.sources.stream_hw import StreamEpochMixin


class KGStore(StreamEpochMixin):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # ---- snapshot discovery -------------------------------------------------
    def _snap_dir(self, batch_id: int) -> str:
        return os.path.join(self.root, "snapshots", f"batch={batch_id}")

    def committed_batches(self) -> list[int]:
        out = []
        snaps = os.path.join(self.root, "snapshots")
        for d in os.listdir(snaps):
            m = re.fullmatch(r"batch=(\d+)", d)
            if m and os.path.exists(os.path.join(snaps, d, "_COMMITTED")):
                out.append(int(m.group(1)))
        return sorted(out)

    def last_committed(self) -> int | None:
        b = self.committed_batches()
        return b[-1] if b else None

    def next_batch_id(self) -> int:
        last = self.last_committed()
        return 0 if last is None else last + 1

    # ---- read / write -------------------------------------------------------
    def write_snapshot(
        self,
        batch_id: int,
        entities: DataFrame,
        edges: DataFrame,
        metrics: dict | None = None,
        lineage: DataFrame | None = None,
    ) -> None:
        d = self._snap_dir(batch_id)
        if os.path.exists(d):  # partial snapshot from a crashed run
            shutil.rmtree(d)
        entities.write.mode("overwrite").parquet(os.path.join(d, "entities"))
        edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
        if lineage is not None:
            # per-partition lineage of the batch input (north rule): which
            # input partitions contributed, row counts, distinct keys
            lineage.write.mode("overwrite").parquet(os.path.join(d, "lineage"))
        with open(os.path.join(d, "_COMMITTED"), "w") as f:
            json.dump({"batch_id": batch_id, "metrics": metrics or {}}, f)
        # streaming high-water cache, AFTER the commit marker (see
        # last_stream_epoch): a crash between the two writes leaves the
        # cache stale-low, which the bounded catch-up scan repairs — replay
        # semantics are unchanged, epochs can never be skipped
        m = metrics or {}
        if "stream_key" in m and "stream_epoch" in m:
            self._write_stream_hw(
                str(m["stream_key"]), int(m["stream_epoch"]), batch_id
            )

    def load_lineage(self, spark: SparkSession, batch_id: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self._snap_dir(batch_id), "lineage")
        )

    def load(
        self, spark: SparkSession, batch_id: int | None = None
    ) -> tuple[DataFrame, DataFrame] | None:
        if batch_id is None:
            batch_id = self.last_committed()
        if batch_id is None:
            return None
        d = self._snap_dir(batch_id)
        return (
            spark.read.parquet(os.path.join(d, "entities")),
            spark.read.parquet(os.path.join(d, "edges")),
        )

    def snapshot_metrics(self, batch_id: int) -> dict:
        with open(os.path.join(self._snap_dir(batch_id), "_COMMITTED")) as f:
            return json.load(f)
