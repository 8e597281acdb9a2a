"""Scan-parallelism floor for heavy narrow stages.

Parquet scans can only split at row-group boundaries, so a small table (one
file, one row group) plans ONE scan task no matter what
`spark.sql.files.maxPartitionBytes` says — and every narrow stage chained on
that scan (tokenize + explode, signature kernels, extraction) runs on one
core while the rest of the cluster idles. `ensure_scan_parallelism` raises
the floor with a round-robin repartition ONLY when the planned parallelism
is well below the session's default parallelism; at real scale inputs plan
>= cores of splits and this is a no-op — no exchange is ever added for data
that is already parallel (guide §2: scale-adaptive partitioning, not a
constant tuned for one scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin `df` to max(8, defaultParallelism/2) partitions when its
    planned partition count is < 1/4 of the session default; otherwise
    return it unchanged. Plan-time only (no job): getNumPartitions reads
    the planned split count. Row order changes under repartition — callers
    are set-semantic operators (grams, signatures, extraction).

    The half-parallelism target is measured, not aesthetic: per-task
    scheduling overhead multiplies across every downstream job that rescans
    the repartitioned data (checkpoint consumers), so more partitions is
    NOT better — at local[32] on the bench tables, 8-16 partitions gave the
    minimum (ngram 1.87s->0.92s, simhash 0.60s->0.51s) while 64 partitions
    was slower than not repartitioning at all."""
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — parallelism floor is advisory
        return df
    if n * 4 <= target:
        return df.repartition(max(8, target // 2))
    return df
