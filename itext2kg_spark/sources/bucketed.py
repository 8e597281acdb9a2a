"""Bucketed canonical-table storage — co-located incremental merge joins.

At 10^12 documents the canonical edge table is the largest thing the
pipeline owns, and the incremental path re-joins it every batch (union new
mentions, re-aggregate; or MERGE-style update). If that table lives as
plain parquet, every batch pays a full shuffle of the STORED side — the
one cost that grows with corpus age rather than batch size. Bucketing
fixes the asymmetry: persist the table hash-bucketed (and sorted) by its
canonical key, and the per-batch merge join reads stored buckets in place
— only the (batch-sized) update side shuffles. On Iceberg this same
contract is the storage-partitioned join under `MERGE INTO`; here it is
Spark's native bucketed `saveAsTable`, which the built-in (non-Hive)
session catalog fully supports.

Evidence (plan-pinned in tests/test_bucketed.py): bucketed ⋈ fresh shows
exactly ONE Exchange (the fresh side, hashed into the table's bucketing);
bucketed ⋈ bucketed (same keys/count) shows ZERO Exchanges.

Versioning: merge writes a NEW bucketed table (write-once, never
in-place) and returns its name; `swap` points the logical name at it via
the catalog (drop + rename is not atomic in the session catalog, so the
logical name is resolved through a tiny `current` marker kept by the
store — the same pointer-swap idea as KGStore's `_COMMITTED`, because a
crashed merge must leave the previous version readable).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BucketedTableStore:
    """Versioned bucketed materialization of one logical table."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str = "kg_edges",
        keys: tuple[str, ...] = ("src_name", "pred", "dst_name"),
        buckets: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.name = name
        self.keys = list(keys)
        self.buckets = buckets
        os.makedirs(root, exist_ok=True)

    # -- version pointer ----------------------------------------------------
    def _marker(self) -> str:
        return os.path.join(self.root, f"{self.name}.current.json")

    def current_version(self) -> int | None:
        try:
            with open(self._marker()) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _table(self, version: int) -> str:
        return f"{self.name}_v{version}"

    def _commit(self, version: int) -> None:
        tmp = self._marker() + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._marker())

    # -- io -----------------------------------------------------------------
    def write(self, df: DataFrame, version: int | None = None) -> int:
        """Write a new bucketed version and commit the pointer to it."""
        cur = self.current_version()
        version = (cur + 1 if cur is not None else 0) if version is None else version
        (
            df.write.mode("overwrite")
            .bucketBy(self.buckets, self.keys[0], *self.keys[1:])
            .sortBy(self.keys[0], *self.keys[1:])
            .option("path", os.path.join(self.root, self._table(version)))
            .saveAsTable(self._table(version))
        )
        self._commit(version)
        if cur is not None and cur != version:
            # previous version stays on disk until explicitly vacuumed; only
            # the catalog entry is dropped (readers resolve via the marker).
            # cur == version happens when a caller passes an explicit version
            # equal to the committed one (an overwrite-in-place) — dropping
            # then would deregister the table just written.
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table(cur)}")
        return version

    def load(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version of {self.name}")
        return self.load_version(v)

    def load_version(self, v: int) -> DataFrame:
        """Read a specific on-disk version as a BUCKETED table scan.

        Callers with their own commit protocol (KGStore resolves the batch
        id through its snapshot markers, not this store's pointer) read by
        explicit version so a crash between this store's write and THEIR
        commit can never surface an uncommitted version."""
        if not self.spark.catalog.tableExists(self._table(v)):
            # the built-in session catalog is in-memory: after a restart the
            # data files and the pointer marker survive but the catalog
            # entry does not — and WITHOUT it Spark forgets the files are
            # bucketed and reintroduces the shuffle this store exists to
            # remove. Re-register the existing files as a bucketed table.
            # (On a real deployment a persistent metastore / Iceberg catalog
            # makes this a no-op.)
            self.register(v)
        return self.spark.table(self._table(v))

    def register(self, version: int | None = None) -> None:
        """Recreate the catalog entry for an on-disk version (see load)."""
        v = self.current_version() if version is None else version
        path = os.path.join(self.root, self._table(v))
        schema = self.spark.read.parquet(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        keys = ", ".join(f"`{k}`" for k in self.keys)
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._table(v)} ({cols}) "
            f"USING PARQUET CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {self.buckets} BUCKETS LOCATION '{path}'"
        )

    # -- merge --------------------------------------------------------------
    def merge_batch(
        self,
        updates: DataFrame,
        count_col: str = "n_mentions",
        list_cols: tuple[str, ...] = (),
    ) -> int:
        """Canonical-key merge of an aggregated batch into the stored table:
        counts add, list columns concatenate, unmatched rows pass through on
        both sides (full outer). The stored side is read bucket-aligned —
        only `updates` shuffles (plan-pinned) — and the result is written
        as the next bucketed version."""
        return self.write(self.merge_plan(updates, count_col, list_cols))

    def merge_plan(
        self,
        updates: DataFrame,
        count_col: str = "n_mentions",
        list_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """The merge DataFrame merge_batch writes (exposed for plan
        inspection and for callers composing further before materializing)."""
        stored = self.load()
        s = stored.alias("s")
        u = updates.alias("u")
        # plain equality, NOT eqNullSafe: null-safe join keys are rewritten
        # by the planner into expressions that cannot line up with the
        # table's bucketing, forcing BOTH sides to shuffle (measured: 2
        # exchanges vs 1). Canonical keys are non-null by construction
        # (groupBy outputs of normalized mention strings); a null key row
        # would pass through unmatched from either side.
        cond = [F.col(f"s.{k}") == F.col(f"u.{k}") for k in self.keys]
        return s.join(u, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"s.{k}"), F.col(f"u.{k}")).alias(k)
                for k in self.keys
            ],
            (
                F.coalesce(F.col(f"s.{count_col}"), F.lit(0))
                + F.coalesce(F.col(f"u.{count_col}"), F.lit(0))
            ).alias(count_col),
            *[
                F.concat(
                    F.coalesce(
                        F.col(f"s.{c}"), F.array().cast(stored.schema[c].dataType)
                    ),
                    F.coalesce(
                        F.col(f"u.{c}"), F.array().cast(stored.schema[c].dataType)
                    ),
                ).alias(c)
                for c in list_cols
            ],
        )
