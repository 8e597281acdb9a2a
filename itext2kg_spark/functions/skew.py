"""Skew handling for hot keys (north rule: url-hash partitioning with salted
repartition for hot domains).

Web crawls are domain-skewed: a handful of hosts contribute orders of
magnitude more pages than the median. Operations keyed by domain (per-host
aggregation, politeness grouping, per-site dedup) hot-spot a single partition.

`salted_repartition` spreads each key over `salt` buckets deterministically
(hash of the full row key, not a random number — reproducible across runs and
retries); `salted_aggregate` implements the standard two-phase aggregation:
partial aggregate on (key, salt), final aggregate on key. AQE's skew-join
splitting already covers join-side skew; this covers aggregation/partitioning
skew, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def salted_repartition(
    df: DataFrame,
    key: str | Column,
    num_partitions: int,
    salt: int = 16,
    salt_source: str | Column = None,
) -> DataFrame:
    """Repartition by (key, salt-bucket) so one hot key spans `salt`
    partitions. Salt derives from `salt_source` (default: the row's full
    hash) — deterministic, no RNG."""
    key_col = F.col(key) if isinstance(key, str) else key
    src = (
        F.col(salt_source)
        if isinstance(salt_source, str)
        else (salt_source if salt_source is not None else F.xxhash64(*df.columns))
    )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
    out = salted.repartition(num_partitions, key_col, F.col("__salt"))
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_col -> (partial_fn, final_fn) where partial_fn(col_name)
    aggregates within (key, salt) and final_fn(partial_col) combines salts.
    Example: {"n": ("count", "sum"), "mx": ("max", "max")}.
    """
    import pyspark.sql.functions as SF

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt))
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[
            getattr(SF, pf)(c if pf != "count" else "*").alias(f"__p_{out}")
            for out, (pf, _, c) in _norm(aggs).items()
        ]
    )
    final = partial.groupBy(key).agg(
        *[
            getattr(SF, ff)(f"__p_{out}").alias(out)
            for out, (_, ff, _) in _norm(aggs).items()
        ]
    )
    return final


def _norm(aggs: dict) -> dict:
    out = {}
    for name, spec in aggs.items():
        if len(spec) == 2:
            out[name] = (spec[0], spec[1], name)
        else:
            out[name] = spec
    return out
