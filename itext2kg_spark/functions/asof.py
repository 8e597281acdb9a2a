"""As-of (point-in-time) join — the union + keyed-window formulation.

For every left row, attach the most recent right row of the same key with
right.ts <= left.ts (optionally within a tolerance). The naive expressions
of this are both scale-killers: an inequality theta-join explodes to the
per-key cross product before the argmax, and a per-key collect is a
driver loop. The scalable formulation is the classic stream-merge made
declarative:

  union(left tagged 1, right tagged 0)
  -> ONE window over (key) ordered by (ts, tag, tiebreak)
  -> last non-null right payload at or before the current row

which Spark executes as a single hash exchange on the key plus one sort —
the same shuffle profile as sessionization, linear in |L| + |R|, and
skew-bounded by the hottest key's row count (salt upstream if one key is
a material fraction of the corpus). The right payload travels as one
struct column so the window carries a single value, not one lag per
column.

Tie semantics: a right row AT the left row's timestamp matches (tag
orders right before left within equal ts); among equal (key, ts) right
rows the one with the greatest tiebreak column wins — deterministic, and
exactly replayable by a SQL ASOF JOIN oracle on a (key, ts)-unique right
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    tolerance_s: int | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Backward as-of join (latest right at-or-before each left row).

    Returns all left columns plus, for every non-key right column C,
    `{right_prefix}C` — null when no right row precedes the left row (or
    none within `tolerance_s`). Forward joins are the same operator over
    negated timestamps.

    `ts_col` must exist on both sides; comparison happens in epoch
    microseconds (timezone-free, TIMESTAMP_NTZ-safe)."""
    from itext2kg_spark.functions.sessions import _us

    payload_cols = [c for c in right.columns if c not in (on, ts_col)]
    us = _us(F.col(ts_col))

    l_tag = left.select(
        F.col(on).alias("__k"),
        us.alias("__us"),
        F.lit(1).alias("__tag"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    us.alias("__r_us"), *payload_cols
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        us.alias("__us"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.struct(us.alias("__r_us"), *payload_cols).alias("__r"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__us").asc(), F.col("__tag").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("__tag") == 1)
    if tolerance_s is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__us") - F.col("__match.__r_us")
                <= tolerance_s * 1_000_000,
                F.col("__match"),
            ),
        )
    return out.select(
        F.col("__l.*"),
        F.col("__match.__r_us").alias(f"{right_prefix}{ts_col}_us"),
        *[
            F.col(f"__match.{c}").alias(f"{right_prefix}{c}")
            for c in payload_cols
        ],
    )
