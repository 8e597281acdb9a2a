"""Interval-overlap join — the range join, made shuffle-friendly.

Overlap joins (which sessions overlap which incidents, which ad
exposures overlap which visits) are inequality joins; naively expressed,
Spark plans a BroadcastNestedLoopJoin (every-pair comparison) or, with
an equi key, a sort-merge join whose range residual still scans every
same-key pair — quadratic per key, the classic scale cliff.

The standard decomposition (used by Databricks' range-join hints and
most temporal-join literature): quantize time into bins of width W,
explode every interval to the bins it covers (bounded by
ceil(len/W) + 1 rows), and equi-join on (key, bin). Each truly
overlapping pair then meets in one or more shared bins; to emit it
EXACTLY ONCE without a dedup shuffle, the join keeps only the FIRST
common bin — `bin == floor(greatest(l_start, r_start) / W)` — which both
sides cover by construction. The whole operator is therefore one
shuffle equi join plus codegen'd arithmetic: no nested loop, no
distinct.

Pick `bin_width` near the typical interval length: too small multiplies
the exploded rows, too large multiplies the same-bin candidates. Both
degradations are linear and observable (exploded row count, join input
sizes), never quadratic.

Measured (500k x 500k, local[32], BENCH.md): with 500 rows/key the plain
SMJ+residual join is ~1.7x FASTER (2.4s vs 1.4s — binning overhead, no
quadratic term to beat); with 50k rows/key the binned join wins 7.3x
(2.9s vs 20.9s) and the gap grows with skew. Rule of thumb: plain join
below ~10k rows per key, interval_join above, or whenever keys are
few/absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    bin_width: int,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
) -> DataFrame:
    """Pairs (left row, right row) sharing `on` keys whose CLOSED intervals
    [l_start, l_end] and [r_start, r_end] (epoch seconds) overlap, plus
    overlap_start/overlap_end. Each pair emitted exactly once."""
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")
    w = F.lit(bin_width)

    def binned(df, start, end):
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / w), F.floor(F.col(end) / w)
                )
            ),
        )

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end)
    first_common = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / w
    )
    j = lb.join(rb, on + ["__bin"]).where(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (F.col("__bin") == first_common)
    )
    return j.drop("__bin").withColumns(
        {
            "overlap_start": F.greatest(F.col(l_start), F.col(r_start)),
            "overlap_end": F.least(F.col(l_end), F.col(r_end)),
        }
    )
