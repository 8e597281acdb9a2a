"""Timestamp-string -> epoch-seconds parsing (P4).

Reference behavior (`Relationship.combine_timestamps`,
itext2kg/atom/models/relationship.py:44-57; `Atom.build_atomic_kg_from_quintuples`,
itext2kg/atom/atom.py:111-134): `dateutil.parser.parse(ts).timestamp()`, with
unparseable strings silently skipped (dropped from the list, never fatal).

Spark mapping:
  * fast path — pure Catalyst `try_to_timestamp` over the common layouts
    (ISO date, ISO datetime, `MMMM d yyyy` style), `unix_timestamp` -> double;
  * fallback — a vectorized pandas UDF calling dateutil itself for the fuzzy
    forms Catalyst can't express ("July 17th, 2025"); it only ever sees rows
    the fast path missed, so per-row Python cost is bounded by the dirty-data
    fraction, not the table size.

Naive datetimes are treated as UTC (the engine pins
spark.sql.session.timeZone=UTC; the reference inherits whatever the host TZ
is — run hosts at TZ=UTC for bit-parity).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

_FAST_FORMATS = [
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "MMMM d yyyy",
    "MMMM d, yyyy",
    "d MMMM yyyy",
]


def _fast_parse(col: Column) -> Column:
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(fmt)) for fmt in _FAST_FORMATS])


@F.pandas_udf(DoubleType())
def _dateutil_epoch(s: pd.Series) -> pd.Series:
    from datetime import timezone

    from dateutil import parser as dparser

    def one(v):
        if v is None:
            return None
        try:
            dt = dparser.parse(str(v))
        except Exception:
            return None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()

    return s.map(one)


def parse_timestamp_expr(col: Column, use_dateutil_fallback: bool = True) -> Column:
    """String -> epoch seconds (double); null when unparseable.

    Callers drop nulls to reproduce the reference's skip-on-error (F4).
    """
    fast = F.unix_timestamp(_fast_parse(col)).cast("double")
    if not use_dateutil_fallback:
        return fast
    # dateutil only runs where the fast path missed AND the input is non-null.
    return F.coalesce(fast, F.when(col.isNotNull(), _dateutil_epoch(col)))


def parse_timestamp_array(col: Column) -> Column:
    """array<string> -> array<double>, dropping unparseable elements.

    Mirrors the reference's per-element try/except-continue loop
    (relationship.py:47-57) as: parse each element, filter nulls.
    Uses only the Catalyst fast path inside `transform` (higher-order
    functions can't call pandas UDFs); callers needing fuzzy forms explode
    first and use `parse_timestamp_expr`.
    """
    parsed = F.transform(col, lambda x: F.unix_timestamp(_fast_parse(x)).cast("double"))
    return F.filter(parsed, lambda x: x.isNotNull())
