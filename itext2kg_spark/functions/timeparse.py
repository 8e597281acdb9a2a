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
from pyspark.sql.types import ArrayType, DoubleType

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

# string -> epoch-or-None memo for the dateutil fallback. Real corpora repeat
# a small set of date surface forms across millions of mentions, so dateutil
# (~30-50us per parse) should run once per DISTINCT string per worker, not
# once per element — the same worker-lifetime bounded-cache pattern as the
# simhash token cache (guide §4.5: heavyweight per-item work once). Results
# for a given string are identical with or without the memo (dateutil parse
# of a fully-specified string is deterministic); the bound caps worker memory
# on adversarial corpora with unbounded distinct strings.
_DATEUTIL_CACHE: dict[str, float | None] = {}
_DATEUTIL_CACHE_MAX = 1 << 20


def _dateutil_epoch_one(v) -> float | None:
    """dateutil-parse one string to epoch seconds (None on failure), memoized."""
    from datetime import timezone

    from dateutil import parser as dparser

    key = str(v)
    try:
        return _DATEUTIL_CACHE[key]
    except KeyError:
        pass
    try:
        dt = dparser.parse(key)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        out = dt.timestamp()
    except Exception:  # noqa: BLE001 — reference skips unparseable strings
        out = None
    if len(_DATEUTIL_CACHE) < _DATEUTIL_CACHE_MAX:
        _DATEUTIL_CACHE[key] = out
    return out


def _fast_parse(col: Column) -> Column:
    """Catalyst replication of dateutil for the common layouts, as a
    lazily-evaluated coalesce (later branches only run where earlier ones
    returned null, so clean ISO elements never pay for the exotic tries).

    The two appended families move the frequent dateutil-only surface forms
    into the JVM — they are APPENDED so every string the original list
    accepted parses exactly as before, and anything they newly accept is
    proven to parse identically to dateutil (exhaustive parity test over
    all aa.bb.yyyy numeric triples and all month/day ordinal forms,
    tests/test_timeparse.py):
      * dotted numeric triples — month-first then day-first, which IS
        dateutil's dayfirst=False disambiguation (swap only when the first
        number cannot be a month);
      * ordinal day suffixes ("July 17th, 2025") — st/nd/rd/th after a
        digit are jump tokens dateutil skips wholesale, so stripping them
        and parsing the month-name layouts is equivalent. Anything else
        (spaced suffixes, lowercase months, 2-digit years) still falls
        through to the dateutil fallback unchanged."""
    tries = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in _FAST_FORMATS]
    tries += [
        F.try_to_timestamp(col, F.lit("MM.dd.yyyy")),
        F.try_to_timestamp(col, F.lit("dd.MM.yyyy")),
    ]
    stripped = F.regexp_replace(col, r"(?<=\d)(st|nd|rd|th)\b", "")
    tries += [
        F.try_to_timestamp(stripped, F.lit(fmt))
        for fmt in ("MMMM d yyyy", "MMMM d, yyyy", "d MMMM yyyy")
    ]
    return F.coalesce(*tries)


@F.pandas_udf(DoubleType())
def _dateutil_epoch(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        return _dateutil_epoch_one(v)

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


@F.pandas_udf(ArrayType(DoubleType()))
def _dateutil_epoch_array(strs: pd.Series, fast: pd.Series) -> pd.Series:
    """Per row: keep the Catalyst fast-parse where it hit, dateutil the
    misses, drop elements neither can parse (reference skip-on-error).
    Only rows the caller gated (fast-path miss present) arrive non-null."""

    def one(pair):
        ss, ff = pair
        if ss is None:
            return None
        out = []
        for i, s in enumerate(ss):
            f = ff[i] if ff is not None and i < len(ff) else None
            if f is not None and f == f:  # not None/NaN (Arrow null -> NaN)
                out.append(float(f))
                continue
            if s is None:
                continue
            v = _dateutil_epoch_one(s)
            if v is not None:
                out.append(v)
        return out

    return pd.Series(map(one, zip(strs, fast)))


def parse_timestamp_array(col: Column, use_dateutil_fallback: bool = True) -> Column:
    """array<string> -> array<double>, dropping unparseable elements.

    Mirrors the reference's per-element try/except-continue loop
    (relationship.py:47-57): parse each element, skip failures. The Catalyst
    fast path covers the common layouts JVM-side; rows with at least one
    fast-path miss (and only those — the UDF inputs are null-gated, so the
    Python worker sees null for clean rows) fall back to a vectorized pandas
    UDF that runs dateutil on the missed elements, preserving element order.
    The per-row-Python cost is bounded by the dirty-data fraction, not the
    table size.
    """
    fast = F.transform(col, lambda x: F.unix_timestamp(_fast_parse(x)).cast("double"))
    fast_ok = F.filter(fast, lambda x: x.isNotNull())
    if not use_dateutil_fallback:
        return fast_ok
    miss = F.exists(
        F.zip_with(col, fast, lambda s, d: s.isNotNull() & d.isNull()),
        lambda b: b,
    )
    combined = _dateutil_epoch_array(F.when(miss, col), F.when(miss, fast))
    return F.when(miss, combined).otherwise(fast_ok)


def _with_fast_arrays(df, cols: list[str]):
    """Project the Catalyst fast-parse of each array column as a REAL column
    (`__fast_<c>`) so it evaluates once per row however many consumers read
    it (Catalyst keeps the projection boundary: the aliases are non-cheap and
    multiply referenced). Shared by the split and inline variants."""
    fast_names = {c: f"__fast_{c}" for c in cols}
    base = df.select(
        "*",
        *[
            F.transform(
                F.col(c), lambda x: F.unix_timestamp(_fast_parse(x)).cast("double")
            ).alias(fast_names[c])
            for c in cols
        ],
    )
    return base, fast_names


def _array_miss(col: Column, fast: Column) -> Column:
    return F.coalesce(
        F.exists(
            F.zip_with(col, fast, lambda s, d: s.isNotNull() & d.isNull()),
            lambda b: b,
        ),
        F.lit(False),
    )


def parse_timestamp_array_columns(
    df, cols: list[str], use_dateutil_fallback: bool = True
):
    """Replace each array<string> column with its parsed array<double>.

    Why not just `parse_timestamp_array` per column: a pandas UDF anywhere in
    a projection inserts an ArrowEvalPython stage that round-trips EVERY row
    through the Python worker, even rows whose UDF inputs are nulled — ~1.5x
    on the KG mentions projection when the corpus is clean. Here the rows are
    split on the fast-path-miss flag instead: clean rows (the vast majority)
    keep a pure-JVM plan, only rows with at least one unparseable-by-Catalyst
    element flow through dateutil, and the two branches union back. Upstream
    should be (cheaply recomputable or) checkpointed since both branches scan
    it.
    """
    base, fast_names = _with_fast_arrays(df, cols)
    if not use_dateutil_fallback:
        sel = [
            F.filter(F.col(fast_names[c]), lambda x: x.isNotNull()).alias(c)
            if c in cols
            else c
            for c in df.columns
        ]
        return base.select(*sel)
    miss = None
    for c in cols:
        m = _array_miss(F.col(c), F.col(fast_names[c]))
        miss = m if miss is None else (miss | m)
    base = base.withColumn("__miss", miss)

    clean = base.where(~F.col("__miss")).select(
        *[
            F.filter(F.col(fast_names[c]), lambda x: x.isNotNull()).alias(c)
            if c in cols
            else c
            for c in df.columns
        ]
    )
    dirty = base.where(F.col("__miss")).select(
        *[
            _dateutil_epoch_array(F.col(c), F.col(fast_names[c])).alias(c)
            if c in cols
            else c
            for c in df.columns
        ]
    )
    return clean.unionByName(dirty)


def parse_timestamp_array_inline(
    df, cols: list[str], use_dateutil_fallback: bool = True
):
    """Single-pass row-gated variant of `parse_timestamp_array_columns`: no
    clean/dirty branch split, so the input is scanned ONCE — the right shape
    when upstream is expensive to recompute and unmaterialized (the
    materialize_quintuples=False pipeline mode).

    Why not `parse_timestamp_array` per column there: as a single expression
    its fast-parse transform is substituted into every consumer (`fast_ok`,
    the miss flag, both fallback arguments) and re-evaluated per appearance —
    ~6 `try_to_timestamp` sweeps per array per row. Here the fast arrays are
    materialized as REAL columns first, so each is computed once per row;
    Catalyst keeps the projection boundary because the aliased expressions
    are non-cheap and multiply referenced (same contract the clean/dirty
    split relies on). Every row still crosses the ArrowEvalPython stage (the
    row-gated UDF), which is why the split variant stays the default for
    checkpointed inputs."""
    base, fast_names = _with_fast_arrays(df, cols)
    out = []
    for c in df.columns:
        if c not in cols:
            out.append(F.col(c))
            continue
        fn = F.col(fast_names[c])
        fast_ok = F.filter(fn, lambda x: x.isNotNull())
        if not use_dateutil_fallback:
            out.append(fast_ok.alias(c))
            continue
        miss = _array_miss(F.col(c), fn)
        combined = _dateutil_epoch_array(
            F.when(miss, F.col(c)), F.when(miss, fn)
        )
        out.append(F.when(miss, combined).otherwise(fast_ok).alias(c))
    return base.select(*out)
