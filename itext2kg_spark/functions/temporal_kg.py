"""Bitemporal snapshot reads over the canonical temporal KG.

The reference's ATOM pipeline stamps every canonical edge with
observation times (`t_obs`, when a fact was ingested) and event-time
validity (`t_start` / `t_end`, what the fact says about the world —
reference README.md Module-2/3, atom/atom.py build_graph_from_different_
obs_times). The natural consumer read is the BITEMPORAL snapshot: "what
did the graph know at observation time To, and which of those facts were
valid in the world at event time Tv" — the query a temporal-KG user runs
for point-in-time training-data cuts or audit replays.

kg_state_asof is that read, pure Catalyst over the edge table:
- knowledge cut: keep edges with at least one observation <= To and
  filter t_obs down to the observations known by To (n_obs recounted);
- validity flag at Tv from the event-time arrays: an edge is valid_at
  iff it carries validity info (t_start non-empty), its earliest start
  is <= Tv, and Tv precedes its latest end (open interval when t_end is
  empty).

Scale shape: one filter + one projection over the edge table — no
shuffle, no UDF; at 100 TB this is a scan whose predicate
(array_min(t_obs) <= To) pushes into the store's zone maps when t_obs
min/max are materialized as top-level columns (KGStore keeps edges
bucketed by key, so downstream joins after the cut stay co-located).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epochs(col: str) -> Column:
    # canonical edges carry timestamps; compare in epoch seconds
    return F.transform(F.col(col), lambda x: x.cast("long"))


def kg_state_asof(
    edges: DataFrame, obs_ts: int, valid_ts: int | None = None
) -> DataFrame:
    """Edges known by `obs_ts` (epoch seconds), with t_obs filtered to the
    observations available then, n_obs recounted, and — when `valid_ts`
    is given — a `valid_at` event-time flag. All other columns pass
    through unchanged."""
    obs = F.filter(_epochs("t_obs"), lambda o: o <= F.lit(obs_ts))
    out = (
        edges.withColumn("__obs_vis", obs)
        .where(F.size("__obs_vis") > 0)
        .withColumn("n_obs", F.size("__obs_vis").cast("long"))
        .withColumn("t_obs", F.col("__obs_vis"))
        .drop("__obs_vis")
    )
    if valid_ts is None:
        return out
    ts, te = _epochs("t_start"), _epochs("t_end")
    valid = (
        (F.size("t_start") > 0)
        & (F.array_min(ts) <= F.lit(valid_ts))
        & ((F.size("t_end") == 0) | (F.lit(valid_ts) < F.array_max(te)))
    )
    return out.withColumn("valid_at", valid)
