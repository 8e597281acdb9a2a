"""Bitemporal snapshot reads (functions/temporal_kg.py)."""

import datetime as dt

import pyspark.sql.functions as F

from itext2kg_spark.functions.temporal_kg import kg_state_asof


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _edges(spark):
    rows = [
        # (name, t_obs epochs, t_start, t_end)
        ("early", [100, 200], [_ts("2021-01-01")], []),
        ("late", [900], [_ts("2021-01-01")], []),
        ("mixed", [100, 900], [_ts("2022-01-01")], []),
        ("ended", [100], [_ts("2020-01-01")], [_ts("2021-02-01")]),
        ("open_ended", [100], [_ts("2020-01-01")], [_ts("2099-01-01")]),
        ("no_validity", [100], [], []),
    ]
    return spark.createDataFrame(
        rows,
        "src_name string, t_obs array<long>, t_start array<timestamp>, "
        "t_end array<timestamp>",
    )


def test_observation_cut_filters_and_recounts(spark):
    snap = kg_state_asof(_edges(spark), obs_ts=500)
    got = {r["src_name"]: (r["n_obs"], r["t_obs"]) for r in snap.collect()}
    assert "late" not in got  # nothing observed by To
    assert got["early"] == (2, [100, 200])
    assert got["mixed"] == (1, [100])  # the 900 observation is in the future


def test_validity_flag_at_event_time(spark):
    tv = int(_ts("2021-06-01").timestamp())
    snap = kg_state_asof(_edges(spark), obs_ts=500, valid_ts=tv)
    got = {r["src_name"]: r["valid_at"] for r in snap.collect()}
    assert got["early"] is True          # started 2021-01-01, no end
    assert got["mixed"] is False         # starts only in 2022
    assert got["ended"] is False         # ended 2021-02-01 < Tv
    assert got["open_ended"] is True     # ends far in the future
    assert got["no_validity"] is False   # no event-time info at all


def test_snapshot_plan_no_shuffle(spark):
    plan = (
        kg_state_asof(_edges(spark), obs_ts=500, valid_ts=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
