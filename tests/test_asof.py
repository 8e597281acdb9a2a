"""As-of join: backward semantics, ties, tolerance, plan shape, and
brute-force equivalence on randomized data."""

import datetime as dt
import random

import pyspark.sql.functions as F

from itext2kg_spark.functions.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows, schema):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), *rest)
         for i, (s, *rest) in enumerate(rows)],
        schema,
    )


def _us(s):
    return int(
        (T0 + dt.timedelta(seconds=s)).replace(tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )


def test_asof_backward_and_ties(spark):
    left = _df(spark, [(100, 1), (200, 1), (50, 2), (300, 3)],
               "event_id long, ts timestamp, user_id long")
    right = _df(spark, [
        (100, 1, 10.0),   # exactly at left ts=100: matches it
        (150, 1, 20.0),
        (60, 2, 30.0),    # after left user2 ts=50: no match
    ], "rid long, ts timestamp, user_id long, value double")
    out = {r["event_id"]: r for r in
           asof_join(left, right.drop("rid"), on="user_id").collect()}
    assert out[0]["right_value"] == 10.0          # at-or-before includes ties
    assert out[0]["right_ts_us"] == _us(100)
    assert out[1]["right_value"] == 20.0          # latest preceding
    assert out[2]["right_value"] is None          # right is later
    assert out[3]["right_value"] is None          # user has no right rows
    assert len(out) == 4                          # left join: all kept


def test_asof_tolerance(spark):
    left = _df(spark, [(1000, 1)], "event_id long, ts timestamp, user_id long")
    right = _df(spark, [(100, 1, 5.0)],
                "rid long, ts timestamp, user_id long, value double")
    ok = asof_join(left, right.drop("rid"), on="user_id",
                   tolerance_s=1000).collect()[0]
    assert ok["right_value"] == 5.0
    far = asof_join(left, right.drop("rid"), on="user_id",
                    tolerance_s=899).collect()[0]
    assert far["right_value"] is None


def test_asof_single_shuffle_no_python(spark):
    left = _df(spark, [(s, 1 + s % 3) for s in range(0, 300, 10)],
               "event_id long, ts timestamp, user_id long")
    right = _df(spark, [(s, 1 + s % 3, float(s)) for s in range(0, 300, 7)],
                "rid long, ts timestamp, user_id long, value double")
    out = asof_join(left, right.drop("rid"), on="user_id")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1  # union -> one window
    assert "EvalPython" not in final
    assert "CartesianProduct" not in final and "BroadcastNestedLoop" not in final


def test_asof_matches_bruteforce(spark):
    rng = random.Random(7)
    lrows = [(rng.randrange(0, 10_000), rng.randrange(1, 20))
             for _ in range(300)]
    rrows = [(rng.randrange(0, 10_000), rng.randrange(1, 20),
              float(rng.randrange(1000)))
             for _ in range(300)]
    left = _df(spark, lrows, "event_id long, ts timestamp, user_id long")
    right = _df(spark, rrows,
                "rid long, ts timestamp, user_id long, value double")
    got = {r["event_id"]: (r["right_ts_us"], r["right_value"])
           for r in asof_join(left, right.drop("rid"), on="user_id").collect()}
    # brute force: max right (ts, value) per left row with ts <= left ts
    by_user: dict = {}
    for s, u, v in rrows:
        by_user.setdefault(u, []).append((_us(s), v))
    for i, (s, u) in enumerate(lrows):
        cands = [rv for rv in by_user.get(u, []) if rv[0] <= _us(s)]
        want = max(cands) if cands else (None, None)
        assert got[i] == want, (i, got[i], want)
