"""Binned interval-overlap join (functions/intervals.py)."""

import itertools
import random

import pytest

from itext2kg_spark.functions.intervals import interval_join


def _naive(lrows, rrows):
    out = set()
    for l, r in itertools.product(lrows, rrows):
        if l[0] == r[0] and l[2] <= r[3] and r[2] <= l[3]:
            out.add((l[0], l[1], r[1], max(l[2], r[2]), min(l[3], r[3])))
    return out


def _dfs(spark, lrows, rrows):
    left = spark.createDataFrame(
        lrows, "k long, l_id long, l_start long, l_end long"
    )
    right = spark.createDataFrame(
        rrows, "k long, r_id long, r_start long, r_end long"
    )
    return left, right


def test_matches_naive_product_randomized(spark):
    rng = random.Random(7)
    lrows, rrows = [], []
    for i in range(120):
        s = rng.randrange(0, 5000)
        lrows.append((rng.randrange(3), i, s, s + rng.randrange(0, 900)))
    for i in range(120):
        s = rng.randrange(0, 5000)
        rrows.append((rng.randrange(3), i, s, s + rng.randrange(0, 900)))
    left, right = _dfs(spark, lrows, rrows)
    for w in (60, 400, 7000):  # small, typical, larger-than-range widths
        got = {
            (r["k"], r["l_id"], r["r_id"], r["overlap_start"], r["overlap_end"])
            for r in interval_join(left, right, ["k"], bin_width=w).collect()
        }
        assert got == _naive(lrows, rrows), f"bin_width={w}"


def test_each_pair_exactly_once(spark):
    # long intervals covering many shared bins must still emit one row
    left, right = _dfs(spark, [(0, 1, 0, 10_000)], [(0, 2, 5, 9_000)])
    rows = interval_join(left, right, ["k"], bin_width=100).collect()
    assert len(rows) == 1
    assert rows[0]["overlap_start"] == 5 and rows[0]["overlap_end"] == 9_000


def test_touching_and_disjoint(spark):
    left, right = _dfs(
        spark, [(0, 1, 0, 100)], [(0, 2, 100, 200), (0, 3, 101, 200)]
    )
    got = {r["r_id"] for r in interval_join(left, right, ["k"], 50).collect()}
    assert got == {2}  # closed intervals touch at 100; 101 is disjoint


def test_bad_width_raises(spark):
    left, right = _dfs(spark, [(0, 1, 0, 1)], [(0, 2, 0, 1)])
    with pytest.raises(ValueError):
        interval_join(left, right, ["k"], bin_width=0)


def test_plan_is_equi_join_not_nested_loop(spark):
    left, right = _dfs(spark, [(0, 1, 0, 1)], [(0, 2, 0, 1)])
    df = interval_join(left, right, ["k"], bin_width=60)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan