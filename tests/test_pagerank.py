"""PageRank: numpy power-iteration parity, dangling mass, invariants."""

import numpy as np
import pyspark.sql.functions as F

from itext2kg_spark.functions.pagerank import pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d has no in-edges
    ("c", "e"),            # e is dangling (no out-edges)
]


def _np_pagerank(edges, iters, d=0.85):
    names = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    out = {i: [] for i in range(n)}
    for s, t in set(edges):
        out[idx[s]].append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dm = sum(r[i] for i in range(n) if not out[i])
        nxt += d * dm / n
        for i, ts in out.items():
            for t in ts:
                nxt[t] += d * r[i] / len(ts)
        r = nxt
    return {names[i]: r[i] for i in range(n)}


def test_pagerank_matches_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, "src_name string, dst_name string")
    got = {r["name"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    want = _np_pagerank(EDGES, iters=5)
    assert set(got) == set(want)
    for name in want:
        assert abs(got[name] - want[name]) < 1e-9, name
    # mass conservation: dangling redistribution keeps sum(rank) == 1
    # (tolerance = n * half-ulp of the final round(,9))
    assert abs(sum(got.values()) - 1.0) < len(got) * 0.5e-9
    # structural sanity: the hub c outranks everything; d (no in-edges)
    # sits at the floor
    assert got["c"] == max(got.values())
    assert got["d"] == min(got.values())


def test_pagerank_duplicate_edges_collapse(spark):
    dup = spark.createDataFrame(
        EDGES + EDGES[:3], "src_name string, dst_name string"
    )
    edges = spark.createDataFrame(EDGES, "src_name string, dst_name string")
    a = sorted(map(tuple, pagerank(dup, iters=3).collect()))
    b = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    assert a == b


def test_pagerank_plan_no_python(spark):
    edges = spark.createDataFrame(EDGES, "src_name string, dst_name string")
    out = pagerank(edges, iters=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
