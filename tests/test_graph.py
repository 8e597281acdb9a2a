"""Graph read-side queries: degrees and k-hop BFS."""

import pyspark.sql.functions as F

from itext2kg_spark.functions.graph import degrees, k_hop

#   a -> b -> c -> d,  a -> c,  e -> a,  isolated pair: x -> y
EDGES = [
    ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"),
    ("a", "r", "c"), ("e", "r", "a"), ("x", "r", "y"),
    ("a", "s", "b"),  # parallel edge with a different predicate
]


def _edges(spark):
    return spark.createDataFrame(
        EDGES, "src_name string, pred string, dst_name string"
    )


def test_degrees(spark):
    out = {r["name"]: r for r in degrees(_edges(spark)).collect()}
    assert out["a"]["out_edges"] == 3          # a->b (x2 preds), a->c
    assert out["a"]["out_neighbors"] == 2      # {b, c}
    assert out["a"]["in_edges"] == 1 and out["a"]["in_neighbors"] == 1
    assert out["d"]["out_edges"] == 0 and out["d"]["in_edges"] == 1
    assert out["y"]["in_neighbors"] == 1
    assert set(out) == {"a", "b", "c", "d", "e", "x", "y"}


def test_k_hop_directed_min_distance(spark):
    seeds = _edges(spark).sparkSession.createDataFrame(
        [("a",)], "name string"
    )
    out = {r["name"]: r["dist"] for r in k_hop(_edges(spark), seeds, k=2).collect()}
    # c is reachable in 1 (a->c) and 2 (a->b->c): min wins
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_k_hop_undirected_and_multi_seed(spark):
    spark_edges = _edges(spark)
    seeds = spark.createDataFrame([("d",), ("x",)], "name string")
    out = {r["name"]: r["dist"]
           for r in k_hop(spark_edges, seeds, k=1, directed=False).collect()}
    assert out == {"d": 0, "x": 0, "c": 1, "y": 1}


def test_k_hop_plan_has_no_cartesian(spark):
    seeds = spark.createDataFrame([("a",)], "name string")
    out = k_hop(_edges(spark), seeds, k=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
