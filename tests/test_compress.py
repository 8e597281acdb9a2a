"""Compression-ratio quality signal (functions/compress.py)."""

import zlib

from itext2kg_spark.functions.compress import compression_ratio


def test_exact_values_and_empty(spark):
    rows = [
        (0, "the cat sat on the mat and looked at the hat"),
        (1, "spam " * 200),          # highly repetitive -> tiny ratio
        (2, ""),                      # empty -> ratio 1.0 by contract
        (3, "a"),                     # compression overhead > 1 for tiny docs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for i, t in rows:
        b = t.encode()
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["n_compressed"] == len(zlib.compress(b, 6))
        want = (len(zlib.compress(b, 6)) / len(b)) if b else 1.0
        assert abs(got[i]["ratio"] - want) < 1e-12
    # the signal orders as the Gopher filter expects
    assert got[1]["ratio"] < got[0]["ratio"] < got[3]["ratio"]


def test_plan_is_single_arrow_pass_pruned(spark, tmp_path):
    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "x", "extra")], "doc_id long, text string, other string"
    ).write.parquet(p)
    df = compression_ratio(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    # column pruning reaches the parquet scan: only (doc_id, text) read
    scan_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "text" in scan_schema and "other" not in scan_schema
