"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS],
plus the two-parallelism scaling run (local[8] vs local[32] standing in for N
vs 4N executors — no real cluster in this sandbox).

Prints ONE JSON line:
  {"metric": "headline_suite", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>,
   "docs_per_sec": ..., "scaling": {"cores_lo": .., "cores_hi": ..,
   "docs_per_sec_lo": .., "docs_per_sec_hi": .., "efficiency": ..}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING_PAGES = int(os.environ.get("BENCH_SCALING_PAGES", "20000"))
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"

HEADLINE = [
    "kg_build_graph",
    "kg_grammar_pipeline",
    "kg_exact_merge_edges",
    "dedup_ngram",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding",
    "ann_topk",
    "text_stats",
]


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from itext2kg_spark.session import get_spark

    s = get_spark(app_name=f"bench-{cores}", cores=cores,
                  shuffle_partitions=max(cores, 8))
    s.sparkContext.setLogLevel("ERROR")
    return s


def _pipeline_run(spark, n_pages: int) -> int:
    """The scaling workload: synth pages -> distill -> extract -> embed ->
    similarity merge -> canonical edge count (full KG construction path)."""
    from itext2kg_spark.pipeline import KGPipeline
    from itext2kg_spark.sources.pages import synth_pages

    pipe = KGPipeline()
    pages = synth_pages(spark, n_pages, seed=42, partitions=max(CPUS * 2, 16))
    _, edges = pipe.build_graph(pages)
    return edges.count()


def main():
    import __spark_entry__ as entry_mod

    results: dict[str, float] = {}
    spark = _fresh_spark(CPUS)
    qs = entry_mod.queries()

    total0 = time.time()
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        results[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {results[name]}s", file=sys.stderr)
    total = round(time.time() - total0, 3)

    # throughput: full-pipeline docs/sec at the configured core count
    t0 = time.time()
    n_docs = 10000
    _pipeline_run(spark, n_docs)
    pipe_t = time.time() - t0
    docs_per_sec = round(n_docs / pipe_t, 1)
    print(f"# pipeline {n_docs} docs in {pipe_t:.1f}s -> {docs_per_sec} docs/s",
          file=sys.stderr)

    out = {
        "metric": "headline_suite",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "docs_per_sec": docs_per_sec,
    }

    if not SKIP_SCALING:
        scaling = {}
        lo, hi = max(CPUS // 4, 2), CPUS
        for cores in (hi, lo, hi):  # hi first run warms JIT; re-run hi after lo
            s = _fresh_spark(cores)
            t0 = time.time()
            _pipeline_run(s, SCALING_PAGES)
            dt = time.time() - t0
            scaling[cores] = round(SCALING_PAGES / dt, 1)
            print(f"# scaling local[{cores}]: {dt:.1f}s "
                  f"({scaling[cores]} docs/s)", file=sys.stderr)
        eff = (scaling[hi] / scaling[lo]) / (hi / lo)
        out["scaling"] = {
            "cores_lo": lo,
            "cores_hi": hi,
            "docs_per_sec_lo": scaling[lo],
            "docs_per_sec_hi": scaling[hi],
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
