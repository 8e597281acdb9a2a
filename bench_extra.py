"""Per-query optimization harness (guide §1) — NOT the driver bench.

`bench.py` is frozen for measurement; this sidecar isolates individual
queries for the optimization loop:

  * times `df.count()` (the driver bench's metric) best-of-N per query;
  * optionally times the noop sink (full-column compute, guide §1.4);
  * captures `.explain("formatted")` to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python bench_extra.py [--runs N] [--noop] [--plans TAG SUFFIX] [query ...]

Environment: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS, same as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop sink (full-column compute)")
    ap.add_argument("--plans", nargs=2, metavar=("TAG", "SUFFIX"),
                    help="write explain('formatted') to plans/TAG/<q>_SUFFIX.txt")
    ap.add_argument("--pipeline", action="store_true",
                    help="also time the 10k-doc KGPipeline run (docs/s)")
    args = ap.parse_args()
    names = args.queries or HEADLINE

    import __spark_entry__ as entry_mod
    from itext2kg_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        rec: dict = {}
        raw = []
        n = 0
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            raw.append(round(time.time() - t0, 3))
        rec["count_sec"] = min(raw)
        rec["count_raw"] = raw
        rec["rows"] = n
        if args.noop:
            raw_noop = []
            for _ in range(args.runs):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                raw_noop.append(round(time.time() - t0, 3))
            rec["noop_sec"] = min(raw_noop)
            rec["noop_raw"] = raw_noop
        if args.plans:
            tag, suffix = args.plans
            d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", tag)
            os.makedirs(d, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    if args.pipeline:
        from itext2kg_spark.pipeline import KGPipeline
        from itext2kg_spark.sources.pages import synth_pages

        spark.sparkContext.setJobDescription("bench_extra:pipeline10k")
        pipe = KGPipeline()
        raw = []
        for _ in range(args.runs):
            t0 = time.time()
            pages = synth_pages(spark, 10000, seed=42,
                                partitions=max(CPUS * 2, 16))
            pipe.build_graph(pages)[1].count()
            raw.append(round(time.time() - t0, 3))
        out["pipeline_10k"] = {
            "sec": min(raw), "raw": raw,
            "docs_per_sec": round(10000 / min(raw), 1),
        }
        print(f"# pipeline_10k: {json.dumps(out['pipeline_10k'])}",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
