"""Cluster entry point: merge one batch of pages into the canonical KG store.

Usage (local sandbox):
    python scripts/run_batch.py --pages <parquet_dir> --store <store_dir>

Usage (cluster — the north-rule deployment shape):
    spark-submit --py-files itext2kg_spark.zip scripts/run_batch.py \
        --pages s3://bucket/pages/batch=42 --store s3://bucket/kg

On a real cluster the store would be the Iceberg catalog tables; the parquet
KGStore implements the identical snapshot/MERGE contract here. Exit code 0 =
batch committed; the batch id and per-partition lineage are recorded in the
snapshot.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir with pages schema")
    ap.add_argument("--store", required=True, help="KG store root directory")
    ap.add_argument("--mode", default="atom", choices=["atom", "star"])
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--ent-threshold", type=float, default=None)
    ap.add_argument("--rel-threshold", type=float, default=None)
    args = ap.parse_args()

    from dataclasses import replace

    from itext2kg_spark.config import ATOM, STAR
    from itext2kg_spark.pipeline import KGPipeline
    from itext2kg_spark.session import get_spark
    from itext2kg_spark.sources.store import KGStore

    cfg = STAR if args.mode == "star" else ATOM
    match = cfg.match
    if args.ent_threshold is not None:
        match = replace(match, ent_threshold=args.ent_threshold)
    if args.rel_threshold is not None:
        match = replace(match, rel_threshold=args.rel_threshold)
    cfg = replace(cfg, match=match)

    spark = get_spark(app_name="kg-run-batch", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    pages = spark.read.parquet(args.pages)
    store = KGStore(args.store)
    pipe = KGPipeline(cfg)
    batch_id = pipe.run_batch(pages, store)
    ents, edges = store.load(spark)
    print(
        f"committed batch={batch_id} entities={ents.count()} edges={edges.count()}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
