"""Scale probe for the event-time operators (sessionize / windowed / as-of):
times each at sf0.1 (100k events) and on a 10M-row deterministic synthetic
events table (100x), reporting ratio_vs_linear = t_100x / (100 * t_1x).
The synthetic table includes a hot user holding ~10% of all events — the
bot-skew case the single-user_id-exchange design must absorb.

Usage: python scripts/events_scale_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from itext2kg_spark.functions.asof import asof_join  # noqa: E402
from itext2kg_spark.functions.sessions import (  # noqa: E402
    session_stats,
    windowed_counts,
)
from itext2kg_spark.session import get_spark  # noqa: E402
from itext2kg_spark.sources.events import synth_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BIG = int(os.environ.get("EVENTS_PROBE_N", "10000000"))


def run_suite(spark, events, label):
    out = {}
    t0 = time.time()
    n = session_stats(events, gap_s=1800).count()
    out["sessionize"] = {"sec": round(time.time() - t0, 2), "rows": n}
    t0 = time.time()
    n = windowed_counts(events, window_s=300).count()
    out["windowed"] = {"sec": round(time.time() - t0, 2), "rows": n}
    left = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    t0 = time.time()
    n = asof_join(left, right, on="user_id").count()
    out["asof"] = {"sec": round(time.time() - t0, 2), "rows": n}
    print(f"# {label}: {out}", file=sys.stderr)
    return out


def main():
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    small = spark.read.parquet(f"{SF_DIR}/events.parquet").localCheckpoint()
    n_small = small.count()
    r1 = run_suite(spark, small, f"events {n_small}")
    big = synth_events(spark, N_BIG)
    factor = N_BIG / n_small
    r2 = run_suite(spark, big, f"events {N_BIG} (hot user ~10%)")
    report = {"n_small": n_small, "n_big": N_BIG}
    for op in r1:
        report[op] = {
            "sec_1x": r1[op]["sec"],
            "sec_big": r2[op]["sec"],
            "rows_big": r2[op]["rows"],
            "ratio_vs_linear": round(
                r2[op]["sec"] / (factor * r1[op]["sec"]), 3
            ) if r1[op]["sec"] else None,
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
