"""Multi-executor topology smoke (north rule: the pipeline must run across
real executor JVMs, not just local[n]'s single shared JVM).

local-cluster[2,2,*] spawns two REAL executor processes with their own heaps,
Python worker pools, and a network shuffle between them — the closest
spark-submit-on-a-cluster stand-in a single host offers. The test runs the
full build_graph (distill -> extract -> embed -> similarity merge) on both
topologies with the same seed and asserts identical canonical entity/edge
counts: the engine's results must not depend on executor placement.

Runs in a subprocess because get_spark_cluster's getOrCreate would otherwise
return the pytest session's local[4] session instead of a cluster one.
"""

import os
import subprocess
import sys

_CHILD = """
import sys
sys.path.insert(0, {root!r})
from itext2kg_spark.session import get_spark_cluster
from itext2kg_spark.pipeline import KGPipeline
from itext2kg_spark.sources.pages import synth_pages

spark = get_spark_cluster(n_executors=2, cores_per_executor=2,
                          executor_mem_mb=2048)
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext.master == "local-cluster[2,2,2048]"
ents, edges = KGPipeline().build_graph(synth_pages(spark, 60, seed=101))
print("CLUSTER_RESULT", ents.count(), edges.count())
spark.stop()
"""


def test_multi_executor_matches_local(spark):
    from itext2kg_spark.pipeline import KGPipeline
    from itext2kg_spark.sources.pages import synth_pages

    ents, edges = KGPipeline().build_graph(synth_pages(spark, 60, seed=101))
    n_ents, n_edges = ents.count(), edges.count()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c", _CHILD.format(root=root)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    line = next(
        (l for l in res.stdout.splitlines() if l.startswith("CLUSTER_RESULT")),
        None,
    )
    assert line is not None, f"cluster child failed:\n{res.stdout[-1000:]}\n{res.stderr[-1000:]}"
    _, c_ents, c_edges = line.split()
    assert (int(c_ents), int(c_edges)) == (n_ents, n_edges)
