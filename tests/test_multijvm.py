"""Separate-executor-JVM execution: the crawl must bit-match the
sequential oracle when executors are REAL separate processes
(``local-cluster[2,1,2048]`` — own heaps, own python workers, RPC to
the driver), not just local-mode threads.  Runs in a subprocess
because one JVM allows one SparkContext and the suite session is
local-mode.  This is the committed twin of the round-4 multi-JVM
scaling evidence (scripts/bench_multijvm.py, BENCH/multijvm_r4.log).
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import os, tempfile
import pyspark
os.environ.setdefault("SPARK_HOME", pyspark.__path__[0])
from cianparser_spark.engine.session import get_spark
from cianparser_spark.engine.crawler import CrawlEngine
from cianparser_spark.engine.compat import to_reference_rows
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator
from cianparser_spark.corpus import webgen as W

spark = get_spark(master="local-cluster[2,1,2048]", shuffle_partitions=2,
                  extra_conf={"spark.executorEnv.PYTHONPATH": %(root)r})
assert spark.sparkContext.master.startswith("local-cluster")
seed = CrawlSeed(1, "Казань", "flat", "sale", rooms=(1, 2),
                 additional_settings={"start_page": 1, "end_page": 4})
eng = CrawlEngine(spark, tempfile.mkdtemp(), [seed], W.DEFAULT_CONFIG,
                  host_tokens=4)
got = to_reference_rows(eng.run(), [seed])
sim = ReferenceSimulator(W.DEFAULT_CONFIG).run([seed])
assert got == sim.rows, (len(got), len(sim.rows))
print("MULTIJVM_OK", len(got))
"""


def test_local_cluster_bitmatch():
    r = subprocess.run(
        [sys.executable, "-c", _JOB % {"root": ROOT}],
        capture_output=True, text=True, timeout=600,
        cwd=ROOT, env={**os.environ, "PYTHONPATH": ROOT})
    assert "MULTIJVM_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
