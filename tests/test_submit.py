"""North-rule ship path: the job must run via ``spark-submit
--py-files dist/cianparser_spark.zip`` on a multi-executor cluster.

This smoke test builds the zip (scripts/make_pyfiles.py), then
spark-submits a REAL crawl job from a scratch cwd with the repo
stripped from PYTHONPATH — so every driver- and executor-side import
(engine, corpus renderer inside the Arrow batches, semantics) must
resolve from the zip exactly as it would on a real cluster.  The job
itself bit-matches the facade against the sequential simulator, so a
green run certifies the packaged artifact, not just the import."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import sys
from cianparser_spark.engine.session import get_spark
from cianparser_spark.engine.facade import CianParser
from cianparser_spark.corpus import webgen as W
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator

spark = get_spark(master="local[2]", shuffle_partitions=2)
rows = CianParser("Казань", spark=spark, web_cfg=W.DEFAULT_CONFIG,
                  host_tokens=4).get_flats(
    deal_type="sale", rooms=1, additional_settings={"end_page": 2})
sim = ReferenceSimulator(W.DEFAULT_CONFIG).run(
    [CrawlSeed(1, "Казань", "flat", "sale", rooms=1,
               additional_settings={"end_page": 2})])
assert rows == sim.rows, "packaged crawl != simulator"
print("SUBMIT_OK", len(rows))
"""


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles():
    subprocess.run([sys.executable, os.path.join(ROOT, "scripts", "make_pyfiles.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(ROOT, "dist", "cianparser_spark.zip")
    assert os.path.exists(zip_path)

    workdir = tempfile.mkdtemp(prefix="submit_")
    job = os.path.join(workdir, "job.py")
    with open(job, "w", encoding="utf-8") as fh:
        fh.write(_JOB)

    env = dict(os.environ)
    # the repo must NOT be importable except through --py-files
    env.pop("PYTHONPATH", None)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        [_spark_submit_bin(), "--master", "local[2]",
         "--py-files", zip_path, job],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_OK" in proc.stdout, (proc.stdout[-2000:], proc.stderr[-2000:])
    shutil.rmtree(workdir, ignore_errors=True)
