"""Profile the crawl_faults workload per-phase (tick totals).

Usage: python scripts/prof_faults.py [host_tokens]
"""
import collections
import contextlib
import io
import re
import sys
import tempfile
import time

from cianparser_spark import truth
from cianparser_spark.engine.crawler import CrawlEngine
from cianparser_spark.engine.session import get_spark


def main():
    host_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    for flag in sys.argv[2:]:
        if flag == "noaqe":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        elif flag == "nocodegen":
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        elif flag == "nocodegenall":
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
            spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        print(f"flag: {flag}")
    seeds, cfg = truth.faults_seeds_and_cfg()
    # warmup engine plans on a cheap crawl
    seed0, cfg0 = truth.flagship_seed_and_cfg()
    CrawlEngine(spark, tempfile.mkdtemp(), [seed0], cfg0, host_tokens=256).run()

    d = tempfile.mkdtemp(prefix="prof_faults_")
    eng = CrawlEngine(spark, d, seeds, cfg, host_tokens=host_tokens)
    eng.verbose = True
    buf = io.StringIO()
    tracker = spark.sparkContext.statusTracker()
    jobs0 = max(tracker.getJobIdsForGroup(None) or [0])
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        eng.run()
    wall = time.time() - t0
    jobs1 = max(tracker.getJobIdsForGroup(None) or [0])
    n_jobs = jobs1 - jobs0

    agg = collections.Counter()
    n_waves = 0
    for line in buf.getvalue().splitlines():
        m = re.match(r"\s*\[(\S+)\] \+([\d.]+)s", line)
        if m:
            agg[m.group(1)] += float(m.group(2))
            if m.group(1) == "wave_start":
                n_waves += 1
    print(f"wall {wall:.1f}s, {n_waves} waves, ticked {sum(agg.values()):.1f}s, "
          f"{n_jobs} spark jobs ({n_jobs / max(n_waves, 1):.1f}/wave)")
    names = collections.Counter()
    for jid in range(jobs0 + 1, jobs1 + 1):
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        sts = [tracker.getStageInfo(s) for s in ji.stageIds]
        nm = ";".join(sorted({s.name.split(" at ")[-1] for s in sts if s}))
        names[nm] += 1
    for nm, c in names.most_common(25):
        print(f"  {c:3d}× {nm}")
    for k, v in agg.most_common():
        print(f"  {k:28s} {v:6.2f}s  ({v / max(n_waves, 1):.3f}s/wave)")


if __name__ == "__main__":
    main()
