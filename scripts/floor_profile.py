"""Decompose the per-query fixed floor on tiny registry queries.

For each named query, measures (warm):
  build_s   — Python-side DataFrame construction (plan building + py4j)
  exec_s    — noop-sink execution
  jobs      — Spark jobs launched by the execution (status tracker delta)
  stages    — stages launched
  tasks     — total tasks launched
and repeats under AQE on/off so the AQE job overhead is visible.

Usage: python scripts/floor_profile.py q1 [q2 ...] [--sf DIR] [--passes N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catlas_spark import queries as Q
from catlas_spark.session import get_spark


def measure(spark, fn, sf_dir, passes):
    tracker = spark.sparkContext.statusTracker()
    builds, execs, jobs, stages, tasks = [], [], [], [], []
    for _ in range(passes):
        spark.catalog.clearCache()
        j0 = tracker.getJobIdsForGroup(None)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j1 = tracker.getJobIdsForGroup(None)
        new_jobs = set(j1) - set(j0)
        n_stages = 0
        n_tasks = 0
        for jid in new_jobs:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    n_stages += 1
                    n_tasks += sinfo.numTasks
        builds.append(t1 - t0)
        execs.append(t2 - t1)
        jobs.append(len(new_jobs))
        stages.append(n_stages)
        tasks.append(n_tasks)
    return (
        statistics.median(builds),
        statistics.median(execs),
        statistics.median(jobs),
        statistics.median(stages),
        statistics.median(tasks),
    )


def main():
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]

    spark = get_spark("floor_profile")
    qs = Q.queries()
    names = args or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    print(f"{'query':<36} {'aqe':<4} {'build_s':>8} {'exec_s':>8} {'jobs':>5} {'stages':>7} {'tasks':>6}")
    for name in names:
        fn = qs[name]
        # warmup once (codegen compile)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            b, e, j, s, t = measure(spark, fn, sf_dir, passes)
            print(f"{name:<36} {aqe:<4} {b:>8.3f} {e:>8.3f} {j:>5.0f} {s:>7.0f} {t:>6.0f}")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
