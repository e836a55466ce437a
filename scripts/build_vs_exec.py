"""Aggregate build (plan construction) vs exec time across the registry.

One warmup pass, then N timed passes; reports totals so the plan-cache
prize is sized before committing to it.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catlas_spark import queries as Q
from catlas_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("build_vs_exec")
    qs = dict(sorted(Q.queries().items()))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # warmup
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warmup fail {name}: {e}", file=sys.stderr)
    builds = {n: [] for n in qs}
    execs = {n: [] for n in qs}
    for _ in range(passes):
        spark.catalog.clearCache()
        for name, fn in qs.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception:
                continue
            t2 = time.perf_counter()
            builds[name].append(t1 - t0)
            execs[name].append(t2 - t1)
    bmed = {n: statistics.median(v) for n, v in builds.items() if v}
    emed = {n: statistics.median(v) for n, v in execs.items() if v}
    print(f"total build: {sum(bmed.values()):.2f}s  total exec: {sum(emed.values()):.2f}s")
    top = sorted(bmed.items(), key=lambda kv: -kv[1])[:20]
    print("top-20 build:")
    for n, v in top:
        print(f"  {n:<40} build={v:.3f} exec={emed.get(n, -1):.3f}")


if __name__ == "__main__":
    main()
