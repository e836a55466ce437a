"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology (steady-state, TPC-style):
- Each query executes with a no-op sink (format("noop")) so timing
  measures the full distributed plan without driver-side collect overhead.
- Pass 1 runs every query once as WARMUP — it absorbs the one-time JVM
  JIT + whole-stage-codegen compile cost (~0.3-2 s/query), which on a
  long-lived cluster is paid once per plan shape, not per query.
- Cached intermediates are dropped (clearCache) after warmup so the
  timed pass re-executes the full compute, not a cache hit.
- Pass 2 is the reported timing. "cold_total_seconds" (pass 1) is also
  emitted so both regimes are visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from catlas_spark import queries as Q
from catlas_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # stable name order: queries() is ordered for the driver's correctness
    # window (least-recently-verified first), which reshuffles every round;
    # bench artifacts should diff cleanly round-over-round
    qs = dict(sorted(Q.queries().items()))
    # warm up the JVM + parquet footers with the cheapest scan
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    cold: dict[str, float] = {}
    for name, fn in qs.items():
        try:
            cold[name] = round(run_query(fn, spark, SF_DIR), 3)
        except Exception as e:
            print(f"bench warmup error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            cold[name] = -1.0
    # drop persisted intermediates: the timed pass must re-run the full
    # compute (JIT-warm), not read a cached signature table
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if cold[name] < 0:
            timings[name] = -1.0
            continue
        try:
            timings[name] = round(run_query(fn, spark, SF_DIR), 3)
        except Exception as e:  # record failures as -1 so they're visible
            print(f"bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total_seconds": cold_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
