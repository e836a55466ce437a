"""A/B the tiny-query execution profile: AQE on/32 partitions (default)
vs AQE off/8 partitions, on cached plans (build excluded). Prints per-query
medians and totals for each profile over all lazy registry queries.
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
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("aqe_ab")
    qs = dict(sorted(Q.queries().items()))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # two sightings so lazy queries are plan-cached
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir)
        except Exception:
            pass
    lazy = sorted(n for n, v in Q._PLAN_LAZY.items() if v is True)
    print(f"{len(lazy)} lazy queries cached")
    results = {}
    for label, conf in (
        ("aqe_on_32", {"spark.sql.adaptive.enabled": "true", "spark.sql.shuffle.partitions": "32"}),
        ("aqe_off_8", {"spark.sql.adaptive.enabled": "false", "spark.sql.shuffle.partitions": "8"}),
        ("aqe_on_8", {"spark.sql.adaptive.enabled": "true", "spark.sql.shuffle.partitions": "8"}),
    ):
        med = {}
        for name in lazy:
            df = qs[name](spark, sf_dir)
            for k, v in conf.items():
                spark.conf.set(k, v)
            runs = []
            for _ in range(passes):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            med[name] = statistics.median(runs)
        results[label] = med
        print(f"{label}: total={sum(med.values()):.2f}s")
    base = results["aqe_on_32"]
    for label in ("aqe_off_8", "aqe_on_8"):
        alt = results[label]
        deltas = sorted(
            ((alt[n] - base[n], n) for n in base), key=lambda t: t[0]
        )
        print(f"\n{label} vs aqe_on_32: top wins")
        for d, n in deltas[:12]:
            print(f"  {n:<40} {base[n]:.3f} -> {alt[n]:.3f} ({d:+.3f})")
        print(f"{label} top regressions")
        for d, n in deltas[-6:]:
            print(f"  {n:<40} {base[n]:.3f} -> {alt[n]:.3f} ({d:+.3f})")


if __name__ == "__main__":
    main()
