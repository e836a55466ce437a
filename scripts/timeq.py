"""Time individual registry queries (warm medians) for perf iteration.

Usage: python scripts/timeq.py q1 [q2 ...] [--sf DIR] [--passes N] [--explain]

Mirrors bench.py methodology (noop sink, 1 warmup + N warm passes,
per-query median) so numbers here are comparable to BENCH_DETAIL.json
rows from the same box state.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catlas_spark import queries as Q
from catlas_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    n_passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        n_passes = int(args[i + 1])
        del args[i : i + 2]
    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    # unknown flags error (r8 review): '--pases 7' used to be silently
    # dropped, timing under defaults the user did not ask for
    bad = [a for a in args if a.startswith("--")]
    if bad:
        raise SystemExit(f"unknown flags: {bad} (supported: --sf DIR, --passes N, --explain)")

    spark = get_spark("timeq")
    qs = Q.queries()
    unknown = [n for n in args if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in args:
        fn = qs[name]
        if explain:
            fn(spark, sf_dir).explain("formatted")
        # warmup
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(n_passes):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        print(
            f"{name}: warm_median={med:.3f}s cold={cold:.3f}s "
            f"runs={[round(r, 3) for r in runs]}"
        )


if __name__ == "__main__":
    main()
