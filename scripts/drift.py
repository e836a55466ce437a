"""Separate code effects from box effects between two bench details.

The judge's r8 methodology, scripted: on identical code, host drift
shows up as a roughly UNIFORM per-query multiplier (r8 measured a 1.29x
median inflation with simultaneous DuckDB deflation; r9 reproduced
1.27x), while a real plan change moves only its own queries. Comparing
totals across box states conflates the two; comparing the per-query
ratio DISTRIBUTION separates them:

- median ratio  ~= the box multiplier (drift),
- queries far BELOW it = real wins, far ABOVE it = real regressions.

Usage:
    python scripts/drift.py OLD_DETAIL.json NEW_DETAIL.json [--top N]

Prints the median multiplier, the drift-corrected new total
(new_total / median), and the outlier queries on both sides with their
raw seconds. Works on BENCH_DETAIL*.json and DUCK_DETAIL*.json alike
(any {"queries": {name: sec}} file).
"""

from __future__ import annotations

import json
import statistics
import sys

# ratios on sub-50ms rows are scheduling noise, not signal
MIN_BASE_SEC = 0.05


def main() -> int:
    argv = list(sys.argv[1:])
    top = 8
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]  # the VALUE must not leak into positionals
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    old_doc = json.load(open(args[0]))
    new_doc = json.load(open(args[1]))
    old = old_doc["queries"]
    new = new_doc["queries"]
    common = [k for k in new if k in old and old[k] >= MIN_BASE_SEC]
    if not common:
        print("no comparable queries")
        return 1
    ratios = {k: new[k] / old[k] for k in common}
    med = statistics.median(ratios.values())
    # totals over the COMMON key set only (shared keys regardless of the
    # MIN_BASE_SEC ratio filter): summing each side's full set compares
    # different workloads the moment a bench is added or removed, and the
    # drift correction then "corrects" a total the multiplier never
    # sampled. Full-set totals reported alongside for context.
    shared = [k for k in new if k in old]
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)
    out = {
        "n_common": len(common),
        "n_shared": len(shared),
        # variance gate passthrough: a detail whose producer flagged
        # noise-spiked rows (bench.py / compare_duckdb MAD gate) is not
        # a clean baseline for drift analysis — surface it here so a
        # comparison against an unstable artifact is self-describing
        "unstable_rows": {
            "old": old_doc.get("unstable", []),
            "new": new_doc.get("unstable", []),
        },
        "median_multiplier": round(med, 3),
        "total_old_sec": round(tot_old, 2),
        "total_new_sec": round(tot_new, 2),
        "total_new_drift_corrected_sec": round(tot_new / med, 2),
        "full_set_totals": {
            "old": round(sum(old.values()), 2),
            "new": round(sum(new.values()), 2),
        },
        "wins": [
            {"query": k, "x": round(ratios[k], 2), "old": old[k], "new": new[k]}
            for k in sorted(common, key=lambda k: ratios[k])[:top]
            if ratios[k] < med * 0.8
        ],
        "regressions": [
            {"query": k, "x": round(ratios[k], 2), "old": old[k], "new": new[k]}
            for k in sorted(common, key=lambda k: -ratios[k])[:top]
            if ratios[k] > med * 1.25
        ],
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
