"""Dump FULL `.explain("formatted")` output for a list of queries into
per-query text files — the per-round optimization evidence
(`plans/r<N>/<query>_{before,after}.txt`).

Usage:
    python scripts/dump_round_plans.py OUTDIR SUFFIX QUERY [QUERY ...]

e.g. run at HEAD:
    python scripts/dump_round_plans.py plans/r11 after dedup_containment ...
and in a worktree checked out at the previous round's commit:
    python scripts/dump_round_plans.py /root/repo/plans/r11 before ...

Unlike dump_plans.py (PLANS.md excerpts, tree only), this keeps the
numbered-operator detail section so PushedFilters / ReadSchema / join
build sides are inspectable.  For queries flagged by the tiny-input
execution profile the plan is ALSO dumped under that profile's confs
(AQE off, TINY_EXEC_PARTITIONS shuffle partitions) when the registry
supports it, because that is the shape the bench executes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from catlas_spark import queries as Q  # noqa: E402
from catlas_spark.session import get_spark  # noqa: E402


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("round-plans")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from catlas_spark.caching import lazy_plans

    qs = Q.queries()
    tiny_exec = getattr(Q, "TINY_EXEC_PARTITIONS", None)
    for name in names:
        if name not in qs:
            out = f"(query `{name}` does not exist at this commit)\n"
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(out)
            print(f"wrote {path} (absent)", file=sys.stderr)
            continue
        with lazy_plans():
            df = qs[name](spark, sf)
        header = (
            f"# {name} — {suffix} ({os.path.basename(sf)}, "
            "explain('formatted'))\n\n"
        )
        body = _explain(df)
        tiny_note = ""
        # if this plan lands in the tiny class, ALSO dump the executed
        # shape (the bench-hit path runs with AQE off / few partitions) —
        # to a SEPARATE .tiny.txt file (r11 verdict item 8: an embedded
        # second plan inflates raw Exchange counts, so exchange-count
        # claims could not be diffed mechanically from one file).
        # _PLAN_TINY is only populated on the materializing cache path,
        # so re-derive tininess directly from the plan-size estimate.
        if tiny_exec is not None:
            from catlas_spark.partitioning import plan_size_bytes

            if plan_size_bytes(df) < Q.TINY_EXEC_MAX_BYTES:
                prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
                prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
                spark.conf.set("spark.sql.adaptive.enabled", "false")
                spark.conf.set("spark.sql.shuffle.partitions", str(tiny_exec))
                try:
                    tiny_note = (
                        f"# {name} — {suffix} tiny-input execution profile "
                        f"(AQE off, {tiny_exec} shuffle partitions — the "
                        "shape the bench executes for this plan):\n\n"
                        + _explain(df)
                    )
                finally:
                    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
                    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header + body)
        print(f"wrote {path}", file=sys.stderr)
        if tiny_note:
            tiny_path = os.path.join(outdir, f"{name}_{suffix}.tiny.txt")
            with open(tiny_path, "w") as f:
                f.write(tiny_note)
            print(f"wrote {tiny_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
