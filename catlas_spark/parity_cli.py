"""Parity/validation CLI — the reference's ``bin/get_parities.py`` and
``bin/optimize_frame.py`` entry points (SURVEY.md §3.2-3.3) on the Spark
parity module.

Usage:
    python -m catlas_spark.parity_cli --output /tmp/parity           # fixtures
    python -m catlas_spark.parity_cli --validation path.parquet --output out
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Parity analytics")
    ap.add_argument("--validation", default=None, help="parquet path (default: fixtures)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--adsorbates", nargs="*", default=None, help="SMILES filter")
    args = ap.parse_args(argv)

    from .parity import best_frame, frame_error_curve, parity_summary
    from .session import get_spark
    from .sources import fixtures

    spark = get_spark("catlas_spark.parity")
    val = (
        spark.read.parquet(args.validation)
        if args.validation
        else fixtures.make_validation(spark)
    )
    if args.adsorbates:
        from pyspark.sql import functions as F

        val = val.filter(F.col("adsorbate").isin(args.adsorbates))

    os.makedirs(args.output, exist_ok=True)
    summary = [r.asDict() for r in parity_summary(val).collect()]
    frames = [r.asDict() for r in best_frame(val).collect()]
    frame_error_curve(val).write.mode("overwrite").parquet(
        os.path.join(args.output, "frame_curve")
    )
    with open(os.path.join(args.output, "parity_summary.json"), "w") as f:
        json.dump({"per_distribution": summary, "best_frames": frames}, f, indent=2)
    print(json.dumps({"per_distribution": summary, "best_frames": frames}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
