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

# one plotted point per (distribution, row) up to this cap — the plot is a
# driver-side artifact; the cap keeps the collect bounded at any corpus size
_MAX_PLOT_POINTS = 5000


def write_parity_pdf(val, summary_rows: list[dict], out_dir: str) -> str | None:
    """PDF parity scatter (reference `catlas/parity/parity_utils.py:19-103`
    — K5): DFT vs final-frame ML energy colored per distribution, y=x
    guide, annotated with each distribution's MAE/slope from the
    Spark-side summary (the numbers are computed distributed; only the
    capped point sample is collected for drawing).

    Plot libraries are optional in this runtime — returns None and writes
    nothing when matplotlib is missing; the JSON/parquet outputs carry
    the same numbers either way (same gating pattern as the Sankey PNG).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    from pyspark.sql import functions as F

    pts = (
        val.filter(F.col("good_trajectory"))
        .select(
            "distribution",
            "DFT_energy",
            F.element_at(F.col("ML_energy"), -1).alias("ml"),
        )
        .limit(_MAX_PLOT_POINTS)
        .collect()
    )
    by_dist: dict[str, list] = {}
    for r in pts:
        by_dist.setdefault(r.distribution, []).append((r.DFT_energy, r.ml))
    fig, ax = plt.subplots(figsize=(6, 6))
    for dist, xy in sorted(by_dist.items()):
        ax.scatter([x for x, _ in xy], [y for _, y in xy], s=6, alpha=0.4, label=dist)
    lims = ax.get_xlim()
    ax.plot(lims, lims, "k--", linewidth=1)
    stats = "\n".join(
        f"{s['distribution']}: MAE={s['mae']:.3f} slope={s['slope']:.3f}"
        for s in summary_rows
        if "mae" in s
    )
    ax.text(0.02, 0.98, stats, transform=ax.transAxes, va="top", fontsize=8)
    ax.set_xlabel("DFT energy (eV)")
    ax.set_ylabel("ML energy (eV)")
    ax.legend(fontsize=8)
    path = os.path.join(out_dir, "parity.pdf")
    fig.savefig(path, format="pdf", bbox_inches="tight")
    plt.close(fig)
    return path


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
    pdf = write_parity_pdf(val, summary, args.output)
    out = {"per_distribution": summary, "best_frames": frames, "pdf": pdf}
    with open(os.path.join(args.output, "parity_summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
