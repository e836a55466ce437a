"""Parity / validation analytics (reference §3.2-3.3).

Re-expresses `bin/get_parities.py` + `catlas/parity/parity_utils.py:206-243`
(per-split MAE, regression slope/intercept/R) and `bin/optimize_frame.py:73-96`
(per-adsorbate argmin over per-frame mean error) as pure DataFrame
aggregations — `regr_slope`/`regr_intercept`/`corr` are native Spark
aggregates; the frame curve is posexplode → groupBy(pos) → avg → min_by.
The reference loops in pandas per split/frame; these are single-shuffle
grouped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parity_summary(validation: DataFrame, frame: int = -1) -> DataFrame:
    """Per-distribution parity metrics: N, MAE, slope, intercept, R.

    ``frame`` selects which ML_energy frame to compare (-1 = final,
    matching the reference's use of the relaxed energy).
    """
    ml = (
        F.element_at(F.col("ML_energy"), F.lit(frame))
        if frame < 0
        else F.col("ML_energy")[frame]
    )
    df = validation.filter(F.col("good_trajectory")).withColumn("ml", ml)
    return df.groupBy("distribution").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.abs(F.col("ml") - F.col("DFT_energy"))), 4).alias("mae"),
        F.round(F.regr_slope(F.col("ml"), F.col("DFT_energy")), 4).alias("slope"),
        F.round(F.regr_intercept(F.col("ml"), F.col("DFT_energy")), 4).alias("intercept"),
        F.round(F.corr(F.col("ml"), F.col("DFT_energy")), 4).alias("r"),
    )


def frame_error_curve(validation: DataFrame) -> DataFrame:
    """Per (adsorbate, frame): mean absolute error and mean signed error
    (`bin/optimize_frame.py:84-86` column-wise means, via posexplode)."""
    exploded = validation.filter(F.col("good_trajectory")).select(
        "adsorbate",
        "DFT_energy",
        F.posexplode("ML_energy").alias("frame", "ml"),
    )
    return exploded.groupBy("adsorbate", "frame").agg(
        F.round(F.avg(F.abs(F.col("ml") - F.col("DFT_energy"))), 4).alias("mae"),
        F.round(F.avg(F.col("ml") - F.col("DFT_energy")), 4).alias("me"),
    )


def best_frame(validation: DataFrame) -> DataFrame:
    """Per adsorbate: the frame index minimizing MAE
    (`bin/optimize_frame.py:89-95` argmin) — min_by over the curve."""
    # struct ordering is NULLS FIRST: a frame whose MAE aggregated to
    # NULL (no valid ml values at that position) would win the argmin —
    # exclude it; the best frame is the minimum over MEASURED frames
    curve = frame_error_curve(validation).filter(F.col("mae").isNotNull())
    return curve.groupBy("adsorbate").agg(
        F.min_by(F.struct("frame", "mae"), F.struct("mae", "frame")).alias("best")
    ).select(
        "adsorbate",
        F.col("best.frame").alias("best_frame"),
        F.col("best.mae").alias("best_mae"),
    )
