"""Approximate-nearest-neighbor search over embedding columns.

Two tiers:
- brute-force cosine top-k: exact baseline. The query side is small and
  broadcast, so the plan is a broadcast-nested-loop over the corpus —
  embarrassingly parallel, no shuffle of the big side; top-k via window
  on the rounded similarity (deterministic ties).
- sign-bucket LSH: coarse random-hyperplane buckets; candidates only
  within the query's bucket, cutting the scanned fraction ~2^bits.

At 100 TB the brute-force path is the per-query-batch scan (still the
right baseline for recall checks); the bucketed path is the scale path.
MLlib's BucketedRandomProjectionLSH offers the same shape; this
implementation keeps everything in native expressions so the oracle can
verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, sign_bucket


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast). Ranking uses the
    similarity rounded to 4 decimals with the neighbor id as tiebreak so
    results are engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def bucketed_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_bits: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's sign bucket."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )
