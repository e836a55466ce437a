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


def kmeans_lloyd(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Distributed Lloyd k-means as pure DataFrame ops — the TRAINING
    step of an IVF index (`ann_ivf` uses fixed centroids; this learns
    them). No MLlib, no UDFs: assignment is a broadcast cross join with
    a codegen'd fold, the centroid update is posexplode + groupBy(pos)
    — both linear in corpus size per iteration, so the same plan runs
    at 100 TB (k centroids always broadcast; corpus never collected).

    Cross-engine determinism (the oracle replays the SAME iterations in
    DuckDB): init = the k smallest ids' vectors; distances are LEFT
    FOLDS over the array in order (bit-identical in double on both
    engines); each distance and each centroid mean is snapped to a 1e-4
    grid (floor(x*1e4+0.5)) so the only unordered reduction (the mean)
    cannot leak ulp noise into the next iteration's argmin; argmin
    tie-breaks on centroid id.

    Returns per-cluster: (cluster_id, n_members, inertia) after the
    final assignment.
    """
    vecs = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    centroids = vecs.filter(F.col("vid") < k).select(
        F.col("vid").cast("int").alias("cid"), F.col("v").alias("c")
    )

    def d2_col():
        diff2 = F.zip_with("v", "c", lambda x, y: (x - y) * (x - y))
        fold = F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)
        return F.floor(fold * 10000 + F.lit(0.5)) / 10000

    assigned = None
    for _ in range(iters):
        w = Window.partitionBy("vid").orderBy("d2", "cid")
        assigned = (
            vecs.crossJoin(F.broadcast(centroids))
            .withColumn("d2", d2_col())
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("vid", "v", "cid", "d2")
        )
        centroids = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg((F.floor(F.avg("x") * 10000 + F.lit(0.5)) / 10000).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
        )

    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("d2"), 2).alias("inertia"),
        )
    )
