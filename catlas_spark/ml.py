"""MLlib pipelines: the estimator/transformer face of the engine.

The north star names "MLlib pipeline + Dask-style distributed ops" as
the approach; this module provides the MLlib formulations of the
operators the rest of the engine implements as native expressions, so
users can choose either face:

- text featurization: Tokenizer → NGram → HashingTF (a fitted Pipeline,
  the MLlib analog of `functions/text.py`)
- MinHashLSH `approxSimilarityJoin` near-dup detection (analog of
  `operators/dedup.minhash_lsh_pairs`)
- BucketedRandomProjectionLSH ANN over embeddings (analog of
  `operators/similarity.bucketed_ann`)
- LinearRegression parity model (the trained form of the closed-form
  regr_slope/regr_intercept aggregates in `parity.py`)

These are NOT oracle-checkable (MLlib hash seeds are engine-internal),
so correctness is established relative to the engine's own exact
operators in tests: LSH candidates are validated against exact Jaccard
/ cosine ground truth.

Reference parity: the ML-inference integration of SURVEY §2.12 (batched
model UDFs) lives in pipeline.energy_prediction; this module covers the
"train/fit on the cluster" surface the reference delegates to offline
OCP models.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_featurizer(
    input_col: str = "text",
    num_features: int = 1 << 18,
    shingle_n: int = 2,
) -> Pipeline:
    """Tokenizer → token n-grams → sparse binary shingle vectors."""
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=input_col, outputCol="__tokens", pattern=r"\s+", toLowercase=True
            ),
            NGram(n=shingle_n, inputCol="__tokens", outputCol="__shingles"),
            HashingTF(
                inputCol="__shingles",
                outputCol="features",
                numFeatures=num_features,
                binary=True,
            ),
        ]
    )


def fit_minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    num_hash_tables: int = 12,
    seed_features: int = 1 << 18,
) -> tuple[PipelineModel, DataFrame]:
    """Fit the featurizer + MinHashLSH model; returns (model, featurized).

    Rows whose shingle vector is empty (single-token docs) are dropped —
    MinHashLSH requires ≥1 non-zero entry (same ≥2-token precondition as
    the native operator).
    """
    feat_model = text_featurizer(text_col, seed_features).fit(df)
    featurized = feat_model.transform(df)
    # emptiness is decided on the pre-HashingTF shingle ARRAY — a native
    # size() predicate in codegen, not a Python UDF over the vector
    # (binary HashingTF yields a non-empty vector iff shingles exist)
    featurized = featurized.filter(F.size(F.col("__shingles")) > 0)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    lsh_model = lsh.fit(featurized)
    return lsh_model, featurized


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_jaccard_distance: float = 0.5,
    num_hash_tables: int = 12,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH approxSimilarityJoin:
    (id_a, id_b, jaccard_distance) with id_a < id_b."""
    lsh_model, featurized = fit_minhash_dedup(df, text_col, num_hash_tables)
    joined = lsh_model.approxSimilarityJoin(
        featurized, featurized, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
    )


def brp_ann(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    max_driver_queries: int = 32,
    bulk_radius: float = 10.0,
) -> DataFrame:
    """ANN via BucketedRandomProjectionLSH over dense vectors (Euclidean
    buckets — the MLlib scale path; cosine variants normalize first).

    Two physical strategies by query cardinality:

    - ≤ ``max_driver_queries`` rows: per-query ``approxNearestNeighbors``
      (one driver-side job per query — exact-k within the hash candidate
      set; right for a handful of interactive probes).
    - larger query TABLES: one distributed ``approxSimilarityJoin``
      within ``bulk_radius`` + a per-query top-k window. No collect, no
      per-row driver loop — the 100 TB path. The radius bounds candidate
      volume (the LSH contract); queries whose k-th neighbor lies beyond
      it would return fewer than k rows, so RADIUS-STARVED queries are
      detected (per-query result count < k) and retried through the same
      distributed join with a 4x-wider radius; queries still starved
      after the retries fall back to per-query
      ``approxNearestNeighbors`` when few enough for the driver loop
      (else they contribute best-effort <k rows). The output contract —
      k rows per query when k neighbors exist — no longer changes
      discontinuously at the ``max_driver_queries`` threshold.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col).alias("nid"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("vec"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(base)

    def _per_query(q_pairs) -> DataFrame:
        """Driver-loop path: one approxNearestNeighbors job per (id, Vector)."""
        out_rows = []
        for qid, qv in q_pairs:
            nn = model.approxNearestNeighbors(
                base.filter(F.col("nid") != qid), qv, k, distCol="dist"
            )
            out_rows.append(
                nn.select(
                    F.lit(qid).alias("q_id"), F.col("nid").alias("n_id"), F.col("dist")
                )
            )
        result = out_rows[0]
        for r in out_rows[1:]:
            result = result.unionByName(r)
        return result

    q_small = queries.select(id_col, vec_col).limit(max_driver_queries + 1).collect()
    if not q_small:
        # empty query set: an upstream filter matching nothing must yield
        # an empty result, not an IndexError in the driver-loop union
        return queries.select(
            F.col(id_col).alias("q_id"),
            F.col(id_col).alias("n_id"),
            F.lit(0.0).alias("dist"),
        ).limit(0)
    if len(q_small) <= max_driver_queries:
        from pyspark.ml.linalg import Vectors

        pairs = [
            (q[id_col], Vectors.dense([float(x) for x in q[vec_col]])) for q in q_small
        ]
        return _per_query(pairs).select(
            "q_id", "n_id", F.round("dist", 4).alias("dist")
        )

    qbase = queries.select(
        F.col(id_col).alias("qid"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("vec"),
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")

    def _bulk_topk(pending_q: DataFrame, radius: float) -> DataFrame:
        joined = model.approxSimilarityJoin(pending_q, base, radius, distCol="dist")
        flat = joined.select(
            F.col("datasetA.qid").alias("q_id"),
            F.col("datasetB.nid").alias("n_id"),
            F.col("dist"),
        ).filter(F.col("q_id") != F.col("n_id"))
        return flat.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)

    max_radius_retries = 2
    pending, radius = qbase, bulk_radius
    chunks: list[DataFrame] = []
    from .caching import pin

    for _ in range(max_radius_retries + 1):
        # pin each round's LSH join result (k x |pending| rows, bounded):
        # unpinned, the approxSimilarityJoin re-executes inside the sat
        # probe, the chunk semi-join, every later round's pending
        # anti-join lineage, AND the final consumption — O(rounds^2)
        # executions of the most expensive join instead of one per round
        got = pin(_bulk_topk(pending, radius))
        # a query is satisfied iff its k-th candidate fell inside the radius
        sat = (
            got.groupBy("q_id")
            .agg(F.max("__rk").alias("__n"))
            .filter(F.col("__n") >= k)
            .select("q_id")
        )
        chunks.append(got.join(sat, "q_id", "semi").select("q_id", "n_id", "dist"))
        pending = pending.join(sat, pending["qid"] == sat["q_id"], "anti")
        if pending.isEmpty():
            pending = None
            break
        radius *= 4.0
    if pending is not None:
        # retries exhausted: per-query fallback for a driver-loop-sized
        # remainder (cap independent of max_driver_queries, which may be
        # tuned low to steer the MAIN path), best-effort (<k) beyond that
        fallback_cap = max(max_driver_queries, 32)
        leftover = pending.limit(fallback_cap + 1).collect()
        if 0 < len(leftover) <= fallback_cap:
            chunks.append(_per_query([(r["qid"], r["vec"]) for r in leftover]))
        elif len(leftover) > fallback_cap:
            chunks.append(_bulk_topk(pending, radius).select("q_id", "n_id", "dist"))
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out.select("q_id", "n_id", F.round("dist", 4).alias("dist"))


def fit_parity_model(validation: DataFrame, frame: int = -1):
    """LinearRegression DFT→ML parity model: the trained counterpart of
    parity.parity_summary's closed-form regr_slope/intercept."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    # frame convention must MATCH parity_summary's (r8 review): negative
    # frames via 1-based element_at (-1 = final), non-negative via
    # 0-based indexing — the unconditional element_at trained on
    # ML_energy[frame-1] for positive frames (off by one vs the
    # closed-form slope it claims to mirror) and crashed on frame=0
    ml = (
        F.element_at(F.col("ML_energy"), F.lit(frame))
        if frame < 0
        else F.col("ML_energy")[frame]
    )
    data = (
        validation.filter(F.col("good_trajectory"))
        .select(F.col("DFT_energy").alias("x"), ml.alias("y"))
    )
    assembled = VectorAssembler(inputCols=["x"], outputCol="features").transform(data)
    lr = LinearRegression(featuresCol="features", labelCol="y")
    return lr.fit(assembled)
