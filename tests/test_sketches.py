"""Misra-Gries mergeable summary: bound checks on a skewed corpus, and
proof that the prune path actually engages (a uniform key never trips
it, which is why the registry query uses a Zipf-like derived key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from catlas_spark.operators.sketches import misra_gries


def _zipf_df(spark, n=50_000, n_part=8):
    # deterministic Zipf-ish: reciprocal bucket of a hashed uniform key
    return (
        spark.range(n, numPartitions=n_part)
        .select(F.expr("4096 div ((id * 2654435761) % 4096 + 1)").alias("k"))
    )


def test_misra_gries_bounds_and_no_false_negatives(spark):
    df = _zipf_df(spark)
    n = df.count()
    k = 15
    est = {r.k: r.est for r in misra_gries(df, "k", k=k).collect()}
    true = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}

    bound = n / (k + 1)
    for item, e in est.items():
        assert e <= true[item], "MG must never overcount"
        assert e >= true[item] - bound, "undercount exceeded N/(k+1)"
    # every item above the guarantee threshold must be present
    for item, t in true.items():
        if t > bound:
            assert item in est, f"heavy item {item} missing from summary"
    # the prune path did real work on this corpus: estimates are not exact
    assert any(e < true[i] for i, e in est.items())
    # and the summary stayed summary-sized (<= k per input partition)
    assert len(est) <= k * df.rdd.getNumPartitions()


def test_misra_gries_uniform_key_is_exact_when_under_capacity(spark):
    df = spark.range(10_000, numPartitions=4).select((F.col("id") % 50).alias("k"))
    est = {r.k: r.est for r in misra_gries(df, "k", k=64).collect()}
    assert est == {i: 200 for i in range(50)}  # never pruned -> exact


def test_jl_projection_preserves_distances_statistically(spark, sf_dir):
    """JL contract: pairwise squared distances in the projected space
    concentrate around the original ones (Achlioptas +-1 matrix). With
    out_dim=16 the distortion is loose, so assert the MEDIAN ratio over
    many pairs is near 1 and no systematic collapse/blow-up."""
    import numpy as np

    from pyspark.sql import functions as F

    from catlas_spark.functions.vector import jl_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    dims = jl_project(F.col("embedding"), out_dim=16)
    rows = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"),
        F.array(*dims).alias("p"),
    ).collect()
    V = np.array([r.v for r in rows])
    P = np.array([r.p for r in rows])
    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(rows), size=(500, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_orig = ((V[idx[:, 0]] - V[idx[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((P[idx[:, 0]] - P[idx[:, 1]]) ** 2).sum(axis=1)
    ratio = d_proj / d_orig
    assert 0.8 < float(np.median(ratio)) < 1.25
    assert float(np.mean((ratio > 0.2) & (ratio < 5.0))) > 0.95


def test_misra_gries_bounds_hold_on_random_streams(spark):
    """Property check: for arbitrary skew shapes and capacities the MG
    contract (never overcount, undercount <= N/(k+1), no false negative
    above the bound) must hold. Deterministic seeds, a handful of shapes
    — each case is a full Spark job, so the sweep stays small."""
    import random

    from pyspark.sql import functions as F

    for seed, k, n_part in [(1, 5, 3), (2, 12, 8), (3, 40, 2), (4, 7, 16)]:
        rng = random.Random(seed)
        # mixture of a few hot keys and a uniform tail
        vals = [rng.choice([0, 1, 2]) if rng.random() < 0.5 else rng.randrange(500)
                for _ in range(4000)]
        df = spark.createDataFrame([(v,) for v in vals], "k long").repartition(n_part)
        est = {r.k: r.est for r in misra_gries(df, "k", k=k).collect()}
        true = {}
        for v in vals:
            true[v] = true.get(v, 0) + 1
        bound = len(vals) / (k + 1)
        assert all(e <= true[i] for i, e in est.items())
        assert all(e >= true[i] - bound for i, e in est.items())
        for i, t in true.items():
            if t > bound:
                assert i in est, f"seed={seed} k={k}: heavy {i} missing"
