"""MLlib-surface tests: LSH results validated against the engine's exact
operators (ground truth), parity model vs closed-form aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catlas_spark.ml import brp_ann, fit_parity_model, minhash_dedup_pairs
from catlas_spark.operators.similarity import cosine_topk
from catlas_spark.parity import parity_summary
from catlas_spark.sources import fixtures


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    mutated = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" xtra")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(mutated)


def test_mllib_minhash_finds_planted_dups(spark, corpus):
    pairs = minhash_dedup_pairs(corpus, max_jaccard_distance=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every planted (i, i+100000) mutated pair within the corpus slice
    ids = {r.doc_id for r in corpus.collect()}
    planted = {(i, i + 100000) for i in ids if i + 100000 in ids}
    assert planted, "fixture must contain planted pairs"
    found = planted & got
    assert len(found) / len(planted) >= 0.9  # LSH recall on true near-dups
    # distances are true Jaccard distances: planted pairs are close
    dists = {(r.id_a, r.id_b): r.jaccard_distance for r in pairs.collect()}
    assert all(dists[p] <= 0.3 for p in found)


def test_brp_ann_overlaps_exact_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    approx = brp_ann(emb, queries, k=10)
    exact = cosine_topk(emb, queries, k=10)
    a = {(r.q_id, r.n_id) for r in approx.collect()}
    e = {(r.q_id, r.n_id) for r in exact.collect()}
    # Euclidean-LSH top-10 must overlap exact cosine top-10 (vectors are
    # roughly isotropic; require non-trivial agreement, not identity)
    assert len(a & e) >= 3


def test_brp_ann_bulk_path_matches_driver_path(spark, sf_dir):
    """Query tables above the driver-loop cap route through one
    distributed approxSimilarityJoin (no per-query collect loop); results
    must agree with the per-query path on common queries."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    # force the bulk path by setting the cap below the query count
    bulk = brp_ann(emb, queries, k=10, max_driver_queries=2, bulk_radius=50.0)
    loop = brp_ann(emb, queries, k=10, max_driver_queries=32)
    b = {(r.q_id, r.n_id) for r in bulk.collect()}
    l = {(r.q_id, r.n_id) for r in loop.collect()}
    assert {q for q, _ in b} == {q for q, _ in l}  # every query answered
    # within-radius candidates are ranked by the same metric: high overlap
    assert len(b & l) / len(l) >= 0.8


def test_parity_model_matches_closed_form(spark):
    val = fixtures.make_validation(spark, n=500)
    model = fit_parity_model(val)
    summary = parity_summary(val.withColumn("distribution", F.lit("all"))).collect()[0]
    assert abs(model.coefficients[0] - summary.slope) < 1e-2
    assert abs(model.intercept - summary.intercept) < 1e-2
