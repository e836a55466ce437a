"""Iterative graph algorithms as DataFrame loops.

Complements the connected-components operator in
:mod:`catlas_spark.operators.dedup` (used for duplicate clustering) with
PageRank-style fixed-iteration message passing. The reference's analysis
notebooks rank entities by aggregate co-occurrence; expressed Spark-first
this is a driver loop of joins + one aggregation shuffle per iteration
(cf. `/root/reference/catlas/filters.py:266` for the
aggregate-over-related-rows precedent).

Scale notes (100 TB): the edge list shuffles once per iteration on
``dst``; ``deg`` is node-sized and broadcast; ranks are node-sized. For
many iterations, persist ranks each round and localCheckpoint every ~5
to cut lineage — with a fixed small iteration count (the common
"2-3 sweeps" ranking pass) plain lazy chaining is fine and keeps the
whole plan visible to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank.

    ``nodes``: one column ``v``. ``edges``: columns ``src``, ``dst``
    (directed, pre-deduplicated). Returns ``(v, pr)`` after
    ``iterations`` sweeps of ``pr(v) = (1-d)/N + d * sum_in
    pr(u)/outdeg(u)``; dangling-node mass is NOT redistributed (the
    formula a SQL oracle can replay exactly — document the choice at
    call sites).
    """
    n = nodes.count()  # node count is a scalar; one tiny job
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))  # empty graph, empty ranks
    # the edge list is read by the degree count plus every iteration's
    # join; it is deliberately NOT persisted or checkpointed — AQE's
    # runtime stage cache reuses identical shuffle stages within the
    # caller's single action, so the edge subtree pays roughly once
    # (measured at sf0.1, 907k edges: full lazy noop-write 3.7 s vs
    # 2.2 s edges + 2.2 s iterations when staged separately; an explicit
    # MEMORY_ONLY edge cache was no faster end-to-end and leaves session
    # residue). CAUTION when re-measuring: time with a noop WRITE, not
    # count() — Catalyst eliminates the outer joins under count-only
    # column pruning and "measures" an empty plan.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks.withColumnRenamed("v", "src"), "src")
            .join(F.broadcast(deg), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("d")).alias("m"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "v"), "v", "left")
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks


def pagerank_adjacency(
    nodes: DataFrame,
    adj: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an adjacency-ARRAY table — the bounded-degree regime.

    ``adj``: columns ``src``, ``nbrs`` (array of distinct out-neighbors,
    self excluded). Identical semantics to :func:`pagerank` (same
    formula, dangling mass not redistributed), but each iteration
    explodes contributions from the node-sized adjacency table instead
    of scanning an edge-pair table — measured ~30% faster on the
    supplier co-occurrence graph at sf0.1 (1.6-2.0 s vs 2.2-2.7 s,
    identical output). REGIME CHOICE: adjacency rows carry max-degree
    arrays, so this form requires bounded degree (a celebrity node with
    10M followers is a 10M-element row — skew + row-size hazard); the
    edge-table :func:`pagerank` is the general/high-degree path.
    """
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    adj = adj.select(
        "src", "nbrs", F.size("nbrs").cast("double").alias("d")
    ).filter(F.col("d") > 0)
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            adj.join(ranks.withColumnRenamed("v", "src"), "src")
            .select(
                F.explode("nbrs").alias("dst"),
                (F.col("pr") / F.col("d")).alias("m"),
            )
            .groupBy("dst")
            .agg(F.sum("m").alias("m"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "v"), "v", "left")
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks


def triangle_participation(edges: DataFrame, src: str = "x", dst: str = "y") -> DataFrame:
    """Per-node triangle counts over an undirected edge list (one row
    per edge, any consistent endpoint order), by degree-ordered edge
    orientation (the compact-forward algorithm): every edge is oriented
    from its lower-(degree, id) endpoint to the higher one, wedges are
    built by joining oriented edges on their source, and a wedge closes
    iff its outer pair is itself an oriented edge — so each triangle is
    found exactly once, and the wedge count is bounded by the sum of
    SQUARED ORIENTED out-degrees, which degree-ordering keeps near the
    graph's arboricity bound instead of blowing up on hubs (a
    celebrity node of degree 1M yields ~0 wedges as a source because
    almost all its edges orient INTO it). Everything is hash joins and
    aggregations on edge keys; no global sort, no relabeling pass.

    Returns (node, n_triangles) for nodes in at least one triangle.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # orient u -> v iff (deg(u), u) < (deg(v), v): a total order, so
    # each undirected edge appears exactly once in `o`. Referenced three
    # times below (both wedge sides + the closing probe) and left LAZY
    # on purpose: AQE's runtime stage cache dedups the repeated shuffle
    # subtrees within the single action, while persist(MEMORY_ONLY) +
    # materialize was measured 2-5x SLOWER here (13.5/4.8/16.7 s vs
    # 3.4/2.1/3.4 s back-to-back at sf0.1) — the build+count actions
    # cost more than the plan-tree repetition ever does
    o = (
        und.join(deg, "u")
        .withColumnRenamed("d", "du")
        .join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v", "dv")
    )
    wedges = (
        o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
        .join(o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2")), "u")
        .filter(
            (F.col("d1") < F.col("d2"))
            | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
        )
    )
    tri = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")), ["v1", "v2"]
    ).select("u", "v1", "v2")
    return (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
