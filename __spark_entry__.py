"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``catlas_spark.queries`` (one entry per
operator of SURVEY.md §2 + the LLM-data-pipeline extensions); this module
is a thin shim over that registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from catlas_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the catlas 'screen' spine —
    scan → filter → grouped top-k (F16) → broadcast joins → group-EXISTS
    soft delete (F18) → grouped aggregation with live/dead accounting.
    """
    from pyspark.sql import functions as F

    from catlas_spark.operators.relational import group_exists_mark, grouped_topk

    sf_dir = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    top2 = grouped_topk(
        li.filter(F.col("l_quantity") > 5),
        ["l_orderkey"],
        [F.col("l_extendedprice").desc(), F.col("l_linenumber")],
        k=2,
    )
    joined = (
        top2.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    marked = group_exists_mark(
        joined, ["o_custkey"], F.col("o_totalprice") > 400000, "no order above target"
    )
    return (
        marked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("filter_reason").isNull(), 1).otherwise(0)).alias("n_live"),
            F.round(
                F.sum(
                    F.when(
                        F.col("filter_reason").isNull(),
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    ).otherwise(F.lit(0.0))
                ),
                4,
            ).alias("live_revenue"),
        )
        .orderBy("n_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (same column aliases)."""
    return _q.oracle_sql()
