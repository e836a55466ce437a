"""Query registry: every operator from SURVEY.md §2 as a named query over
the driver star schema, paired with a DuckDB-runnable oracle SQL string.

Each entry maps an operator (or operator cluster) of the reference to its
idiomatic Spark expression; the oracle is the ANSI-SQL ground truth the
driver runs side-by-side at sf=0.01 (CORRECTNESS gate).

Determinism rules used throughout:
- every float output is `round(x, 4)` on BOTH sides;
- every window order includes explicit tiebreak columns;
- timestamps are emitted as formatted strings (session TZ pinned UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.relational import (
    best_within_relative_threshold,
    group_exists_mark,
    grouped_min_argmin,
    grouped_topk,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events scan. The driver parquet stores ts as TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read nanos as long (session conf)
    and convert to a microsecond timestamp column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return ev


# ---------------------------------------------------------------------------
# A. Aggregation spine (reference A1/A2/A4: lineage counts, array-length sums,
#    conditional counts — catlas/prediction_steps.py:165-407)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                     AS sum_qty,
           round(sum(l_extendedprice), 4)                                AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)             AS sum_disc_price,
           round(avg(l_discount), 4)                                     AS avg_disc,
           count(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg.

    Reference analog: per-stage count/sum accounting (SURVEY §2.7 A1/A2).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B. Filters (reference F1-F12 — catlas/filters.py:15-179)
# ---------------------------------------------------------------------------


@register(
    "filter_in_ids",
    """
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 `filter_by_bulk_ids` (`catlas/filters.py:42-43`): IN-list predicate."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


@register(
    "filter_not_in_ids",
    """
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus NOT IN ('F')
    """,
)
def q_filter_not_in_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 `filter_ignore_bulk_ids` (`catlas/filters.py:44-45`): NOT IN."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(~F.col("o_orderstatus").isin("F"))
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "filter_range",
    """
    SELECT p_partkey, p_name, round(p_retailprice, 4) AS retail
    FROM part
    WHERE p_retailprice BETWEEN 500 AND 1500 AND p_size <= 30
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F10/F11 bounded-range predicates (`catlas/filters.py:71-129`)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").between(500, 1500) & (F.col("p_size") <= 30))
        .select("p_partkey", "p_name", F.round("p_retailprice", 4).alias("retail"))
    )


@register(
    "filter_sample_deterministic",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_orderkey % 10 = 3
    """,
)
def q_filter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 `filter_fraction` (`catlas/filters.py:131-132`) — seeded Bernoulli
    sampling. Engine API uses df.sample(fraction, seed); for the cross-engine
    oracle we use the deterministic modulo variant (same sampling semantics,
    reproducible across engines)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# C. Grouped/window filters (reference F16-F19 — the engine's signature ops)
# ---------------------------------------------------------------------------


@register(
    "grouped_topk",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 2
    """,
)
def q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 grouped top-k by score (`catlas/filter_utils.py:568-620`):
    keep the 2 best lineitems per order by price."""
    li = _t(spark, sf_dir, "lineitem")
    out = grouped_topk(
        li,
        ["l_orderkey"],
        [F.col("l_extendedprice").desc(), F.col("l_linenumber")],
        k=2,
    )
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price")
    )


@register(
    "best_within_threshold",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY l_orderkey) AS min_p
      FROM lineitem
    ) WHERE (l_extendedprice - min_p) <= abs(min_p) * 0.1
    """,
)
def q_best_within_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 best-shift retention (`catlas/filter_utils.py:623-679`): keep rows
    within 10% (relative) of the group minimum."""
    li = _t(spark, sf_dir, "lineitem")
    out = best_within_relative_threshold(li, ["l_orderkey"], F.col("l_extendedprice"), 0.1)
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price")
    )


@register(
    "group_exists_soft_delete",
    """
    SELECT o_custkey, o_orderkey,
           CASE WHEN max(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY o_custkey) = 0
                THEN 'no order above target' END AS filter_reason
    FROM orders
    """,
)
def q_group_exists_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18/F19 group-EXISTS soft delete (`catlas/filters.py:266-348`): if no
    order of a customer exceeds the target, mark ALL that customer's rows."""
    orders = _t(spark, sf_dir, "orders")
    out = group_exists_mark(
        orders,
        ["o_custkey"],
        F.col("o_totalprice") > 200000,
        "no order above target",
    )
    return out.select("o_custkey", "o_orderkey", "filter_reason")


@register(
    "grouped_min_argmin",
    """
    SELECT l_orderkey, l_linenumber AS argmin_line, round(l_extendedprice, 4) AS min_price
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_grouped_min_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 grouped min + argmin (`catlas/adslab_predictions.py:324-337`)."""
    li = _t(spark, sf_dir, "lineitem")
    out = grouped_min_argmin(
        li, ["l_orderkey"], F.col("l_extendedprice"), [F.col("l_linenumber")]
    )
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").alias("argmin_line"),
        F.round("l_extendedprice", 4).alias("min_price"),
    )


# ---------------------------------------------------------------------------
# D. Joins (reference J1-J5 — catlas/prediction_steps.py:271 etc.)
# ---------------------------------------------------------------------------


@register(
    "join_revenue_per_nation",
    """
    SELECT n.n_name AS nation, round(sum(o.o_totalprice), 4) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 equi-join chain + agg; dims broadcast (customer/nation are small —
    analog of the tiny adsorbates dimension, SURVEY §2.5)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "cross_join_small",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 cross join with broadcast small side (`catlas/prediction_steps.py:271`
    surfaces × adsorbates)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@register(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (group-EXISTS in join form, SURVEY §2.5 note)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "lookup_join_supplier_nation",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, r.r_name AS region
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 KV point-lookup join (`catlas/filter_utils.py:226-247`) as a
    broadcast-hash join against the side table."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


# ---------------------------------------------------------------------------
# E. FlatMap / explode (reference T1/T2 enumeration TVFs)
# ---------------------------------------------------------------------------


@register(
    "explode_word_counts",
    """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def q_explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 flatMap/explode shape (`catlas/enumerate_slabs_adslabs.py:31-78`):
    one input row → N output rows, parent columns carried along (J5)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_type"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "union_distinct_keys",
    """
    SELECT DISTINCT k FROM (
      SELECT o_custkey AS k FROM orders
      UNION ALL
      SELECT c_custkey AS k FROM customer
    )
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union + A8 distinct (`catlas/enumeration_utils.py:59-67`)."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.unionByName(c).distinct()


# ---------------------------------------------------------------------------
# F. Scalar functions (reference §2.11: string/regex/hash)
# ---------------------------------------------------------------------------


@register(
    "regex_extract_ids",
    """
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS id_digits,
           upper(c_mktsegment) AS segment
    FROM customer
    """,
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex id extraction (`catlas/parity/data_processing_utils.py:28`)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("id_digits"),
        F.upper("c_mktsegment").alias("segment"),
    )


# ---------------------------------------------------------------------------
# G. Window analytics (running aggregates, sessionization)
# ---------------------------------------------------------------------------


@register(
    "running_sum_per_supplier",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
    FROM lineitem
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame aggregate (beyond-reference capability; SURVEY §2.8
    notes the reference has no general window operator)."""
    li = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 4).alias("running_qty"),
    )


@register(
    "sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap cumsum (common OLAP pattern; new
    capability over the reference)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_session = F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# H. Parity analytics (reference A5/A6 — catlas/parity/parity_utils.py:206-243)
# ---------------------------------------------------------------------------


@register(
    "parity_regression",
    """
    SELECT l_returnflag AS split,
           count(*) AS n,
           round(avg(abs(l_extendedprice - l_quantity * 1000)), 4) AS mae,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(corr(l_extendedprice, l_quantity), 4) AS r
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_parity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 MAE + A6 linear-regression aggregates per split
    (`catlas/parity/parity_utils.py:212-213`)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("split")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000)), 4).alias(
            "mae"
        ),
        F.round(F.regr_slope(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias("slope"),
        F.round(
            F.regr_intercept(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("intercept"),
        F.round(F.corr(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias("r"),
    )


@register(
    "frame_mean_error",
    """
    SELECT label, i - 1 AS pos, round(avg(embedding[i]), 4) AS mean_val
    FROM embeddings, range(1, 9) t(i)
    GROUP BY label, i
    """,
)
def q_frame_mean_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 per-frame column-wise mean over an array column
    (`bin/optimize_frame.py:73-96`): posexplode → groupBy(pos) → avg.
    Uses the first 8 embedding positions as the 'frames'."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 8)).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 4).alias("mean_val"))
    )


# ---------------------------------------------------------------------------
# I. Events / time-series (tumbling window batch analog of the streaming path)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_hour",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the events table (batch form of the
    Structured Streaming path in catlas_spark.streaming)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
