"""Data-quality profiling: per-column null counts, exact distinct
counts, and min/max — the QA summary a training-data pipeline
materializes next to every corpus snapshot.

Scale shape: TWO aggregations over the table, each a single job with
every statistic combinable map-side:

- pass 1: row count, per-column null counts, exact distinct counts
  (Spark's expand rewrite), and numeric min/max. All buffer types are
  mutable primitives, so the expanded multi-distinct aggregation stays
  in **HashAggregate**.
- pass 2: string min/max only. A string aggregation buffer is immutable
  (UTF8String), which forces SortAggregate — keeping it in pass 1 would
  drag the expand-multiplied rows (n_rows x (n_distinct_cols + 1))
  through a sort: measured 31 s vs 6 s total at a 6M-row lineitem.

The two single-row results are cross-joined (1 x 1 — free) and
unpivoted driver-free with ``stack`` into one row per column.

Numeric min/max are surfaced as rounded doubles and string min/max as
strings (separate typed columns, NULL where inapplicable): casting a
numeric min to a string would compare lexicographically in follow-up
queries and float-to-string formatting is not portable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all numeric/string columns).

    Returns one row per column: (column, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str).
    """
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [c for c, t in df.dtypes if t in _NUMERIC or t == "string"]

    def _is_num(c: str) -> bool:
        return dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")

    fast_aggs = [F.count(F.lit(1)).alias("__nrows")]
    str_aggs = []
    for c in columns:
        fast_aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nnull"))
        fast_aggs.append(F.count_distinct(F.col(c)).alias(f"__{c}__ndist"))
        if _is_num(c):
            fast_aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"__{c}__minn"))
            fast_aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"__{c}__maxn"))
        else:
            str_aggs.append(F.min(c).cast("string").alias(f"__{c}__mins"))
            str_aggs.append(F.max(c).cast("string").alias(f"__{c}__maxs"))
    row = df.agg(*fast_aggs)
    if str_aggs:
        row = row.crossJoin(df.agg(*str_aggs))
    null_d = "CAST(NULL AS DOUBLE)"
    null_s = "CAST(NULL AS STRING)"
    per_col = ", ".join(
        f"'{c}', __{c}__nnull, __{c}__ndist, "
        + (
            f"__{c}__minn, __{c}__maxn, {null_s}, {null_s}"
            if _is_num(c)
            else f"{null_d}, {null_d}, __{c}__mins, __{c}__maxs"
        )
        for c in columns
    )
    return row.select(
        F.expr(
            f"stack({len(columns)}, {per_col}) AS "
            "(column, n_null, n_distinct, min_num, max_num, min_str, max_str)"
        ),
        F.col("__nrows").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )
