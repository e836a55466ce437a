"""One-pass data-quality profiling: per-column null counts, exact
distinct counts, and min/max — the QA summary a training-data pipeline
materializes next to every corpus snapshot.

Scale shape: ONE aggregation over the table computes every statistic
(count_distinct compiles to Spark's expand + single shuffle; all other
aggregates are map-side combinable), then the single result row is
unpivoted driver-free with ``stack`` into one row per column. No
per-column scans — at 100 TB the table is read once.

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
    """Profile ``columns`` (default: all non-binary/non-array columns).

    Returns one row per column: (column, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str).
    """
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [
            c for c, t in df.dtypes
            if t in _NUMERIC or t == "string"
        ]
    aggs = [F.count(F.lit(1)).alias("__nrows")]
    for c in columns:
        t = dtypes[c]
        is_num = t in _NUMERIC or t.startswith("decimal")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nnull"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__{c}__ndist"))
        if is_num:
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"__{c}__minn"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"__{c}__maxn"))
            aggs.append(F.lit(None).cast("string").alias(f"__{c}__mins"))
            aggs.append(F.lit(None).cast("string").alias(f"__{c}__maxs"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__{c}__minn"))
            aggs.append(F.lit(None).cast("double").alias(f"__{c}__maxn"))
            aggs.append(F.min(c).cast("string").alias(f"__{c}__mins"))
            aggs.append(F.max(c).cast("string").alias(f"__{c}__maxs"))
    row = df.agg(*aggs)
    per_col = ", ".join(
        f"'{c}', __{c}__nnull, __{c}__ndist, __{c}__minn, __{c}__maxn, "
        f"__{c}__mins, __{c}__maxs"
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
