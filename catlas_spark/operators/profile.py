"""Data-quality profiling: per-column null counts, exact distinct
counts, and min/max — the QA summary a training-data pipeline
materializes next to every corpus snapshot.

Scale shape — one per-column GROUP-AGGREGATE branch, unioned:

    scan(col) → groupBy(value) count → agg over the value groups

Per column, distinct counting becomes group counting (two-phase
HashAggregate with map-side partials — the shuffle carries DISTINCT
VALUES only, never raw rows) and min/max/null stats fold over the group
keys, so a string min/max sorts at most |distinct values| narrow rows.
The branches are independent single-column scans (columnar pruning: the
same total bytes as one wide scan) and run concurrently within the one
job. This is the same physical plan a columnar engine picks for
multi-column profiling.

Measured at sf0.1 lineitem (600k rows, 6 columns): 1.2-1.5 s fresh vs
2.6-3.0 s for the previous two-pass design and 9-14 s for a single
all-in-one aggregation. The graveyard, kept for the record:

- multi-column ``count_distinct`` in one aggregation plans an Expand
  (one branch per distinct column): rows x (n_cols + 1) through the
  aggregation — the dominant cost of the old fast pass.
- string min/max in the SAME pass as the expand forces the whole
  aggregation into **SortAggregate** (immutable UTF8String buffers):
  measured 9-14 s here and 31 s vs 6 s on a 6M-row lineitem. Keeping
  string aggregates away from raw-row aggregations is still the rule —
  here they only ever see group keys.
- exploding to (col, value) pairs and two-level-grouping the union of
  all columns pays 3.6M double→string casts + a 1.2M-group shuffle:
  2.7-3 s, worse than per-column branches.

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

    def _is_num(c: str) -> bool:
        return dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")

    if columns is None:
        # _is_num, not the _NUMERIC string set (r8 review): decimal
        # dtypes render as 'decimal(p,s)' and were silently omitted
        # from the default profile despite being supported
        columns = [c for c, t in df.dtypes if _is_num(c) or t == "string"]
    if not columns:
        raise ValueError(
            "profile_table: no profileable columns (numeric/decimal/"
            f"string) among {list(dtypes)}; pass columns= explicitly"
        )

    branches = []
    for c in columns:
        num = _is_num(c)
        groups = df.select(F.col(c).alias("__v")).groupBy("__v").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        branches.append(
            groups.agg(
                F.lit(c).alias("column"),
                F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__v").isNull(), F.col("__cnt"))), F.lit(0)
                ).alias("n_null"),
                F.count(F.when(F.col("__v").isNotNull(), 1)).alias("n_distinct"),
                (
                    F.round(F.min(F.col("__v").cast("double")), 4)
                    if num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.round(F.max(F.col("__v").cast("double")), 4)
                    if num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.min(F.col("__v").cast("string"))
                    if not num
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.max(F.col("__v").cast("string"))
                    if not num
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
