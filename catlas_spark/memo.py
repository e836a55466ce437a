"""Persistent memo-table: incremental recompute across runs.

This is the Spark-first replacement for the reference's killer feature —
sharded-sqlite operator memoization (`sqlitedict_memoize`,
`catlas/cache_utils.py:137-218`; SURVEY.md §2.13/R4). Instead of a
per-call KV store wrapped around a Python function, expensive operator
results are keyed by a deterministic hash of explicit key columns + an
operator version string, stored in a parquet memo table, and reused via
a join:

    memoize(df) = (df ⋉ memo)  ∪  compute(df ⋲ memo) appended to memo

Key design points mapped from the reference:
- C3 func-identity hashing → explicit ``version`` string per operator
  implementation (bump to invalidate).
- C4 ignore-args → the key is an explicit column list, never the payload
  (hash content-describing columns, not pickled blobs).
- R11 idempotence → appends are deduplicated on read (max one row per
  key kept), so task retries / concurrent runs cannot poison results.

At scale the memo table is just another partitioned parquet dataset: the
hit-join is a shuffle (or broadcast when small) and compaction is a
normal parquet rewrite.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KEY_COL = "__memo_key"


def memo_key(key_cols: list[str], version: str) -> F.Column:
    """Deterministic 64-bit key: xxhash64 over key columns + version."""
    return F.xxhash64(*key_cols, F.lit(version))


def _memo_files(path: str) -> list[str]:
    """Pinned snapshot of the memo table: the explicit list of part files
    currently on disk. Reading from this list (not the directory) freezes
    the scan — a later append to the same directory is invisible to any
    lazy plan built over this snapshot. This is the local-FS analog of a
    table-format snapshot id (Delta/Iceberg) on a real cluster."""
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def _read_memo(spark: SparkSession, files: list[str]) -> DataFrame | None:
    if not files:
        return None
    memo = spark.read.parquet(*files)
    # idempotent reads: keep one row per key (appends may duplicate on retry)
    w = Window.partitionBy(KEY_COL).orderBy(F.col(KEY_COL))
    return memo.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop(
        "__rn"
    )


def memoize(
    spark: SparkSession,
    df: DataFrame,
    key_cols: list[str],
    compute: Callable[[DataFrame], DataFrame],
    table_path: str,
    version: str = "v1",
) -> DataFrame:
    """Compute-once operator application.

    ``compute`` maps a keyed input DataFrame to the same rows + result
    columns. Rows whose key exists in the memo table are served from it;
    misses are computed, appended to the table, and unioned in.

    NOTE: materializes the miss partition (the append is an action) —
    this mirrors the reference, where the memo write happens inside the
    task itself (`catlas/cache_utils.py:155-166`).

    Snapshot consistency: both memo scans are pinned to explicit file
    lists. The hit/miss classification reads ONLY the part files that
    existed before the append, and the read-back of computed misses reads
    ONLY the files that exist after it. Without the pin, the lazy anti-join
    would re-list the directory at evaluation time — after the append —
    classify the just-computed misses as hits-in-memo, and return an
    inconsistent (miss-dropping) result.
    """
    keyed = df.withColumn(KEY_COL, memo_key(key_cols, version))
    files_before = _memo_files(table_path)
    memo = _read_memo(spark, files_before)

    if memo is None:
        hits = None
        misses = keyed
    else:
        hits = keyed.join(memo, KEY_COL, "inner")
        misses = keyed.join(memo.select(KEY_COL), KEY_COL, "left_anti")

    # Write-then-read-back: the append below is the ONLY execution of the
    # compute plan. Misses are then served from the freshly persisted rows,
    # so the values returned are exactly the values persisted — a
    # nondeterministic `compute` cannot write one result and return another,
    # and the expensive plan never runs a second time at consumption.
    computed = compute(misses)
    result_cols = [c for c in computed.columns if c not in keyed.columns]
    computed.select(KEY_COL, *result_cols).write.mode("append").parquet(table_path)
    memo_after = _read_memo(spark, _memo_files(table_path))
    miss_rows = misses.join(memo_after, KEY_COL, "inner")
    if hits is None:
        return miss_rows.drop(KEY_COL)
    return hits.drop(KEY_COL).unionByName(miss_rows.drop(KEY_COL))


def compact(spark: SparkSession, table_path: str) -> int:
    """Rewrite the memo table with one row per key (reclaims duplicate
    appends left by task retries / concurrent runs — the maintenance
    counterpart of the read-side dedup). Returns the compacted row count.
    """
    memo = _read_memo(spark, _memo_files(table_path))
    if memo is None:
        return 0
    tmp = table_path + ".compact"
    memo.write.mode("overwrite").parquet(tmp)
    compacted = spark.read.parquet(tmp)
    compacted.write.mode("overwrite").parquet(table_path)
    n = spark.read.parquet(table_path).count()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return n
