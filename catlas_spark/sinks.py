"""Sinks (SURVEY.md §2.2): partitioned parquet results, config snapshot,
console preview — with the reference's binary-payload projection drop.

The reference drops opaque-object columns at the sink by runtime type
scanning (P1, `catlas/filter_utils.py:349-391`); with explicit schemas
the same projection is a static ``drop`` of BinaryType columns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def binary_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)]


def write_results(
    df: DataFrame,
    out_dir: str,
    partition_by: list[str] | None = None,
    drop_binary: bool = True,
    mode: str = "overwrite",
) -> None:
    """K1/K2 analog: partitioned parquet sink; opaque payloads dropped
    (static-schema version of the reference's runtime type scan)."""
    out = df.drop(*binary_columns(df)) if drop_binary else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(out_dir, "results"))


def snapshot_config(config: dict, out_dir: str) -> None:
    """K3: dump the query config next to the outputs."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "run_config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)


def console_preview(df: DataFrame, columns: list[str], n: int = 20) -> None:
    """K7: verbose console sink (catlas/prediction_steps.py:423-435)."""
    df.select(*columns).show(n, truncate=False)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files (floor ``min_files``).

    The 100 TB operational problem this solves: a streaming sink or a
    many-task write leaves thousands of KB-sized files per partition;
    every later scan then pays one task + one open per file and the
    NameNode/listing layer pays the metadata. Compaction is a pure
    rewrite — read, coalesce to the target count, write to a temp dir,
    atomically swap — so downstream plans see the same rows in fat,
    row-group-aligned files. coalesce() (not repartition) keeps it
    shuffle-free: each output task concatenates input splits.

    Returns the number of files written. Content equality and file
    count are asserted in tests/test_screen_pipeline.py.

    Flat directories only: a hive-partitioned layout (path/k=v/...)
    must be compacted per leaf directory, or the rewrite would both
    flatten the partition structure and funnel the whole dataset
    through ceil(total/target) tasks — the function refuses rather
    than guessing. The swap is rename-aside (old → __old, new → path,
    delete __old): a crash leaves either the original or the compacted
    directory at a recoverable name, never a window with no data under
    ``path`` — and a rerun SELF-RECOVERS: leftover ``__old`` with no
    ``path`` (crash between the two renames) is renamed back before
    compacting; stale ``__old``/``__compacting`` alongside an intact
    ``path`` are removed (they are, respectively, an already-swapped
    original and a partial rewrite).
    """
    import glob as _glob
    import math
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    # crash recovery from a prior interrupted run (see docstring)
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)

    files = _glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        sub = [d for d in _glob.glob(os.path.join(path, "*")) if os.path.isdir(d)]
        raise ValueError(
            f"compact_parquet: no top-level parquet files in {path}"
            + (
                f"; found partition dirs {sub[:3]} — compact each leaf directory"
                if sub
                else ""
            )
        )
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(min_files, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(_glob.glob(os.path.join(path, "*.parquet")))
